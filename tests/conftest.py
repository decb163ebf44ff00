"""Test configuration: force an 8-virtual-device CPU mesh before jax loads.

This is the TPU answer to "test multi-chip logic without a pod": all sharding
tests run against jax.sharding.Mesh over 8 host-platform devices
(XLA's --xla_force_host_platform_device_count).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The sandbox's sitecustomize imports jax at interpreter start and pins the
# remote-TPU ("axon") platform via env, so the env var alone is too late —
# update the live config before any backend is instantiated.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute training/characterization tests"
    )


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def stub_module(name: str, **attrs):
    """Install a fake module (and package parents) for reference imports."""
    import types

    parts = name.split(".")
    for i in range(1, len(parts) + 1):
        mod_name = ".".join(parts[:i])
        if mod_name not in sys.modules:
            mod = types.ModuleType(mod_name)
            mod.__path__ = []  # make it package-like
            sys.modules[mod_name] = mod
        if i > 1:
            setattr(sys.modules[".".join(parts[: i - 1])], parts[i - 1], sys.modules[mod_name])
    for k, v in attrs.items():
        setattr(sys.modules[name], k, v)
    return sys.modules[name]


def add_reference_to_path():
    """Expose the (read-only) reference repo for golden parity tests.

    Stubs out IO-only deps of the reference (plyfile/trimesh/cv2) that are
    not installed here — they are never exercised by the oracle functions.
    """
    import types

    for name in ("plyfile", "trimesh", "cv2"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                stub = types.ModuleType(name)
                stub.PlyData = object
                stub.PlyElement = object
                sys.modules[name] = stub
    # torchvision isn't installed; the reference only touches it inside
    # image-loading helpers that parity tests never call
    if "torchvision" not in sys.modules:
        try:
            __import__("torchvision")
        except ImportError:
            stub_module("torchvision.transforms", InterpolationMode=object)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
