"""REAL multi-process multi-host execution (reference main.py:399-411).

Every other multi-host test simulates process_index/process_count inside
one process; this one spawns 2 actual OS processes that initialize
jax.distributed over localhost (CPU backend, 1 device each = a 2-host
"pod" stand-in), assemble the global batch from per-process loader slices
via jax.make_array_from_process_local_data, and run one jitted train step
over the 2-device global mesh.  The loss must match a single-process run
of the same global batch.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _race_two_processes(mode: str):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # one CPU device per process (the parent conftest forces 8 virtual
    # devices; workers must not inherit that)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(rank), str(port), "2", mode],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for rank in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=600)
            assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    losses = []
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                losses.append(float(line.split("loss=")[1]))
    assert len(losses) == 2, outs
    # GSPMD replicates the metrics: both hosts see the identical loss
    assert losses[0] == pytest.approx(losses[1], abs=1e-5)

    # single-process run of the same global batch through the same code
    from tests.multiproc_worker import run_one_step

    want = run_one_step(num_mesh_devices=2, ov=(mode == "ov"))
    np.testing.assert_allclose(losses[0], want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_two_process_step_matches_single_process():
    _race_two_processes("point")


@pytest.mark.slow
def test_two_process_ov_step_matches_single_process():
    """The FLAGSHIP config across real process boundaries: tiny int8
    RegionCLIP teacher (deterministically quantized in each process) +
    2D-alignment loss, image/calib fields through the global-assembly
    loader — sharded loss == single-process loss (VERDICT r4 item 8;
    reference main.py:405-411)."""
    _race_two_processes("ov")
