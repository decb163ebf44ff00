"""Standalone worker for the REAL 2-process multi-host test.

Launched by tests/test_multiprocess.py as `python multiproc_worker.py
<rank> <port> <nproc>`: initializes jax.distributed over localhost (CPU
backend, one device per process — the CPU stand-in for one host of a TPU
pod slice), feeds the process-local dataset slice through
DataLoader's global-assembly path (jax.make_array_from_process_local_data)
and runs ONE jitted train step over the global mesh.  The parent compares
the printed loss against a single-process run of the same global batch.

Counterpart of the reference's spawned multi-GPU workers
(reference main.py:399-411, utils/dist.py:51-64), which it only ever ran
as a "BETA" torch.distributed launch.

run_one_step() is imported by the parent test too (process_count == 1
there), so both sides run literally the same code path.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def run_one_step(num_mesh_devices: int) -> float:
    """Build a tiny detector, load ONE deterministic global batch through
    the multi-host DataLoader path, run one train step; return the loss."""
    import jax
    import jax.numpy as jnp

    from ov3det.config import (
        DecoderConfig,
        EncoderConfig,
        ModelConfig,
        TrainConfig,
    )
    from ov3det.datasets import SyntheticDataset
    from ov3det.datasets.loader import DataLoader
    from ov3det.engine import build_training
    from ov3det.models import Model3DETR
    from ov3det.parallel import batch_sharding, make_mesh

    cfg = TrainConfig(
        model=ModelConfig(
            num_semcls=18,
            num_angle_bin=1,
            num_queries=16,
            preenc_npoints=64,
            preenc_mlp=(16, 32, 32),
            encoder=EncoderConfig(num_layers=1, dim=32, ffn_dim=32),
            decoder=DecoderConfig(num_layers=1, dim=32, ffn_dim=32),
            mlp_dropout=0.0,
        ),
        max_epoch=2,
    )
    ds = SyntheticDataset(
        size=8, seed=1, num_points=256,
        num_semcls=cfg.model.num_semcls, num_angle_bin=cfg.model.num_angle_bin,
    )
    mesh = make_mesh(num_mesh_devices)
    loader = DataLoader(
        ds, batch_size=2, shuffle=False, num_workers=1,
        sharding=batch_sharding(mesh), global_assembly=True,
    )
    batch = next(iter(loader))
    inputs = {
        "point_clouds": batch["point_clouds"],
        "point_cloud_dims_min": batch["point_cloud_dims_min"],
        "point_cloud_dims_max": batch["point_cloud_dims_max"],
    }
    from ov3det.parallel import replicate

    model = Model3DETR(cfg.model)
    state, train_step, _, _ = build_training(
        cfg, model, inputs, iters_per_epoch=4, rng=jax.random.PRNGKey(0)
    )
    state = replicate(state, mesh)
    state, metrics = train_step(state, batch, jax.random.PRNGKey(7))
    return float(metrics["loss"])


def main():
    rank, port, nproc = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=rank,
    )
    assert jax.process_count() == nproc, jax.process_count()
    loss = run_one_step(num_mesh_devices=len(jax.devices()))
    print(f"RESULT rank={rank} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
