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


def run_one_step(num_mesh_devices: int, ov: bool = False) -> float:
    """Build a tiny detector, load ONE deterministic global batch through
    the multi-host DataLoader path, run one train step; return the loss.

    ov=True runs the FLAGSHIP open-vocab configuration: a tiny int8
    W8A8 RegionCLIP teacher (deterministic PTQ — the default calibration
    batch is seeded) + the 2D-alignment loss over image/calib fields,
    so multi-process evidence covers the benched path, not only the
    point-only detector (reference criterion.py:363-399 is the teacher
    workload; main.py:405-411 the multi-GPU launch being stood in for)."""
    import jax
    import jax.numpy as jnp

    from ov3det.config import (
        DecoderConfig,
        EncoderConfig,
        LossConfig,
        MatcherConfig,
        ModelConfig,
        TrainConfig,
    )
    from ov3det.datasets import SyntheticDataset
    from ov3det.datasets.loader import DataLoader
    from ov3det.datasets.synthetic import SyntheticOVDataset
    from ov3det.engine import build_training
    from ov3det.models import Model3DETR
    from ov3det.parallel import batch_sharding, make_mesh

    embed = 32
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
            # nonzero in BOTH modes: the classifier is always the
            # visual-embed @ text-embed product, and a 0-dim Dense cannot
            # initialize (fan-in division by zero)
            clip_embed_dim=embed,
        ),
        loss=LossConfig(
            matcher=MatcherConfig(),
            alignment_2d_weight=1.0 if ov else 0.0,
        ),
        max_epoch=2,
    )
    ds_kw = dict(
        size=8, seed=1, num_points=256,
        num_semcls=cfg.model.num_semcls, num_angle_bin=cfg.model.num_angle_bin,
    )
    teacher_fn = teacher_vars = None
    if ov:

        class TinyOV(SyntheticOVDataset):
            IMG_H, IMG_W = 64, 96  # tiny canvas: this is a wiring test

        ds = TinyOV(**ds_kw)
        from ov3det.models.regionclip import (
            RegionCLIPTeacher,
            make_teacher_fn,
            quantize_teacher_params,
        )

        teacher_kw = dict(width=16, layers=(1, 1, 1, 1), embed_dim=embed,
                          pooler_resolution=6, image_resolution=TinyOV.IMG_H)
        f32_vars = RegionCLIPTeacher(**teacher_kw).init(
            jax.random.PRNGKey(7),
            jnp.zeros((1, TinyOV.IMG_H, TinyOV.IMG_W, 3), jnp.float32),
            jnp.zeros((1, 1, 4)),
        )
        teacher = RegionCLIPTeacher(compute_dtype="int8", **teacher_kw)
        # deterministic PTQ (seeded default calibration): every process
        # computes the identical int8 tree, like a broadcast checkpoint
        teacher_vars = quantize_teacher_params(
            f32_vars, "int8", teacher=RegionCLIPTeacher(**teacher_kw))
        teacher_fn = make_teacher_fn(teacher)
    else:
        ds = SyntheticDataset(**ds_kw)
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
        cfg, model, inputs, iters_per_epoch=4, rng=jax.random.PRNGKey(0),
        teacher_fn=teacher_fn, teacher_vars=teacher_vars,
    )
    state = replicate(state, mesh)
    state, metrics = train_step(state, batch, jax.random.PRNGKey(7))
    return float(metrics["loss"])


def main():
    rank, port, nproc = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
    ov = len(sys.argv) > 4 and sys.argv[4] == "ov"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=rank,
    )
    assert jax.process_count() == nproc, jax.process_count()
    loss = run_one_step(num_mesh_devices=len(jax.devices()), ov=ov)
    print(f"RESULT rank={rank} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
