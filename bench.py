"""End-to-end training-throughput benchmark on the local accelerator.

Prints ONE JSON line.  The headline metric is HONEST end-to-end throughput
matching BASELINE.json's definition ("scenes/sec/chip, e2e preproc+detect"):
fresh scenes flow through the DataLoader every step (host-side numpy scene
synthesis + collate + H2D transfer), overlapping the jitted train step
exactly like a real run.  Extra keys report the step-only number (device
compute ceiling) and the open-vocab configuration with the frozen
RegionCLIP RN50x4 teacher in the loss (the reference's dominant cost:
criterion.py:363-399 re-runs the teacher once per decoder layer, x8; this
framework hoists it to once per step — `ov_per_layer` measures the
reference-equivalent x8 mode).

Flagship point-only config: SUN RGB-D quick (enc 3x d256, dec 8x d256,
2048 pre-encoder points, 128 queries, 20k-point scenes, batch 8 —
reference scripts/sunrgbd_quick.sh).  Open-vocab config adds 530x730
images + per-sample calibration (reference datasets/sunrgbd.py:275-285).

Baseline: the reference reports ~10 days on one GPU for the 1080-epoch
SUN RGB-D open-vocab run (reference "Things to modify.md":6-10) =
1080 epochs x 5285 train scenes / 864000 s ~= 6.6 scenes/sec — the
documented number this repo must beat by >=10x (BASELINE.json).
"""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# persistent compilation cache: repeated bench runs skip recompiles
try:
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from ov3det.config import sunrgbd_quick
from ov3det.datasets import SyntheticDataset, make_batch
from ov3det.datasets.loader import DataLoader
from ov3det.engine import build_training
from ov3det.models import Model3DETR

REFERENCE_SCENES_PER_SEC = 6.6  # see module docstring
BATCH = 8
NUM_POINTS = 20000
WARMUP = 5
ITERS = 40
OV_WARMUP = 2
OV_ITERS = 10
OV_PL_ITERS = 4
IMG_H, IMG_W = 530, 730  # SUN RGB-D fixed canvas (reference sunrgbd.py:47)


class OVSyntheticDataset(SyntheticDataset):
    """Synthetic SUN RGB-D-like scenes + image/calibration fields, so the
    open-vocab loader cost (image synthesis stands in for jpg decode +
    canvas padding) and H2D volume are realistic."""

    _RTILT = np.array(
        [[0.999, 0.02, -0.04], [-0.02, 0.999, 0.01], [0.04, -0.01, 0.999]],
        np.float32,
    )
    _K = np.array([[529.5, 0, 365.0], [0, 529.5, 265.0], [0, 0, 1]], np.float32)

    def __getitem__(self, idx: int) -> dict:
        d = super().__getitem__(idx)
        rng = np.random.default_rng(self.seed * 7919 + idx)
        # uint8 end-to-end: 4x less H2D than a float canvas; the teacher
        # normalizes (and so promotes) on device
        d["image"] = rng.integers(0, 256, size=(IMG_H, IMG_W, 3)).astype(np.uint8)
        d["image_height"] = np.int32(IMG_H)
        d["image_width"] = np.int32(IMG_W)
        d["calib_Rtilt"] = self._RTILT
        d["calib_K"] = self._K
        return d


def time_loop(train_step, state, batches, warmup, rng0=0):
    metrics = None
    for i, batch in enumerate(batches[:warmup]):
        state, metrics = train_step(state, batch, jax.random.PRNGKey(rng0 + i))
    float(metrics["loss"])  # force materialization (block_until_ready can be
    # a no-op on proxied backends)
    t0 = time.perf_counter()
    for i, batch in enumerate(batches[warmup:]):
        state, metrics = train_step(state, batch, jax.random.PRNGKey(rng0 + 100 + i))
    float(metrics["loss"])
    return time.perf_counter() - t0, len(batches) - warmup


def time_loader_loop(run_step, state, loader, warmup, iters):
    """Overlapped loader + step timing: the honest e2e window includes the
    host data path and H2D, hidden behind the step exactly as in training.
    run_step handles both loader item forms (dict / packed pair)."""
    metrics = None
    it = iter(loader)
    for i in range(warmup):
        state, metrics = run_step(state, next(it), jax.random.PRNGKey(i))
    float(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = run_step(state, next(it), jax.random.PRNGKey(100 + i))
    float(metrics["loss"])
    return time.perf_counter() - t0


def build(cfg, teacher_fn=None, teacher_vars=None, iters_per_epoch=660):
    model = Model3DETR(cfg.model)
    rng = np.random.default_rng(0)
    batch_np = make_batch(
        rng,
        batch_size=BATCH,
        num_points=NUM_POINTS,
        num_semcls=cfg.model.num_semcls,
        num_angle_bin=cfg.model.num_angle_bin,
    )
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    inputs = {
        "point_clouds": batch["point_clouds"],
        "point_cloud_dims_min": batch["point_cloud_dims_min"],
        "point_cloud_dims_max": batch["point_cloud_dims_max"],
    }
    state, train_step, _, _ = build_training(
        cfg, model, inputs, iters_per_epoch=iters_per_epoch,
        rng=jax.random.PRNGKey(0), teacher_fn=teacher_fn,
        teacher_vars=teacher_vars,
    )
    from ov3det.engine.train import make_packed_step

    packed_step = make_packed_step(train_step)

    def run_step(state, item, key):
        if isinstance(item, tuple):  # packed_device: unpack fused in-step
            return packed_step(state, item[0], item[1], key)
        return train_step(state, item, key)

    return state, run_step, batch


def bench_point(cfg):
    state, run_step, staged = build(cfg)

    # step-only: one staged batch, dependency-chained steps
    dt, n = time_loop(run_step, state, [staged] * (WARMUP + ITERS), WARMUP)
    step_only = BATCH * n / dt

    # e2e: fresh scenes through the DataLoader (host preproc + H2D + unpack
    # fused into the step).  Median of 3 windows: dispatch latency through
    # this harness's shared device tunnel wobbles ~1.5x run-to-run, and a
    # single 40-iter window inherits that noise wholesale.
    rates = []
    for rep in range(3):
        ds = SyntheticDataset(
            size=(WARMUP + ITERS) * BATCH,
            seed=3 + rep,
            num_points=NUM_POINTS,
            num_semcls=cfg.model.num_semcls,
            num_angle_bin=cfg.model.num_angle_bin,
        )
        loader = DataLoader(
            ds, batch_size=BATCH, shuffle=False, num_workers=6, prefetch=3,
            sharding=jax.sharding.SingleDeviceSharding(jax.devices()[0]),
            worker_type="process", transfer="packed_device",
        )
        dt = time_loader_loop(run_step, state, loader, WARMUP, ITERS)
        loader.shutdown()
        rates.append(BATCH * ITERS / dt)
    e2e = sorted(rates)[1]
    return e2e, step_only


def bench_ov(cfg, per_layer: bool, iters: int):
    from ov3det.models.regionclip import RegionCLIPTeacher, make_teacher_fn

    # RN50x4 (width 80, layers (4,6,10,6)); bfloat16 trunk = TPU-fast frozen teacher
    teacher = RegionCLIPTeacher(compute_dtype="bfloat16")
    init_img = jnp.zeros((1, IMG_H, IMG_W, 3), jnp.float32)
    t_vars = jax.jit(
        lambda: teacher.init(jax.random.PRNGKey(0), init_img, jnp.zeros((1, 1, 4)))
    )()
    teacher_fn = make_teacher_fn(teacher, per_layer=per_layer)
    state, run_step, _ = build(cfg, teacher_fn=teacher_fn, teacher_vars=t_vars)

    warmup = 1 if per_layer else OV_WARMUP
    reps = 1 if per_layer else 3  # median-of-3, like bench_point
    rates = []
    for rep in range(reps):
        ds = OVSyntheticDataset(
            size=(warmup + iters) * BATCH,
            seed=5 + rep,
            num_points=NUM_POINTS,
            num_semcls=cfg.model.num_semcls,
            num_angle_bin=cfg.model.num_angle_bin,
        )
        loader = DataLoader(
            ds, batch_size=BATCH, shuffle=False, num_workers=6, prefetch=3,
            sharding=jax.sharding.SingleDeviceSharding(jax.devices()[0]),
            worker_type="process", transfer="packed_device",
        )
        dt = time_loader_loop(run_step, state, loader, warmup, iters)
        loader.shutdown()
        rates.append(BATCH * iters / dt)
    return sorted(rates)[len(rates) // 2]


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    cfg = sunrgbd_quick()

    extras = {}
    e2e, step_only = bench_point(cfg)
    extras["step_only_scenes_per_sec"] = round(step_only, 3)

    if mode in ("all", "ov"):
        try:
            from dataclasses import replace

            ov_cfg = replace(
                cfg, loss=replace(cfg.loss, alignment_2d_weight=1.0)
            )
            extras["ov_scenes_per_sec"] = round(
                bench_ov(ov_cfg, per_layer=False, iters=OV_ITERS), 3
            )
            extras["ov_vs_baseline"] = round(
                extras["ov_scenes_per_sec"] / REFERENCE_SCENES_PER_SEC, 3
            )
            extras["ov_per_layer_scenes_per_sec"] = round(
                bench_ov(ov_cfg, per_layer=True, iters=OV_PL_ITERS), 3
            )
        except Exception as exc:  # pragma: no cover - keep the headline alive
            extras["ov_error"] = f"{type(exc).__name__}: {exc}"[:200]

    print(
        json.dumps(
            {
                "metric": "train_scenes_per_sec_per_chip_sunrgbd_e2e",
                "value": round(e2e, 3),
                "unit": "scenes/sec/chip",
                "vs_baseline": round(e2e / REFERENCE_SCENES_PER_SEC, 3),
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
