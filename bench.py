"""End-to-end training-throughput benchmark on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures full training-step throughput (forward + criterion incl. Hungarian
matching and GIoU + backward + AdamW) on the flagship SUN RGB-D config
(enc 3x d256, dec 8x d256, 2048 pre-encoder points, 128 queries, 20k-point
scenes, batch 8 — reference scripts/sunrgbd_quick.sh).

Baseline: the reference reports ~10 days on one GPU for the 1080-epoch
SUN RGB-D run (reference "Things to modify.md":6-10) = 1080 epochs x 5285
train scenes / 864000 s ~= 6.6 scenes/sec — the documented reference
number this repo must beat by >=10x (BASELINE.json north star).
"""
import json
import os
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
from ov3det.datasets import make_batch
from ov3det.engine import build_training
from ov3det.models import Model3DETR

REFERENCE_SCENES_PER_SEC = 6.6  # see module docstring
BATCH = 8
NUM_POINTS = 20000
WARMUP = 5
ITERS = 40


def main():
    cfg = sunrgbd_quick()
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
        cfg, model, inputs, iters_per_epoch=660, rng=jax.random.PRNGKey(0)
    )

    for i in range(WARMUP):
        state, metrics = train_step(state, batch, jax.random.PRNGKey(i))
    float(metrics["loss"])  # force materialization (block_until_ready can be
    # a no-op on proxied backends)

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics = train_step(state, batch, jax.random.PRNGKey(100 + i))
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    scenes_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "train_scenes_per_sec_per_chip_sunrgbd",
                "value": round(scenes_per_sec, 3),
                "unit": "scenes/sec/chip",
                "vs_baseline": round(scenes_per_sec / REFERENCE_SCENES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
