"""Eval-path wall-time measurement on the real chip (VERDICT r4 item 7).

The reference's evaluation is its #3 hot loop (SURVEY.md): per-scan
parse_predictions runs per-box Delaunay-hull volume + python while-loop
NMS on the host, and the AP computation fans out over a Pool(10)
(reference utils/eval_det.py:214-272, utils/ap_calculator.py:70-190).
ov3det parses on DEVICE — half-space in-box tests + fori-loop greedy NMS
inside one jitted program (ov3det/eval/parse.py) — and computes VOC AP
with one vectorized per-scan IoU matrix per class on the host
(ov3det/eval/voc.py), no pool.

This script times the three legs of `evaluate()` (ov3det/main.py:344) at
the flagship SUN RGB-D shapes on synthetic val scenes:

  1. eval_step      — jitted model forward, final-layer outputs (device)
  2. step_meter     — jitted parse (device) + fetch + per-scan list build
  3. compute_metrics — host VOC AP at IoU 0.25 + 0.5, exact_eval

and prints ONE JSON line (scenes/s + per-leg ms/scene).  The dated
result is recorded in docs/PROFILE.md.  Run standalone, one compute job
at a time (see .claude/skills/verify).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ov3det.config import sunrgbd_quick
from ov3det.datasets.synthetic import make_batch
from ov3det.engine import build_training
from ov3det.eval import APCalculator
from ov3det.models import Model3DETR

BATCH = 8
NUM_POINTS = 20000
N_BATCHES = 16  # 128 val scenes (SUN RGB-D val is 5050; rate is per-scene)


def time_reference(saved, num_semcls: int) -> dict:
    """Time the REFERENCE eval path (torch/numpy host: per-box Delaunay
    in-hull parse + python while-loop NMS + pooled eval_det,
    reference utils/ap_calculator.py:39-238 + utils/eval_det.py:214-272)
    on the SAME model outputs our path just parsed, imported from
    /root/reference like the parity tests do.  `saved` is a list of
    (outputs_np, batch) pairs — few of them: the reference parse is
    seconds/scene at 20k points x 128 proposals."""
    from tests.conftest import add_reference_to_path, reference_available

    if not reference_available():
        return {"reference": "absent"}
    add_reference_to_path()
    import torch
    from utils.ap_calculator import APCalculator as RefAPCalculator

    n_cls = num_semcls  # class bodies can't read same-named function args

    class _DC:
        num_semcls = n_cls

    calc = RefAPCalculator(dataset_config=_DC(), ap_iou_thresh=[0.25, 0.5],
                           exact_eval=True)
    t_parse = 0.0
    n = 0
    for out, b in saved:
        t0 = time.perf_counter()
        calc.step(
            predicted_box_corners=torch.from_numpy(out["box_corners"]),
            sem_cls_probs=torch.from_numpy(out["sem_cls_prob"]),
            objectness_probs=torch.from_numpy(out["objectness_prob"]),
            point_cloud=torch.from_numpy(np.asarray(b["point_clouds"], np.float32)),
            gt_box_corners=torch.from_numpy(np.asarray(b["gt_box_corners"], np.float32)),
            gt_box_sem_cls_labels=torch.from_numpy(np.asarray(b["gt_box_sem_cls_label"])),
            gt_box_present=torch.from_numpy(np.asarray(b["gt_box_present"], np.float32)),
        )
        t_parse += time.perf_counter() - t0
        n += b["point_clouds"].shape[0]
    t0 = time.perf_counter()
    calc.compute_metrics()
    t_ap = time.perf_counter() - t0
    return {
        "ref_scenes": n,
        "ref_parse_step_ms_per_scene": round(t_parse / n * 1e3, 1),
        "ref_ap_ms_per_scene": round(t_ap / n * 1e3, 1),
        "ref_scenes_per_sec": round(n / (t_parse + t_ap), 2),
    }


def main():
    cfg = sunrgbd_quick()
    batches = []
    for k in range(N_BATCHES):
        b = make_batch(
            np.random.default_rng(k),
            batch_size=BATCH,
            num_points=NUM_POINTS,
            num_semcls=cfg.model.num_semcls,
            num_angle_bin=cfg.model.num_angle_bin,
        )
        batches.append(b)

    model = Model3DETR(cfg.model)
    first = {k: jnp.asarray(v) for k, v in batches[0].items()}
    inputs = {k: first[k] for k in (
        "point_clouds", "point_cloud_dims_min", "point_cloud_dims_max")}
    state, _, eval_step, _ = build_training(
        cfg, model, inputs, iters_per_epoch=660, rng=jax.random.PRNGKey(0))

    class _DC:
        num_semcls = cfg.model.num_semcls
        class2type = {i: str(i) for i in range(cfg.model.num_semcls)}

    def fresh_ap():
        return APCalculator(
            dataset_config=_DC(), ap_iou_thresh=[0.25, 0.5],
            class2type_map=_DC.class2type, exact_eval=True,
        )

    # warm the two jitted programs (forward + device parse)
    t0 = time.perf_counter()
    warm_out = eval_step(state, first)
    jax.block_until_ready(warm_out)
    t_compile_fwd = time.perf_counter() - t0
    t0 = time.perf_counter()
    fresh_ap().step_meter(warm_out, first)
    t_compile_parse = time.perf_counter() - t0
    print(f"[eval-timing] warmup: fwd {t_compile_fwd:.1f}s, "
          f"parse+meter {t_compile_parse:.1f}s", file=sys.stderr)

    ap = fresh_ap()
    t_put = t_dev = t_meter = 0.0
    saved_dev = []
    wall0 = time.perf_counter()
    for b in batches:
        t0 = time.perf_counter()
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        jax.block_until_ready(jb["point_clouds"])
        t_put += time.perf_counter() - t0
        t0 = time.perf_counter()
        out = eval_step(state, jb)
        jax.block_until_ready(out)
        t_dev += time.perf_counter() - t0
        t0 = time.perf_counter()
        ap.step_meter(out, jb)
        t_meter += time.perf_counter() - t0
        if len(saved_dev) < args.reference:
            saved_dev.append((out, b))  # device refs: fetched after timing
    t0 = time.perf_counter()
    metrics = ap.compute_metrics()
    t_ap = time.perf_counter() - t0
    wall = time.perf_counter() - wall0

    n = N_BATCHES * BATCH
    result = {
        "metric": "eval_scenes_per_sec",
        "value": round(n / wall, 2),
        "unit": "scenes/sec",
        "scenes": n,
        "put_ms_per_scene": round(t_put / n * 1e3, 2),
        "eval_step_ms_per_scene": round(t_dev / n * 1e3, 2),
        "parse_meter_ms_per_scene": round(t_meter / n * 1e3, 2),
        "voc_ap_ms_per_scene": round(t_ap / n * 1e3, 2),
        "map25": round(float(metrics[0.25]["mAP"]), 4),
        "map50": round(float(metrics[0.5]["mAP"]), 4),
        "platform": jax.devices()[0].platform,
    }
    if saved_dev:
        keys = ("box_corners", "sem_cls_prob", "objectness_prob")
        saved = [({k: np.asarray(jax.device_get(out[k]), np.float32)
                   for k in keys}, b) for out, b in saved_dev]
        result.update(time_reference(saved, cfg.model.num_semcls))
    print(json.dumps(result))


if __name__ == "__main__":
    ap_cli = argparse.ArgumentParser()
    ap_cli.add_argument("--reference", type=int, default=2,
                        help="batches to also time through the reference "
                        "torch eval path (0 = skip)")
    args = ap_cli.parse_args()
    main()
