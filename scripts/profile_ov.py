"""Profile the open-vocab train step on the local accelerator.

Stages one super-batch group (same staged path as bench.py's ov
step-only section), traces one run_step (OV_SUPER sub-steps) with
jax.profiler, and prints per-step kernel-time aggregates from the
XLA-Ops track — first grouped by kernel name, then by (kernel, source
file:line).  This is the tool behind docs/PROFILE.md's tables.

Run from the repo root: python scripts/profile_ov.py
"""
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataclasses import replace

from ov3det.config import sunrgbd_quick
from ov3det.datasets import SyntheticOVDataset
from ov3det.datasets.loader import pack_batch
from ov3det.models.regionclip import RegionCLIPTeacher, make_teacher_fn
from bench import BATCH, IMG_H, IMG_W, NUM_POINTS, OV_QUANTIZE, OV_SUPER, _key, build


def main():
    cfg = sunrgbd_quick()
    ov_cfg = replace(cfg, loss=replace(cfg.loss, alignment_2d_weight=1.0))
    teacher = RegionCLIPTeacher(compute_dtype="int8")
    # disk-cached deterministic quantized tree (see bench._teacher_vars_cached)
    from bench import _teacher_vars_cached
    t_vars = _teacher_vars_cached(teacher)
    state, run_step, _, _, _ = build(ov_cfg, teacher_fn=make_teacher_fn(teacher),
                                     teacher_vars=t_vars)
    ds = SyntheticOVDataset(size=OV_SUPER * BATCH, seed=5,
                            num_points=NUM_POINTS,
                            num_semcls=cfg.model.num_semcls,
                            num_angle_bin=cfg.model.num_angle_bin)
    bufs, metas = [], None
    for g in range(OV_SUPER):
        items = [ds[g * BATCH + i] for i in range(BATCH)]
        # OV_QUANTIZE (q16 points + yuv420 images): the SAME codec bench.py's
        # OV sections use, so this traces the exact program they compiled
        b, metas = pack_batch(
            {k: np.stack([it[k] for it in items]) for k in items[0]},
            quantize=OV_QUANTIZE,
        )
        bufs.append(b)
    group = (
        jax.device_put(np.stack(bufs),
                       jax.sharding.SingleDeviceSharding(jax.devices()[0])),
        metas,
    )
    for w in range(2):
        state, m = run_step(state, group, _key(w))
    float(np.asarray(m["loss"]).ravel()[-1])
    print("warm; tracing one group step", flush=True)

    tdir = "/tmp/ovtrace"
    with jax.profiler.trace(tdir):
        state, m = run_step(state, group, _key(9))
        float(np.asarray(m["loss"]).ravel()[-1])

    paths = glob.glob(tdir + "/**/*.trace.json.gz", recursive=True)
    ev, names = [], {}
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        for e in data.get("traceEvents", []):
            if e.get("ph") == "X":
                ev.append(e)
            elif e.get("ph") == "M" and e.get("name") == "thread_name":
                names[(e["pid"], e["tid"])] = e["args"]["name"]
    ops = [e for e in ev if names.get((e["pid"], e["tid"]), "") == "XLA Ops"]
    agg, srcagg = collections.Counter(), collections.Counter()
    for e in ops:
        dur = e.get("dur", 0) / 1e3  # us -> ms
        nm = e["name"].split(".")[0]
        agg[nm] += dur
        src = (e.get("args") or {}).get("source", "")
        srcagg[(nm, src.split("/")[-1])] += dur
    G = OV_SUPER
    print(f"total XLA-Ops ms in trace: {sum(agg.values()):.1f} ({G} sub-steps)")
    for nm, ms in agg.most_common(14):
        print(f"  {ms / G:7.2f} ms/step  {nm}")
    print("-- by source --")
    for (nm, src), ms in srcagg.most_common(18):
        print(f"  {ms / G:7.2f} ms/step  {nm}  {src}")


if __name__ == "__main__":
    main()
