import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from dataclasses import replace as dc_replace

    from bench import (BATCH, IMG_H, IMG_W, NUM_POINTS, OVSyntheticDataset,
                       build)
    from ov3det.config import replace, sunrgbd_quick
    from ov3det.datasets.loader import DataLoader
    from ov3det.models.regionclip import RegionCLIPTeacher, make_teacher_fn

    cfg = sunrgbd_quick()
    ov_cfg = replace(cfg, loss=replace(cfg.loss, alignment_2d_weight=1.0))
    teacher = RegionCLIPTeacher(compute_dtype="bfloat16")
    t_vars = jax.jit(lambda: teacher.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG_H, IMG_W, 3)), jnp.zeros((1, 1, 4))))()
    teacher_fn = make_teacher_fn(teacher, per_layer=False)
    state, run_step, _ = build(ov_cfg, teacher_fn=teacher_fn, teacher_vars=t_vars)

    def mk_ds(n):
        return OVSyntheticDataset(size=n * BATCH, seed=5, num_points=NUM_POINTS,
                                  num_semcls=cfg.model.num_semcls,
                                  num_angle_bin=cfg.model.num_angle_bin)

    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    # 1. loader-only (host, no device)
    loader = DataLoader(mk_ds(15), batch_size=BATCH, shuffle=False,
                        num_workers=6, prefetch=3, worker_type="process",
                        transfer="tree")
    it = iter(loader)
    next(it)
    t0 = time.perf_counter()
    n = sum(1 for _ in it)
    print(f"ov loader-only host: {(time.perf_counter()-t0)/n*1e3:.0f} ms/batch",
          flush=True)
    loader.shutdown()

    # 2. staged-batch step rate (teacher + detector, no loader)
    loader = DataLoader(mk_ds(2), batch_size=BATCH, shuffle=False,
                        num_workers=2, prefetch=2, worker_type="thread",
                        transfer="packed_device", sharding=sharding)
    items = list(iter(loader))
    loader.shutdown()
    st, m = run_step(state, items[0], jax.random.PRNGKey(0))
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(10):
        st, m = run_step(st, items[i % 2], jax.random.PRNGKey(i))
    float(m["loss"])
    print(f"ov staged step: {(time.perf_counter()-t0)/10*1e3:.0f} ms/batch",
          flush=True)

    # 3. combined with per-phase timing
    loader = DataLoader(mk_ds(12), batch_size=BATCH, shuffle=False,
                        num_workers=6, prefetch=3, worker_type="process",
                        transfer="packed_device", sharding=sharding)
    it = iter(loader)
    st, m = run_step(state, next(it), jax.random.PRNGKey(0))
    float(m["loss"])
    t_f = t_d = 0.0
    t0 = time.perf_counter()
    n = 0
    for _ in range(11):
        ta = time.perf_counter()
        try:
            b = next(it)
        except StopIteration:
            break
        tb = time.perf_counter()
        st, m = run_step(st, b, jax.random.PRNGKey(n))
        tc = time.perf_counter()
        t_f += tb - ta
        t_d += tc - tb
        n += 1
    float(m["loss"])
    dt = time.perf_counter() - t0
    print(f"ov combined: {n*BATCH/dt:.1f} scenes/s (fetch {t_f/n*1e3:.0f}ms, "
          f"dispatch {t_d/n*1e3:.0f}ms, total {dt/n*1e3:.0f}ms/batch)",
          flush=True)
    loader.shutdown()


if __name__ == "__main__":
    main()
