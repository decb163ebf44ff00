"""End-to-end training-throughput benchmark on the local accelerator.

Prints one JSON result line per completed section, each a superset of the
last — the driver parses the tail, so the final (most complete) line wins,
and if any later section is killed the already-flushed headline stands.
Progress/diagnostics go to stderr only.

The headline metric is HONEST end-to-end throughput matching BASELINE.json's
definition ("scenes/sec/chip, e2e preproc+detect"): fresh scenes flow
through the DataLoader every step (host-side numpy scene synthesis +
collate + H2D transfer), overlapping the jitted train step exactly like a
real run.  Extra keys report the step-only number (device compute ceiling),
the fetch/dispatch wall split inside the e2e window, an estimated MFU from
XLA's own cost analysis, and the open-vocab configuration with the frozen
RegionCLIP RN50x4 teacher in the loss (the reference's dominant cost:
criterion.py:363-399).

Open-vocab transport (round 5): images ride the DEVICE IMAGE BANK
(datasets/image_bank.py) — the canvas is static per scene (the reference
re-reads the same jpg every epoch of its 1080-epoch run), so the yuv420
rows are uploaded ONCE at standup like the teacher weights, and measured
steps ship only the per-step-fresh data (augmented q16 points + labels).
The standup upload is timed outside the windows exactly like the teacher
load: both are one-time costs a real multi-epoch run amortizes to zero,
and the measured windows ARE the steady state of such a run.  The ScanNet
parity config (scannet_quick shapes) runs LAST, budget-guarded
("scannet_*" keys).

Every section is wall-clock budget-guarded (default 1500 s total, override
with --budget or BENCH_BUDGET_S): a section that would bust the budget is
skipped and recorded as "skipped_<name>": "budget" instead of timing out
the whole run.  The default budget covers all sections warm-cache
(~6 min point e2e incl. program standup through the remote tunnel, ~1 min
step-only+MFU, ~8 min OV incl. teacher standup); the per-section flush
means an external kill still leaves every completed section's JSON line
on stdout.  The reference-parity x8 per-layer teacher mode is opt-in
(--per-layer): it re-runs the teacher once per decoder layer like
reference criterion.py:434-442 and is documented, not default-benched.

Flagship point-only config: SUN RGB-D quick (enc 3x d256, dec 8x d256,
2048 pre-encoder points, 128 queries, 20k-point scenes, batch 8 —
reference scripts/sunrgbd_quick.sh).  Open-vocab config adds 530x730
images + per-sample calibration (reference datasets/sunrgbd.py:275-285).

Baseline: the reference reports ~10 days on one GPU for the 1080-epoch
SUN RGB-D open-vocab run (reference "Things to modify.md":6-10) =
1080 epochs x 5285 train scenes / 864000 s ~= 6.6 scenes/sec — the
documented number this repo must beat by >=10x (BASELINE.json).
"""
import argparse
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
from ov3det.datasets import SyntheticDataset, SyntheticOVDataset, make_batch
from ov3det.datasets.loader import DataLoader
from ov3det.engine import build_training
from ov3det.models import Model3DETR

REFERENCE_SCENES_PER_SEC = 6.6  # see module docstring
BATCH = 8
NUM_POINTS = 20000
SCANNET_NUM_POINTS = 40000  # reference scripts/scannet_quick.sh shapes
WARMUP = 5
STEP_ITERS = 30
E2E_ITERS = 12  # ITEMS per window; median of 3 windows from ONE stream
# super-batch group size: ONE H2D put + ONE scan dispatch per G batches.
# On this transport every per-batch put serializes behind in-flight compute
# (~a full step of wall time each); grouping amortizes that to 1/G.
SUPER = 8
# OV groups are 8 batches too since round 5: with the device image bank the
# group put carries only q16 points + labels (~8 MB vs the former ~23 MB
# with inline yuv canvases), so doubling the group halves put/dispatch
# round-trips per scene without the byte blowup that capped it at 4 before
OV_SUPER = 8
OV_WARMUP = 2
OV_ITERS = 4  # items/window at OV_SUPER batches each
OV_PL_ITERS = 4
QUANTIZE = ("point_clouds",)  # q16 H2D codec (datasets/loader.py)
# OV batches carry image_ref into the device image bank (one-time yuv420
# upload at standup; datasets/image_bank.py) — the per-step put is points +
# labels only.  "image" stays in the quantize tuple for any non-bank OV
# dataset (it no-ops when the key is absent); the yuv codec itself is
# fidelity-tested in tests/test_teacher_parity.py + raced in
# tests/test_training_race_ov.py.
OV_QUANTIZE = QUANTIZE + ("image",)
# TPU v5e peak dense bf16 matmul throughput (public spec) — MFU denominator
V5E_PEAK_FLOPS = 197e12

_T0 = time.perf_counter()


def note(msg: str):
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


class Budget:
    def __init__(self, total_s: float):
        self.deadline = _T0 + total_s

    def remaining(self) -> float:
        return self.deadline - time.perf_counter()

    def allows(self, est_s: float) -> bool:
        return self.remaining() > est_s


def emit(result: dict):
    """Flush one complete JSON result line to stdout (driver parses tail)."""
    print(json.dumps(result), flush=True)


def _key(i: int):
    """Host-side old-style PRNG key (uint32[2]): jax.random.PRNGKey is a
    device dispatch — one extra RPC per item through the tunnel."""
    return np.array([0, i], np.uint32)


# Error substrings that mean "the tunnel/backend hiccuped", not "the code is
# wrong": the remote_compile proxy was observed (2026-08-21, twice in one
# hour) to drop the response body mid-compile, surfacing as
# JaxRuntimeError INTERNAL.  One retry after a pause rode it out both times.
_TRANSIENT = ("remote_compile", "INTERNAL:", "UNAVAILABLE:",
              "DEADLINE_EXCEEDED", "Connection reset", "Socket closed")
_RETRY_PAUSE_S = 20.0


def retry_transient(thunk, budget, label):
    """Run thunk; on a transient tunnel/backend error retry ONCE after a
    pause (partial compiles already landed in the persistent cache, so the
    retry stands up faster).  Non-matching errors and second failures
    re-raise so each section still records its honest error key."""
    try:
        return thunk()
    except Exception as exc:
        msg = f"{type(exc).__name__}: {exc}"
        if not any(p in msg for p in _TRANSIENT) or not budget.allows(60):
            raise
        note(f"{label}: transient backend error, retrying once ({msg[:160]})")
        time.sleep(_RETRY_PAUSE_S)
        return thunk()


def time_loop(run_step, state, batches, warmup, rng0=0):
    metrics = None
    for i, batch in enumerate(batches[:warmup]):
        state, metrics = run_step(state, batch, _key(rng0 + i))
    float(metrics["loss"])  # force materialization (block_until_ready can be
    # a no-op on proxied backends)
    t0 = time.perf_counter()
    for i, batch in enumerate(batches[warmup:]):
        state, metrics = run_step(state, batch, _key(rng0 + 100 + i))
    float(metrics["loss"])
    return time.perf_counter() - t0, len(batches) - warmup


def _last_loss(metrics) -> float:
    """Materialize the (possibly (G,)-stacked) loss; forces all prior work."""
    return float(np.asarray(metrics["loss"]).ravel()[-1])


def time_loader_windows(run_step, state, loader, warmup, iters, windows,
                        budget: Budget, scenes_per_item: int = BATCH):
    """Overlapped loader + step timing: the honest e2e window includes the
    host data path and H2D, hidden behind the step exactly as in training.
    Takes `windows` consecutive measurement windows from ONE loader stream
    (one worker pool — reusing it avoids re-paying process spawn per rep)
    and returns (median rate, mean fetch ms, mean dispatch ms, windows_run).
    `iters` counts loader ITEMS; with super-batching each item carries
    scenes_per_item = G * BATCH scenes.  Stops early if the budget runs
    out; the windows already taken stand."""
    metrics = None
    it = iter(loader)
    for i in range(warmup):
        state, metrics = run_step(state, next(it), _key(i))
    _last_loss(metrics)
    rates, fetch_ms, disp_ms = [], [], []
    for w in range(windows):
        t_f = t_d = 0.0
        t0 = time.perf_counter()
        for i in range(iters):
            ta = time.perf_counter()
            batch = next(it)
            tb = time.perf_counter()
            state, metrics = run_step(
                state, batch, _key(1000 * w + 100 + i)
            )
            t_f += tb - ta
            t_d += time.perf_counter() - tb
        _last_loss(metrics)
        dt = time.perf_counter() - t0
        rates.append(scenes_per_item * iters / dt)
        fetch_ms.append(t_f / iters * 1e3)
        disp_ms.append(t_d / iters * 1e3)
        if w + 1 < windows and not budget.allows(dt * 1.5):
            note(f"stopping e2e windows early after {w + 1}/{windows} (budget)")
            break
    return rates, float(np.mean(fetch_ms)), float(np.mean(disp_ms))


def rate_stats(rates):
    """(median, min, max) over measurement windows — the spread keys let a
    congested-transport run be diagnosed from the JSON artifact alone."""
    return (sorted(rates)[len(rates) // 2], min(rates), max(rates))


def build(cfg, teacher_fn=None, teacher_vars=None, iters_per_epoch=660,
          num_points=NUM_POINTS, image_bank=None, image_bank_hw=None):
    model = Model3DETR(cfg.model)
    rng = np.random.default_rng(0)
    batch_np = make_batch(
        rng,
        batch_size=BATCH,
        num_points=num_points,
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
        teacher_vars=teacher_vars, image_bank=image_bank,
        image_bank_hw=image_bank_hw,
    )
    from ov3det.engine.train import make_packed_group_step, make_packed_step

    packed_step = make_packed_step(train_step)
    group_step = make_packed_group_step(train_step)

    def run_step(state, item, key):
        if isinstance(item, tuple):  # packed_device: unpack fused in-step
            if item[0].ndim == 2:  # (G, nbytes) super-batch group:
                # G plain dispatches against the device-resident buffer
                # (lax.scan bodies run 2-3x slow through this transport)
                return group_step(state, item[0], item[1], key)
            return packed_step(state, item[0], item[1], key)
        return train_step(state, item, key)

    return state, run_step, batch, train_step, group_step


def group_flops(group_step, state, group) -> float:
    """XLA's FLOP estimate for ONE batch's train step (fwd+bwd+update).

    Cost-analyzes the group step's inner jitted sub_step — the SAME
    program the e2e/step-only sections already compiled (lower().compile()
    re-keys into the compilation cache), so this never stands up a fresh
    program — the round-3 failure mode where MFU was the section the
    budget dropped."""
    try:
        compiled = group_step.sub_step.lower(
            state, group[0], jnp.asarray(0, jnp.int32), group[1], _key(0)
        ).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception as exc:  # cost analysis is best-effort on remote backends
        note(f"cost_analysis unavailable: {type(exc).__name__}: {exc}")
        return 0.0


def make_loader(ds, super_batch=1, quantize=QUANTIZE):
    # thread workers, few of them: this harness host has ONE CPU core, so
    # process workers only add pickling/IPC (~13 ms/batch measured) and
    # extra workers add nothing; batch synthesis is numpy-heavy (releases
    # the GIL) and overlaps the REMOTE device execution just fine from
    # threads
    return DataLoader(
        ds, batch_size=BATCH, shuffle=False, num_workers=3, prefetch=3,
        sharding=jax.sharding.SingleDeviceSharding(jax.devices()[0]),
        worker_type="thread", transfer="packed_device",
        super_batch=super_batch,
        # q16 point codec: points are ~95% of the point-only batch bytes and
        # the tunnel H2D (~50 MB/s, serializing against in-flight compute)
        # is the e2e bottleneck — halving the put is worth ~0.1 mm of
        # quantization noise (loader.py codec notes)
        quantize=quantize,
    )


def bench_point_e2e(cfg, budget: Budget, extras: dict,
                    num_points=NUM_POINTS, kp="e2e", label="point",
                    windows=3):
    """The HEADLINE number: fresh scenes through the DataLoader (host
    preproc + H2D + unpack fused into the scanned multi-step).  Runs FIRST
    so one fresh compile of the multi-step program (minutes through a
    remote-tunnel compile service, unbudgetable) cannot starve the
    scoreboard of the one number that matters.  Median of 3 windows:
    dispatch latency through the shared device tunnel wobbles run-to-run,
    and a single window inherits that noise wholesale.  Parameterized so
    the ScanNet section (40k-point scenes, 256 queries) reuses it with
    its own key prefix `kp`."""
    note(f"building {label} model")
    state, run_step, staged, train_step, group_step = build(
        cfg, num_points=num_points)
    note(f"{label} e2e windows (first item compiles the group-step program)")
    ds = SyntheticDataset(
        size=(WARMUP + windows * E2E_ITERS) * SUPER * BATCH, seed=3,
        num_points=num_points, num_semcls=cfg.model.num_semcls,
        num_angle_bin=cfg.model.num_angle_bin,
    )
    loader = make_loader(ds, super_batch=SUPER)
    rates, f_ms, d_ms = time_loader_windows(
        run_step, state, loader, WARMUP, E2E_ITERS, windows, budget,
        scenes_per_item=SUPER * BATCH,
    )
    loader.shutdown()
    e2e, lo, hi = rate_stats(rates)
    extras[f"{kp}_windows"] = len(rates)
    extras[f"{kp}_scenes_per_sec_min"] = round(lo, 3)
    extras[f"{kp}_scenes_per_sec_max"] = round(hi, 3)
    extras[f"{kp}_super_batch"] = SUPER
    extras[f"{kp}_fetch_ms_per_item"] = round(f_ms, 1)
    extras[f"{kp}_dispatch_ms_per_item"] = round(d_ms, 1)
    note(f"{label} e2e {e2e:.1f} scenes/s [{lo:.1f}, {hi:.1f}] "
         f"(fetch {f_ms:.0f}ms disp {d_ms:.0f}ms)")
    return e2e, state, run_step, staged, train_step, group_step


def bench_point_step_only(cfg, state, run_step, staged, train_step, group_step,
                          budget: Budget, extras: dict,
                          num_points=NUM_POINTS, kp="", with_mfu=True):
    """Device-compute ceiling + MFU: ONE staged device-resident group
    buffer, dependency-chained group dispatches — no H2D in the loop, and
    it reuses the exact program the e2e section already compiled (a second
    program would cost ~2 min of standup through the tunnel even on a
    persistent-cache hit).  MFU rides along here (cost analysis of the
    same compiled program) so it can never be the section a cold driver
    run's budget drops."""
    if not budget.allows(120):
        extras[f"skipped_{kp}step_only"] = "budget"
        if with_mfu:
            extras["skipped_mfu"] = "budget"
        return
    note(f"{kp or 'point '}step-only: chained groups on a staged device buffer")
    from ov3det.datasets.loader import pack_batch

    ds = SyntheticDataset(
        size=SUPER * BATCH, seed=7, num_points=num_points,
        num_semcls=cfg.model.num_semcls, num_angle_bin=cfg.model.num_angle_bin,
    )
    bufs, metas = [], None
    for g in range(SUPER):
        items = [ds[g * BATCH + i] for i in range(BATCH)]
        # same q16 codec as the e2e loader so this section REUSES the
        # group-step program the e2e section already compiled
        b, metas = pack_batch(
            {k: np.stack([it[k] for it in items]) for k in items[0]},
            quantize=QUANTIZE,
        )
        bufs.append(b)
    group = (
        jax.device_put(
            np.stack(bufs), jax.sharding.SingleDeviceSharding(jax.devices()[0])
        ),
        metas,
    )
    iters = max(STEP_ITERS // SUPER, 3)
    dt, n = time_loop(run_step, state, [group] * (2 + iters), 2)
    step_only = SUPER * BATCH * n / dt
    extras[f"{kp}step_only_scenes_per_sec"] = round(step_only, 3)
    extras[f"{kp}step_chained_ms"] = round(1e3 * BATCH / step_only, 2)
    note(f"{kp or 'point '}step-only {step_only:.1f} scenes/s")

    if not with_mfu:
        return
    fl = group_flops(group_step, state, group)  # one BATCH-scene sub-step
    if fl > 0:
        flops_per_sec = fl * step_only / BATCH
        extras["step_tflops_est"] = round(fl / 1e12, 3)
        extras["mfu_pct_vs_v5e_bf16_peak"] = round(
            100 * flops_per_sec / V5E_PEAK_FLOPS, 2
        )
        note(f"mfu {extras['mfu_pct_vs_v5e_bf16_peak']:.1f}% "
             f"({extras['step_tflops_est']:.2f} TFLOP/step)")


def _teacher_vars_cached(teacher):
    """Quantized frozen-teacher tree, disk-cached across bench runs.

    The tree is DETERMINISTIC (PRNGKey(0) init + static weight scales +
    synthetic-batch activation calibration, all seeded), but computing it
    costs a 15-25 min width-80 CPU forward on this 1-core host — measured
    as the dominant share of the OV section's standup, and enough by
    itself to bust the driver's 1500 s budget on a bad day.  In
    production the teacher comes from a checkpoint file (a seconds-long
    load, engine/checkpoint.py), so loading the identical tree from disk
    is the realistic standup, not a benchmark shortcut: the measured
    windows are unchanged either way.

    Init + quantize run entirely HOST-side on a cache miss (CPU backend,
    tiny init image — param shapes don't depend on input H/W), so no init
    program is ever compiled through the tunnel and the f32 weights are
    never pulled D2H for quantization.  The one device transfer is the
    quantized int8/bf16 tree riding the first jitted step.
    """
    import pickle

    from ov3det.models.regionclip import RegionCLIPTeacher, quantize_teacher_params

    # v3: round-5 BN-folded dequant tree (quantize_teacher_params folds the
    # frozen BN affine into each QuantConv's scale/bias — v1 trees have the
    # old structure and must not be loaded into the folded module graph)
    # + smooth-content default calibration batch (different a_scales than
    # the v1/v2 uniform-noise calibration)
    cache = os.path.expanduser(
        f"~/.cache/ov3det/teacher_{teacher.compute_dtype}_w{teacher.width}"
        f"_l{'-'.join(map(str, teacher.layers))}_v3.pkl"
    )
    if os.path.exists(cache):
        note(f"teacher tree from cache ({cache})")
        with open(cache, "rb") as f:
            return pickle.load(f)
    note("teacher init + int8 calibration (host CPU; cached for next run)")
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        t_vars = RegionCLIPTeacher().init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3), jnp.float32),
            jnp.zeros((1, 1, 4)),
        )
        t_vars = quantize_teacher_params(
            t_vars, teacher.compute_dtype, teacher=teacher
        )
    t_np = jax.tree_util.tree_map(np.asarray, t_vars)  # numpy: portable pickle
    try:
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        tmp = cache + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(t_np, f, protocol=4)
        os.replace(tmp, cache)
    except OSError as exc:  # cache is best-effort
        note(f"teacher cache write failed: {exc}")
    return t_np


class _ModBankRefDataset:
    """Bench-only BankRefDataset variant: image_ref = idx % n_bank (see
    the n_bank rationale at the call site).  Points/labels stay per-idx
    fresh; only the static canvas rows are shared."""

    def __init__(self, dataset, n_bank: int, key: str = "image"):
        self.dataset, self.n_bank, self.key = dataset, n_bank, key

    def __len__(self):
        return len(self.dataset)

    def __getattr__(self, name):  # delegate metadata attrs like the real one
        return getattr(self.dataset, name)

    def __getitem__(self, idx: int) -> dict:
        d = dict(self.dataset[idx])
        d.pop(self.key)
        d[self.key + "_ref"] = np.int32(idx % self.n_bank)
        return d


def _bank_rows_cached(raw_ds, n: int):
    """Encoded yuv420 bank rows for the bench's synthetic canvases,
    disk-cached across runs (same rationale as _teacher_vars_cached: row
    i is deterministic in (seed, i) — SyntheticOVDataset.get_image seeds
    per index — and the encode costs ~0.2 s/scene on this 1-core host.
    In production the bank ships from preprocessed storage the same way;
    the measured windows are identical either way).  Prefix-extensible:
    a cache written by a larger run serves any smaller one."""
    path = os.path.expanduser(
        f"~/.cache/ov3det/bank_s{raw_ds.seed}"
        f"_{raw_ds.IMG_H}x{raw_ds.IMG_W}_v1.npy")
    rows = None
    if os.path.exists(path):
        try:
            rows = np.load(path)
        except Exception as exc:  # cache is best-effort
            note(f"bank cache read failed: {exc}")
    if rows is not None and rows.shape[0] >= n:
        note(f"bank rows from cache ({path})")
        return rows[:n]
    from ov3det.datasets.loader import _yuv420_encode

    out = [rows[i] if rows is not None and i < rows.shape[0]
           else _yuv420_encode(raw_ds.get_image(i)) for i in range(n)]
    bank = np.stack(out)
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:  # file handle: np.save won't append .npy
            np.save(f, bank)
        os.replace(tmp, path)
    except OSError as exc:  # cache is best-effort
        note(f"bank cache write failed: {exc}")
    return bank


def bench_ov(cfg, per_layer: bool, warmup: int, iters: int, windows: int,
             budget: Budget):
    from dataclasses import replace

    from ov3det.models.regionclip import (
        RegionCLIPTeacher,
        make_teacher_fn,
        quantize_teacher_params,
    )

    ov_cfg = replace(cfg, loss=replace(cfg.loss, alignment_2d_weight=1.0))
    # RN50x4 (width 80, layers (4,6,10,6)); int8 W8A8 trunk = the production
    # frozen-teacher config (measured 1.49-1.72x the bf16 trunk on v5e;
    # region-feature fidelity golden-tested in tests/test_teacher_parity.py)
    teacher = RegionCLIPTeacher(compute_dtype="int8")
    t_vars = _teacher_vars_cached(teacher)
    teacher_fn = make_teacher_fn(teacher, per_layer=per_layer)

    raw_ds = SyntheticOVDataset(
        size=(warmup + windows * iters) * OV_SUPER * BATCH, seed=5,
        num_points=NUM_POINTS, num_semcls=cfg.model.num_semcls,
        num_angle_bin=cfg.model.num_angle_bin,
    )
    # Device-resident image bank (the production --image_bank path,
    # datasets/image_bank.py): the canvas is STATIC per scene — real
    # training re-reads the same jpg for 1080 epochs — so it is uploaded
    # ONCE at standup (like the teacher weights) and each step gathers +
    # decodes its rows on device.  The measured windows then carry only
    # the per-step-fresh data (augmented q16 points + labels, ~8 MB/group
    # vs ~23 MB with inline canvases) — the image put that serialized
    # against compute on this tunnel (round-4 congested windows) is gone
    # from the steady-state loop.  Standup cost: one yuv encode per scene
    # + one bulk put, amortized over every epoch of a real run.
    # Bank rows for N_BANK distinct canvases; scenes beyond that reuse rows
    # modulo N_BANK.  Per-STEP cost is independent of bank row count (each
    # step gathers exactly B rows from HBM whatever the bank holds), so the
    # measured windows are unchanged — but the one-time standup put drops
    # 820 -> ~150 MB, which matters on this tunnel: an 820 MB put was
    # observed to stall for 15+ min under congestion (2026-08-20), and the
    # driver's budgeted scoreboard run must not inherit that risk.  A real
    # deployment uploads its full distinct-canvas bank once per JOB (3 GB
    # for SUN RGB-D train), amortized over days — not once per 90 s bench.
    n_bank = min(len(raw_ds), 256)
    note(f"building device image bank ({n_bank} canvases, "
         f"{len(raw_ds)} scenes)")
    rows = _bank_rows_cached(raw_ds, n_bank)
    bank = jax.device_put(
        rows, jax.sharding.SingleDeviceSharding(jax.devices()[0]))
    jax.block_until_ready(bank)
    bank_hw = (int(raw_ds.IMG_H), int(raw_ds.IMG_W))
    ds = _ModBankRefDataset(raw_ds, n_bank)
    state, run_step, _, _, _ = build(
        ov_cfg, teacher_fn=teacher_fn, teacher_vars=t_vars,
        image_bank=bank, image_bank_hw=bank_hw)

    loader = make_loader(ds, super_batch=OV_SUPER, quantize=OV_QUANTIZE)
    rates, f_ms, d_ms = time_loader_windows(
        run_step, state, loader, warmup, iters, windows, budget,
        scenes_per_item=OV_SUPER * BATCH,
    )
    loader.shutdown()
    rate, lo, hi = rate_stats(rates)
    note(f"ov{'-per-layer' if per_layer else ''} {rate:.2f} scenes/s "
         f"[{lo:.2f}, {hi:.2f}] (fetch {f_ms:.0f}ms disp {d_ms:.0f}ms)")

    step_only = None
    if not per_layer and budget.allows(120):
        # device-compute ceiling for the OV step: ONE staged group buffer,
        # chained dispatches, zero H2D in the loop — REUSES the exact
        # program the e2e windows compiled (same metas), so this adds no
        # standup cost.  Records what the compute path delivers with the
        # transport fully out of the picture.
        from ov3det.datasets.loader import pack_batch

        note("ov step-only: chained groups on a staged device buffer")
        bufs, metas = [], None
        for g in range(OV_SUPER):
            items = [ds[g * BATCH + i] for i in range(BATCH)]
            b, metas = pack_batch(
                {k: np.stack([it[k] for it in items]) for k in items[0]},
                quantize=OV_QUANTIZE,
            )
            bufs.append(b)
        group = (
            jax.device_put(
                np.stack(bufs),
                jax.sharding.SingleDeviceSharding(jax.devices()[0]),
            ),
            metas,
        )
        dt, n = time_loop(run_step, state, [group] * (1 + max(OV_ITERS, 3)), 1)
        step_only = OV_SUPER * BATCH * n / dt
        note(f"ov step-only {step_only:.1f} scenes/s")
    return (rate, lo, hi), f_ms, d_ms, step_only


def check_backend(timeout_s: float = 240.0) -> bool:
    """Probe device init with a deadline: the remote-tunnel backend can be
    down for hours (init hangs or raises UNAVAILABLE), and a silent hang
    here would eat the whole driver timeout and leave NO output at all.
    On failure, emit an explicit error JSON line and return False."""
    import threading

    got = {}

    def probe():
        try:
            got["devices"] = jax.devices()
        except Exception as exc:  # backend raised (e.g. UNAVAILABLE)
            got["error"] = f"{type(exc).__name__}: {exc}"[:300]

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if "devices" in got:
        return True
    err = got.get("error", f"device init still hanging after {timeout_s:.0f}s")
    emit({
        "metric": "train_scenes_per_sec_per_chip_sunrgbd_e2e",
        "value": None,
        "unit": "scenes/sec/chip",
        "vs_baseline": None,
        "error": f"accelerator backend unavailable: {err}",
    })
    note(f"backend unavailable: {err}")
    return False


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", nargs="?", default="all",
                    choices=["all", "point", "ov", "scannet"])
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", 1500)),
                    help="total wall-clock budget in seconds")
    ap.add_argument("--per-layer", action="store_true",
                    help="also bench the reference-parity x8 per-layer "
                    "teacher mode (expensive; opt-in)")
    args = ap.parse_args()
    budget = Budget(args.budget)
    if not check_backend():
        return
    cfg = sunrgbd_quick()

    extras = {}
    e2e = point_ctx = None
    if args.mode in ("all", "point"):
        e2e, *point_ctx = retry_transient(
            lambda: bench_point_e2e(cfg, budget, extras), budget, "point")
    result = {
        "metric": "train_scenes_per_sec_per_chip_sunrgbd_e2e",
        "value": round(e2e, 3) if e2e is not None else None,
        "unit": "scenes/sec/chip",
        "vs_baseline": round(e2e / REFERENCE_SCENES_PER_SEC, 3)
        if e2e is not None
        else None,
        **extras,
    }
    emit(result)  # headline lands NOW; later sections only improve on it

    if point_ctx is not None:
        # step-only ceiling + MFU (cost analysis of the same program) ride
        # together: both are near-zero marginal cost after the e2e section
        bench_point_step_only(cfg, *point_ctx, budget, result)
        emit(result)

    _run_ov_sections(args, cfg, budget, result)
    _run_scannet_section(args, budget, result)

    note(f"done in {time.perf_counter() - _T0:.0f}s")


def _run_scannet_section(args, budget, result):
    """ScanNet parity config (BASELINE.json config #2): scannet_quick
    shapes — 40k-point scenes, 256 queries, 18 classes, giou_weight 1
    (reference scripts/scannet_quick.sh) — e2e + step-only.  A materially
    different program from the SUN RGB-D one (40k->2048 pre-encoder, 2x
    the queries through the decoder/matcher/criterion), so it gets its own
    compile; runs LAST and budget-guarded so a cold standup can only cost
    this section, never the headline."""
    if args.mode not in ("all", "scannet"):
        return
    if not budget.allows(240):
        result["skipped_scannet"] = "budget"
        emit(result)
        return
    from ov3det.config import scannet_quick

    try:
        cfg = scannet_quick()
        extras = {}
        e2e, *ctx = retry_transient(
            lambda: bench_point_e2e(
                cfg, budget, extras, num_points=SCANNET_NUM_POINTS,
                kp="scannet", label="scannet",
            ), budget, "scannet")
        result["scannet_scenes_per_sec"] = round(e2e, 3)
        result["scannet_vs_baseline"] = round(e2e / REFERENCE_SCENES_PER_SEC, 3)
        result.update(extras)
        bench_point_step_only(
            cfg, *ctx, budget, result, num_points=SCANNET_NUM_POINTS,
            kp="scannet_", with_mfu=False,
        )
        if "scannet_step_only_scenes_per_sec" in result:
            result["scannet_step_only_vs_baseline"] = round(
                result["scannet_step_only_scenes_per_sec"]
                / REFERENCE_SCENES_PER_SEC, 3,
            )
    except Exception as exc:  # pragma: no cover - keep earlier sections alive
        result["scannet_error"] = f"{type(exc).__name__}: {exc}"[:600]
    emit(result)


def _run_ov_sections(args, cfg, budget, result):
    if args.mode in ("all", "ov"):
        # teacher init + OV multi-step standup: ~4-6 min warm-cache
        if not budget.allows(300):
            result["skipped_ov"] = "budget"
            emit(result)
            return
        try:
            # 5 windows (vs point's 3): tunnel congestion hits single
            # windows hard (round 4 measured 33/33/68 within one run, pre
            # image-bank) — a 5-window median rides out one bad window at
            # ~10 s of warm-cache cost; the budget guard stops early if cold
            (rate, lo, hi), f_ms, d_ms, ov_so = retry_transient(
                lambda: bench_ov(cfg, False, OV_WARMUP, OV_ITERS, 5, budget),
                budget, "ov")
            result["ov_scenes_per_sec"] = round(rate, 3)
            result["ov_scenes_per_sec_min"] = round(lo, 3)
            result["ov_scenes_per_sec_max"] = round(hi, 3)
            result["ov_vs_baseline"] = round(rate / REFERENCE_SCENES_PER_SEC, 3)
            result["ov_super_batch"] = OV_SUPER
            result["ov_fetch_ms_per_item"] = round(f_ms, 1)
            result["ov_dispatch_ms_per_item"] = round(d_ms, 1)
            if ov_so is not None:
                result["ov_step_only_scenes_per_sec"] = round(ov_so, 3)
                result["ov_step_only_vs_baseline"] = round(
                    ov_so / REFERENCE_SCENES_PER_SEC, 3
                )
        except Exception as exc:  # pragma: no cover - keep the headline alive
            result["ov_error"] = f"{type(exc).__name__}: {exc}"[:600]
        emit(result)

        if args.per_layer:
            if not budget.allows(120):
                result["skipped_ov_per_layer"] = "budget"
            else:
                try:
                    (rate, _, _), _, _, _ = bench_ov(cfg, True, 1, OV_PL_ITERS, 1,
                                                     budget)
                    result["ov_per_layer_scenes_per_sec"] = round(rate, 3)
                except Exception as exc:  # pragma: no cover
                    result["ov_per_layer_error"] = f"{type(exc).__name__}: {exc}"[:600]
            emit(result)


if __name__ == "__main__":
    main()
