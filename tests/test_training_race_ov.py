"""ov3det-internal training races: configuration-equivalence evidence.

Two claims the flagship OV benchmark rests on are converted from
assumption to measurement here, both by racing two ov3det trainings from
the SAME init over the SAME batch sequence and comparing where they land:

1. **Hoisted vs per-layer teacher** (reference criterion.py:434-442 reruns
   the frozen RegionCLIP teacher on every aux decoder layer's boxes; the
   flagship config hoists ONE teacher call on the final layer's boxes and
   broadcasts the features to all aux losses, losses/criterion.py).  The
   race asserts the hoisted mode trains to the same place as the
   reference-parity per-layer mode.

2. **q16 point codec** (bench.py ships point clouds as uint16 on the H2D
   path, datasets/loader.py codec — ~0.1 mm quantization noise).  The race
   asserts training on q16-roundtripped points lands where training on
   pristine f32 points does, making the benched configuration's codec part
   of the parity story rather than a silent divergence.

Both races use a tiny model + tiny-width RegionCLIP teacher (converter
paths and training dynamics are identical to full scale; channel width
only changes arithmetic cost) and finish with (a) a smoothed-final-loss
agreement bound and (b) an AP@0.25 probe on held-out synthetic scenes.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ov3det.config import (
    DecoderConfig,
    EncoderConfig,
    LossConfig,
    MatcherConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from ov3det.datasets import SyntheticDataset
from ov3det.engine import build_training
from ov3det.eval.ap_calculator import APCalculator
from ov3det.models import Model3DETR
from ov3det.models.regionclip import RegionCLIPTeacher, make_teacher_fn

NCLS, NBIN = 6, 12
BATCH, NPOINTS, NQUERIES, PREENC = 2, 512, 16, 64
ITERS_PER_EPOCH, MAX_EPOCH = 8, 24  # 192 steps
STEPS = ITERS_PER_EPOCH * MAX_EPOCH
EMBED = 32
IMG_H, IMG_W = 64, 96

_RTILT = np.array(
    [[0.999, 0.02, -0.04], [-0.02, 0.999, 0.01], [0.04, -0.01, 0.999]],
    np.float32,
)
_K = np.array([[52.0, 0, IMG_W / 2], [0, 52.0, IMG_H / 2], [0, 0, 1]], np.float32)


def _cfg(per_layer: bool = False, alignment: float = 1.0) -> TrainConfig:
    return TrainConfig(
        model=ModelConfig(
            encoder=EncoderConfig(kind="vanilla", num_layers=1, dim=32,
                                  ffn_dim=32, num_heads=4, dropout=0.0),
            decoder=DecoderConfig(num_layers=3, dim=32, ffn_dim=32,
                                  num_heads=4, dropout=0.0),
            preenc_npoints=PREENC,
            preenc_mlp=(16, 32, 32),
            num_queries=NQUERIES,
            mlp_dropout=0.0,
            num_semcls=NCLS,
            num_angle_bin=NBIN,
            clip_embed_dim=EMBED,
            fps_shards=1,
            query_fps_shards=1,
            ball_query_method="first_k",
        ),
        loss=LossConfig(
            matcher=MatcherConfig(cost_class=1.0, cost_objectness=5.0,
                                  cost_center=5.0, cost_giou=3.0),
            giou_weight=0.0,
            alignment_2d_weight=alignment,
            teacher_per_layer=per_layer,
        ),
        optim=OptimConfig(),
        max_epoch=MAX_EPOCH,
    )


def _smooth_images(rng, B):
    """Chroma-smooth canvases (low-frequency base + luma detail) — the
    content class real 4:2:0 camera JPEGs carry, and the yuv420 codec's
    stated contract (datasets/loader.py codec notes)."""
    from ov3det.models.regionclip import _bilinear_upsample_np

    low = rng.uniform(30, 225, size=(B, IMG_H // 8, IMG_W // 8, 3))
    base = np.stack(
        [_bilinear_upsample_np(low[b], IMG_H, IMG_W) for b in range(B)]
    )
    luma = rng.uniform(-30, 30, size=(B, IMG_H, IMG_W, 1))
    return np.clip(base + luma, 0, 255).astype(np.uint8)


def _ov_batches(num: int, seed: int, smooth: bool = False):
    """Point batches + image/calib fields in the SUN RGB-D OV schema."""
    ds = SyntheticDataset(size=num * BATCH, seed=seed, num_points=NPOINTS,
                          num_semcls=NCLS, num_angle_bin=NBIN)
    batches = []
    for k in range(num):
        items = [ds[k * BATCH + i] for i in range(BATCH)]
        b = {key: np.stack([it[key] for it in items]) for key in items[0]}
        rng = np.random.default_rng(seed * 31 + k)
        b["image"] = _smooth_images(rng, BATCH) if smooth else rng.integers(
            0, 256, size=(BATCH, IMG_H, IMG_W, 3), dtype=np.uint8
        )
        b["image_height"] = np.full((BATCH,), IMG_H, np.int32)
        b["image_width"] = np.full((BATCH,), IMG_W, np.int32)
        b["calib_Rtilt"] = np.tile(_RTILT, (BATCH, 1, 1))
        b["calib_K"] = np.tile(_K, (BATCH, 1, 1))
        batches.append(jax.tree_util.tree_map(jnp.asarray, b))
    return batches


def _tiny_teacher():
    teacher_kw = dict(width=16, layers=(1, 1, 1, 1), embed_dim=EMBED,
                      pooler_resolution=6, image_resolution=IMG_H)
    t_vars = RegionCLIPTeacher(**teacher_kw).init(
        jax.random.PRNGKey(7),
        jnp.zeros((1, IMG_H, IMG_W, 3), jnp.float32),
        jnp.zeros((1, 1, 4)),
    )
    return teacher_kw, t_vars


def _train(cfg, batches, teacher_fn, t_vars, init_state=None):
    model = Model3DETR(cfg.model)
    inputs = {k: batches[0][k] for k in
              ("point_clouds", "point_cloud_dims_min", "point_cloud_dims_max")}
    state, train_step, eval_step, _ = build_training(
        cfg, model, inputs, iters_per_epoch=ITERS_PER_EPOCH,
        rng=jax.random.PRNGKey(0), teacher_fn=teacher_fn, teacher_vars=t_vars,
    )
    if init_state is not None:  # same init across racers
        state = state.replace(params=init_state["params"],
                              batch_stats=init_state["batch_stats"])
    snap = {"params": state.params, "batch_stats": state.batch_stats}
    losses, det_losses = [], []
    for s in range(STEPS):
        state, metrics = train_step(
            state, batches[s % len(batches)], jax.random.PRNGKey(s)
        )
        losses.append(float(metrics["loss"]))
        # detection-only total: the 2D-alignment term's TARGETS differ
        # mechanically between hoisted and per-layer teacher modes (aux
        # layers get features from different boxes), so the equivalence
        # claim is about the detection losses + AP, not the raw total
        # (alignment_2d_weight is 1.0 here, so the logged per-layer values
        # are exactly the total's alignment contribution)
        align = sum(float(v) for k, v in metrics.items()
                    if k.startswith("loss_2dalignment"))
        det_losses.append(float(metrics["loss"]) - align)
    return (losses, det_losses), state, eval_step, snap


def _ap25(eval_step, state, probe_batches) -> float:
    ap = APCalculator(ap_iou_thresh=[0.25], exact_eval=False,
                      dataset_config=type("C", (), {"num_semcls": NCLS})())
    for b in probe_batches:
        out = eval_step(state, b)
        ap.step_meter(out, b)
    metrics = ap.compute_metrics()
    return float(metrics[0.25]["mAP"])


@pytest.mark.slow
def test_hoisted_vs_per_layer_teacher_race():
    """The flagship's one-teacher-call hoisting must train like the
    reference's per-aux-layer teacher recomputation (criterion.py:434-442).
    Same init, same batches, same tiny teacher — the ONLY difference is
    which boxes the distillation features come from."""
    batches = _ov_batches(ITERS_PER_EPOCH, seed=3)
    probe = _ov_batches(2, seed=101)
    teacher_kw, t_vars = _tiny_teacher()

    hoisted_fn = make_teacher_fn(RegionCLIPTeacher(**teacher_kw), per_layer=False)
    (h_losses, h_det), h_state, h_eval, snap = _train(
        _cfg(per_layer=False), batches, hoisted_fn, t_vars)

    per_layer_fn = make_teacher_fn(RegionCLIPTeacher(**teacher_kw), per_layer=True)
    (p_losses, p_det), p_state, p_eval, _ = _train(
        _cfg(per_layer=True), batches, per_layer_fn, t_vars, init_state=snap)

    # identical init => step-0 losses agree except the aux layers'
    # distillation targets (different boxes -> different cosine targets);
    # loose bound just pins gross wiring errors
    np.testing.assert_allclose(h_losses[0], p_losses[0], rtol=0.2)
    h_final = float(np.mean(h_losses[-24:]))
    p_final = float(np.mean(p_losses[-24:]))
    assert h_final < 0.8 * h_losses[0], (h_losses[0], h_final)
    assert p_final < 0.8 * p_losses[0], (p_losses[0], p_final)
    # the central flagship optimization: hoisting trains the DETECTOR to the
    # same place.  (The raw totals differ by construction: each mode's
    # alignment term chases different per-aux-layer targets, and with a
    # random tiny teacher that target noise never fits — comparing it would
    # race the noise floors, not the training.)
    h_det_final = float(np.mean(h_det[-24:]))
    p_det_final = float(np.mean(p_det[-24:]))
    assert abs(h_det_final - p_det_final) <= 0.10 * p_det_final, (
        h_det_final, p_det_final)

    h_ap = _ap25(h_eval, h_state, probe)
    p_ap = _ap25(p_eval, p_state, probe)
    assert abs(h_ap - p_ap) <= 0.15, (h_ap, p_ap)


@pytest.mark.slow
def test_q16_codec_training_neutral():
    """Training on q16-roundtripped point clouds (the benched H2D codec,
    bench.py QUANTIZE) must land where pristine-f32 training lands."""
    from ov3det.datasets.loader import pack_batch, unpack_batch

    batches = _ov_batches(ITERS_PER_EPOCH, seed=3)
    probe = _ov_batches(2, seed=101)
    teacher_kw, t_vars = _tiny_teacher()

    def q16_roundtrip(b):
        np_b = {k: np.asarray(v) for k, v in b.items()}
        buf, metas = pack_batch(np_b, quantize=("point_clouds",))
        rt = unpack_batch(jnp.asarray(buf), metas)
        assert rt["point_clouds"].dtype == jnp.float32
        err = float(jnp.max(jnp.abs(rt["point_clouds"] - b["point_clouds"])))
        assert 0 < err < 2e-3  # codec engaged, sub-mm noise
        out = dict(b)
        out["point_clouds"] = rt["point_clouds"]
        return out

    teacher_fn = make_teacher_fn(RegionCLIPTeacher(**teacher_kw))
    (f_losses, f_det), f_state, f_eval, snap = _train(
        _cfg(), batches, teacher_fn, t_vars)
    (q_losses, q_det), q_state, q_eval, _ = _train(
        _cfg(), [q16_roundtrip(b) for b in batches], teacher_fn, t_vars,
        init_state=snap)

    np.testing.assert_allclose(q_losses[0], f_losses[0], rtol=5e-2)
    f_final = float(np.mean(f_losses[-24:]))
    q_final = float(np.mean(q_losses[-24:]))
    assert f_final < 0.8 * f_losses[0]
    assert q_final < 0.8 * q_losses[0]
    # detection components must land together; the alignment term's noise
    # floor (random tiny teacher, unfittable targets) dominates the total
    # and wanders ~10% between any two runs of this tiny chaotic setup, so
    # the total gets a correspondingly looser bound
    f_det_final = float(np.mean(f_det[-24:]))
    q_det_final = float(np.mean(q_det[-24:]))
    assert abs(q_det_final - f_det_final) <= 0.10 * f_det_final, (
        q_det_final, f_det_final)
    assert abs(q_final - f_final) <= 0.20 * f_final, (q_final, f_final)

    f_ap = _ap25(f_eval, f_state, probe)
    q_ap = _ap25(q_eval, q_state, probe)
    assert abs(f_ap - q_ap) <= 0.15, (f_ap, q_ap)


@pytest.mark.slow
def test_yuv420_codec_training_neutral():
    """Training THROUGH yuv420-roundtripped canvases (the benched image
    codec, bench.py OV_QUANTIZE, and the device image bank's storage
    format) must land where training on pristine RGB canvases lands.
    Completes the benched config's codec evidence: q16 (points) is raced
    above; this races the image leg end-to-end through the teacher +
    2D-alignment loss, not just the teacher-feature cosine
    (tests/test_teacher_parity.py).  Canvases are chroma-smooth — the
    content class the codec is contracted for (SUN RGB-D sources are
    4:2:0 JPEGs; reference datasets/sunrgbd.py:281-292 decodes them, so
    the chroma detail yuv420 drops was never in the source files)."""
    from ov3det.datasets.loader import pack_batch, unpack_batch

    batches = _ov_batches(ITERS_PER_EPOCH, seed=5, smooth=True)
    probe = _ov_batches(2, seed=103, smooth=True)
    teacher_kw, t_vars = _tiny_teacher()

    def yuv_roundtrip(b):
        np_b = {k: np.asarray(v) for k, v in b.items()}
        buf, metas = pack_batch(np_b, quantize=("image",))
        rt = unpack_batch(jnp.asarray(buf), metas)
        assert rt["image"].dtype == jnp.uint8
        err = np.abs(np.asarray(rt["image"], np.int32)
                     - np_b["image"].astype(np.int32))
        # codec engaged (chroma subsampling is lossy) but bounded on the
        # smooth content class it is contracted for (measured here: mean
        # ~3.5/255, max ~23/255 — the 2x2 chroma average across the base's
        # 8-px-period gradient; luma-only detail rides Y exactly)
        assert 0 < err.max() <= 32 and err.mean() < 6.0, (
            err.max(), err.mean())
        out = dict(b)
        out["image"] = rt["image"]
        return out

    teacher_fn = make_teacher_fn(RegionCLIPTeacher(**teacher_kw))
    (f_losses, f_det), f_state, f_eval, snap = _train(
        _cfg(), batches, teacher_fn, t_vars)
    (y_losses, y_det), y_state, y_eval, _ = _train(
        _cfg(), [yuv_roundtrip(b) for b in batches], teacher_fn, t_vars,
        init_state=snap)

    np.testing.assert_allclose(y_losses[0], f_losses[0], rtol=5e-2)
    f_final = float(np.mean(f_losses[-24:]))
    y_final = float(np.mean(y_losses[-24:]))
    assert f_final < 0.8 * f_losses[0]
    assert y_final < 0.8 * y_losses[0]
    # same bound structure as the q16 race: detection components carry
    # the equivalence claim; the tiny random teacher's alignment noise
    # floor dominates the total
    f_det_final = float(np.mean(f_det[-24:]))
    y_det_final = float(np.mean(y_det[-24:]))
    assert abs(y_det_final - f_det_final) <= 0.10 * f_det_final, (
        y_det_final, f_det_final)
    assert abs(y_final - f_final) <= 0.20 * f_final, (y_final, f_final)

    f_ap = _ap25(f_eval, f_state, probe)
    y_ap = _ap25(y_eval, y_state, probe)
    assert abs(f_ap - y_ap) <= 0.15, (f_ap, y_ap)
