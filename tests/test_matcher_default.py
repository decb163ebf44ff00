"""Empirical characterization of the matcher_giou="axis_aligned" knob.

The opt-in speed knob computes the matcher COST matrix with enclosing-AABB
GIoU on rotated-box datasets (the exact rotated polygon clip over all
LxBxQxG pairs is ~35% of the step).  This file measures what the
approximation actually does on rotated synthetic scenes:

  1. assignment agreement between the axis-aligned and exact rotated cost
     on a fixed probe batch stays high at every training stage — the
     approximation almost never flips an assignment pointwise;
  2. and yet the small per-step assignment differences COMPOUND over
     training: the rotated matcher consistently trains to higher AP
     (measured here 0.222 vs 0.097 after 300 steps; a 2-seed probe with 10
     eval batches measured 0.123-0.126 vs 0.091-0.099).  That compounding
     is why the shipped default is "rotated" (reference parity,
     criterion.py:348-361) and axis_aligned is an opt-in speed knob.
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
    replace,
)
from ov3det.datasets import make_batch
from ov3det.engine import build_training
from ov3det.eval import APCalculator
from ov3det.losses.criterion import compute_assignments
from ov3det.models import Model3DETR

NPTS, NPRE, Q, NCLS, NBIN = 768, 128, 32, 3, 12


def make_cfg(matcher_giou: str) -> TrainConfig:
    return TrainConfig(
        model=ModelConfig(
            encoder=EncoderConfig(num_layers=2, dim=64, ffn_dim=64,
                                  masking_radius=(0.16, 0.64)),
            decoder=DecoderConfig(num_layers=2, dim=64, ffn_dim=64),
            preenc_npoints=NPRE,
            num_queries=Q,
            preenc_mlp=(32, 64, 64),
            num_semcls=NCLS,
            num_angle_bin=NBIN,
            clip_embed_dim=64,
            mlp_dropout=0.0,
        ),
        # the SUN RGB-D scripts' cost mix (reference scripts/sunrgbd_*.sh):
        # class 1, giou 3, center 5, objectness 5
        loss=LossConfig(
            matcher=MatcherConfig(cost_class=1, cost_objectness=5, cost_center=5,
                                  cost_giou=3),
            giou_weight=0.0,
            center_weight=5.0,
            angle_cls_weight=0.1,
            angle_reg_weight=0.5,
            matcher_giou=matcher_giou,
            giou_compute_dtype="float32",
        ),
        optim=OptimConfig(base_lr=1.5e-3, warm_lr_epochs=1, clip_gradient=0.1),
        max_epoch=10,
    )


def sample_batch(seed):
    rng = np.random.default_rng(seed)
    b = make_batch(rng, batch_size=4, num_points=NPTS, num_semcls=NCLS,
                   num_angle_bin=NBIN, num_boxes=3)
    return {k: jnp.asarray(v) for k, v in b.items()}


def agreement(outputs, batch, cfg_loss) -> float:
    """Fraction of matched proposal slots where both matcher flavors pick
    the same GT (slots matched under either flavor count)."""
    targets = dict(batch)
    targets["nactual_gt"] = jnp.sum(batch["gt_box_present"], axis=1).astype(jnp.int32)
    res = {}
    for mode in ("axis_aligned", "rotated"):
        a = compute_assignments(
            outputs, targets, replace(cfg_loss, matcher_giou=mode),
            rotated_boxes=True,
        )
        res[mode] = (
            np.asarray(a["proposal_matched_mask"]),
            np.asarray(a["per_prop_gt_inds"]),
        )
    m_a, i_a = res["axis_aligned"]
    m_r, i_r = res["rotated"]
    either = (m_a > 0) | (m_r > 0)
    same = (m_a == m_r) & (i_a == i_r)
    return float(same[either].sum() / max(either.sum(), 1))


@pytest.mark.slow
def test_axis_aligned_matcher_knob_characterization():
    cfg = make_cfg("axis_aligned")
    model = Model3DETR(cfg.model)
    batch0 = sample_batch(0)
    inputs = {k: batch0[k] for k in
              ("point_clouds", "point_cloud_dims_min", "point_cloud_dims_max")}

    def train(cfg, steps, probe_steps=()):
        state, train_step, eval_step, _ = build_training(
            cfg, model, inputs, iters_per_epoch=40, rng=jax.random.PRNGKey(0)
        )
        fwd = jax.jit(lambda s, b: model.apply(
            {"params": s.params, "batch_stats": s.batch_stats, "frozen": s.frozen},
            {k: b[k] for k in ("point_clouds", "point_cloud_dims_min",
                               "point_cloud_dims_max")},
            train=False,
        ))
        agreements = {}
        for step in range(steps):
            if step in probe_steps:
                probe = sample_batch(1000)
                agreements[step] = agreement(fwd(state, probe), probe, cfg.loss)
            state, _ = train_step(state, sample_batch(step % 25),
                                  jax.random.PRNGKey(step))
        return state, eval_step, agreements

    def measure_ap(state, eval_step, seeds):
        calc = APCalculator(ap_iou_thresh=[0.25], exact_eval=False,
                            dataset_config=type("C", (), {"num_semcls": NCLS})())
        for s in seeds:
            b = sample_batch(s)
            calc.step_meter(eval_step(state, b), b)
        return calc.compute_metrics()[0.25]["mAP"]

    steps = 300
    state0, eval0, _ = train(cfg, 0)
    ap_before = measure_ap(state0, eval0, [100, 101])

    state_a, eval_a, agr = train(cfg, steps, probe_steps=(0, 100, 299))
    # 1. pointwise assignment agreement stays high at every training stage
    # (measured 1.00 at init/mid/late on this scenario)
    assert all(v >= 0.85 for v in agr.values()), agr
    ap_a = measure_ap(state_a, eval_a, [100, 101])

    # 2. both settings learn, and the exact rotated matcher trains at least
    # as well — the rare per-step assignment flips compound in its favor
    # (measured 0.222 rotated vs 0.097 axis_aligned here), hence the
    # "rotated" default
    state_r, eval_r, _ = train(make_cfg("rotated"), steps)
    ap_r = measure_ap(state_r, eval_r, [100, 101])
    print(f"agreement by stage: {agr}; AP untrained {ap_before:.3f}, "
          f"axis_aligned {ap_a:.3f}, rotated {ap_r:.3f}")
    assert ap_a > ap_before + 0.02, (ap_before, ap_a)  # actually learned
    assert ap_r >= ap_a - 0.02, (ap_a, ap_r)
