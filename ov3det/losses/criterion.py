"""Set-prediction criterion: matcher costs + Hungarian + masked losses, in-jit.

Counterpart of the reference's Matcher + SetCriterion (reference
criterion.py:18-443) with three structural changes for TPU:

  * the Hungarian assignment runs on-device (ov3det.ops.auction_lap)
    instead of scipy-on-CPU per sample per iteration (criterion.py:65-86);
  * all decoder layers are processed in ONE batched pass by folding the
    layer axis into the batch for GIoU + matching (the reference re-runs
    the whole criterion — including the frozen 2D teacher — once per aux
    layer, criterion.py:434-442);
  * rotated-vs-axis-aligned GIoU is a STATIC config choice (rotated iff the
    dataset has angle bins) rather than the reference's data-dependent
    `torch.any(angles > 0)` branch (criterion.py:352) — identical outcome
    on both datasets, jit-compatible.

Loss formulas and normalizations match the reference exactly (weighted-mean
semantics of torch F.cross_entropy included); every loss is a masked
fixed-shape reduction.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ov3det.config import LossConfig
from ov3det.geometry import generalized_box3d_iou
from ov3det.ops import auction_lap


def _giou_dtype(cfg):
    return (
        jnp.bfloat16
        if getattr(cfg, "giou_compute_dtype", "float32") == "bfloat16"
        else jnp.float32
    )


def huber_loss(error: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    """reference utils/misc.py:25-36."""
    abs_error = jnp.abs(error)
    quadratic = jnp.minimum(abs_error, delta)
    linear = abs_error - quadratic
    return 0.5 * quadratic**2 + delta * linear


def _weighted_ce(logits, labels, class_weights):
    """Per-layer weighted-mean cross entropy, matching torch F.cross_entropy.

    logits: (L, B, Q, C); labels: (L, B, Q) int; class_weights: (C,).
    torch's weighted 'mean' divides by the sum of the per-sample weights
    (reference criterion.py:171-176), not the element count.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = class_weights[labels]
    return jnp.sum(nll * w, axis=(1, 2)) / jnp.clip(jnp.sum(w, axis=(1, 2)), 1e-8)


def compute_assignments(
    outputs: dict,
    targets: dict,
    cfg: LossConfig,
    rotated_boxes: bool,
):
    """Matcher costs + batched assignment for ALL decoder layers at once.

    outputs: stacked model outputs with leading layer axis L.
    Returns dict with per-layer matching tensors plus cached giou/center
    distance matrices (reused by the losses, as the reference does by
    stuffing them into `outputs`, criterion.py:356-360).
    """
    pred_corners = outputs["box_corners"]  # (L, B, Q, 8, 3)
    L, B, Q = pred_corners.shape[:3]
    gt_corners = targets["gt_box_corners"]  # (B, G, 8, 3)
    G = gt_corners.shape[1]
    nactual = targets["nactual_gt"]  # (B,)

    flat_pred = pred_corners.reshape(L * B, Q, 8, 3)
    flat_gt = jnp.tile(gt_corners, (L, 1, 1, 1))
    flat_n = jnp.tile(nactual, (L,))
    giou_dtype = _giou_dtype(cfg)
    # matcher_giou="axis_aligned": enclosing-AABB GIoU for the cost matrix
    # (BASELINE.md north star; the polygon clip over all LxBxQxG pairs is
    # ~35% of the train step, and the cost's 5x center + 5x objectness
    # terms dominate assignment anyway). The exact rotated value is still
    # used for the GIoU loss on matched pairs (set_criterion below).
    mode = getattr(cfg, "matcher_giou", "rotated")
    assert mode in ("rotated", "axis_aligned"), f"matcher_giou: {mode!r}"
    matcher_rotated = rotated_boxes and mode == "rotated"
    gious = generalized_box3d_iou(
        flat_pred, flat_gt, flat_n, rotated_boxes=matcher_rotated,
        compute_dtype=giou_dtype,
    ).reshape(L, B, Q, G)

    center_dist = jnp.sum(
        jnp.abs(
            outputs["center_normalized"][:, :, :, None, :]
            - targets["gt_box_centers_normalized"][None, :, None, :, :]
        ),
        axis=-1,
    )  # (L, B, Q, G)

    gt_labels = targets["gt_box_sem_cls_label"]  # (B, G)
    # prob-at-gt-class as a one-hot MXU contraction: the equivalent
    # take_along_axis gather over (L,B,Q,G) indices lowers to a ~6ms
    # custom scatter/gather fusion on TPU, the (Q,C)x(C,G) matmul to ~0
    probs = outputs["sem_cls_prob"]  # (L, B, Q, C)
    gt_onehot = jax.nn.one_hot(gt_labels, probs.shape[-1], dtype=probs.dtype)
    cls_prob_at_gt = jnp.einsum(
        "lbqc,bgc->lbqg", probs, gt_onehot, precision=jax.lax.Precision.HIGHEST
    )
    m = cfg.matcher
    cost = (
        m.cost_class * (-cls_prob_at_gt)
        + m.cost_objectness * (-outputs["objectness_prob"][..., None])
        + m.cost_center * center_dist
        + m.cost_giou * (-gious)
    )  # (L, B, Q, G)

    cost = jax.lax.stop_gradient(cost)
    # auction wants (batch, persons=gt, objects=proposals)
    flat_cost = cost.reshape(L * B, Q, G).transpose(0, 2, 1)
    _, obj_assigned, obj2person = auction_lap(flat_cost, flat_n)
    return {
        "per_prop_gt_inds": obj2person.reshape(L, B, Q),
        "proposal_matched_mask": obj_assigned.reshape(L, B, Q),
        "gious": gious,
        "center_dist": center_dist,
    }


def set_criterion(
    outputs: dict,
    targets: dict,
    cfg: LossConfig,
    num_angle_bin: int,
    num_semcls: int,
    teacher_feats: Optional[jnp.ndarray] = None,
    num_boxes_global: Optional[jnp.ndarray] = None,
):
    """Full criterion over stacked layer outputs.

    targets must carry the padded GT dict (synthetic fixture schema).
    teacher_feats: optional (B, Q, C) or (L, B, Q, C) frozen 2D-teacher
    region features for the distillation loss.
    num_boxes_global: cross-replica box count; defaults to the local batch
    sum (under GSPMD jit over a global batch this IS the global count —
    the analogue of the reference's all_reduce at criterion.py:424-425).

    Returns (total_loss, loss_dict). loss_dict has per-layer entries
    `<name>_<l>` for aux layers and bare names for the final layer,
    mirroring the reference's logging schema (criterion.py:440-442).
    """
    nactual = jnp.sum(targets["gt_box_present"], axis=1).astype(jnp.int32)  # (B,)
    targets = dict(targets, nactual_gt=nactual)
    if num_boxes_global is None:
        num_boxes_global = jnp.sum(nactual)
    num_boxes = jnp.clip(num_boxes_global.astype(jnp.float32), 1.0)

    rotated = num_angle_bin > 1
    assign = compute_assignments(outputs, targets, cfg, rotated_boxes=rotated)
    inds = assign["per_prop_gt_inds"]  # (L, B, Q)
    matched = assign["proposal_matched_mask"]  # (L, B, Q)
    L = inds.shape[0]

    losses = {}

    # --- semantic classification (criterion.py:143-178)
    gt_labels = targets["gt_box_sem_cls_label"].astype(jnp.int32)  # (B, G)
    box_label = jnp.take_along_axis(
        jnp.broadcast_to(gt_labels[None], (L,) + gt_labels.shape), inds, axis=-1
    )
    box_label = jnp.where(matched > 0, box_label, num_semcls)
    class_weights = jnp.ones((num_semcls + 1,)).at[-1].set(cfg.no_object_weight)
    losses["loss_sem_cls"] = _weighted_ce(
        outputs["sem_cls_logits"], box_label, class_weights
    )  # (L,)

    # --- angle (criterion.py:180-246)
    gt_angle_cls = targets["gt_angle_class_label"].astype(jnp.int32)
    gt_angle_res_norm = targets["gt_angle_residual_label"] / (
        jnp.pi / num_angle_bin
    )
    angle_cls_at = jnp.take_along_axis(
        jnp.broadcast_to(gt_angle_cls[None], (L,) + gt_angle_cls.shape), inds, -1
    )
    logp = jax.nn.log_softmax(outputs["angle_logits"], axis=-1)
    angle_ce = -jnp.take_along_axis(logp, angle_cls_at[..., None], axis=-1)[..., 0]
    losses["loss_angle_cls"] = jnp.sum(angle_ce * matched, axis=(1, 2)) / num_boxes

    res_at_gt_bin = jnp.take_along_axis(
        outputs["angle_residual_normalized"], angle_cls_at[..., None], axis=-1
    )[..., 0]
    gt_res_at = jnp.take_along_axis(
        jnp.broadcast_to(gt_angle_res_norm[None], (L,) + gt_angle_res_norm.shape),
        inds,
        -1,
    )
    reg = huber_loss(res_at_gt_bin - gt_res_at, delta=1.0)
    losses["loss_angle_reg"] = jnp.sum(reg * matched, axis=(1, 2)) / num_boxes

    # --- center (criterion.py:248-272)
    center_sel = jnp.take_along_axis(assign["center_dist"], inds[..., None], -1)[..., 0]
    losses["loss_center"] = jnp.sum(center_sel * matched, axis=(1, 2)) / num_boxes

    # --- giou (criterion.py:274-296)
    matcher_exact = (not rotated) or getattr(cfg, "matcher_giou", "rotated") == "rotated"
    if matcher_exact or cfg.giou_weight <= 0:
        # the cost matrix already holds the loss-grade values (or the loss
        # is log-only, where the AABB approximation is an accepted proxy)
        giou_sel = jnp.take_along_axis(
            1.0 - assign["gious"], inds[..., None], -1
        )[..., 0]
    else:
        # axis-aligned matcher + active rotated GIoU loss: exact polygon
        # clip on the Q matched pairs per layer only (QxG-fold less work
        # than the reference's full-matrix reuse, criterion.py:356-360)
        gt_corners = targets["gt_box_corners"]  # (B, G, 8, 3)
        gt_at = jnp.take_along_axis(
            jnp.broadcast_to(gt_corners[None], (L,) + gt_corners.shape),
            inds[..., None, None],
            axis=2,
        )  # (L, B, Q, 8, 3)
        pred = outputs["box_corners"]
        P = L * pred.shape[1] * pred.shape[2]
        g = generalized_box3d_iou(
            pred.reshape(P, 1, 8, 3),
            gt_at.reshape(P, 1, 8, 3),
            jnp.ones((P,), jnp.int32),
            rotated_boxes=True,
            compute_dtype=_giou_dtype(cfg),
        )
        giou_sel = 1.0 - g.reshape(L, pred.shape[1], pred.shape[2])
    losses["loss_giou"] = jnp.sum(giou_sel * matched, axis=(1, 2)) / num_boxes

    # --- size (criterion.py:298-337)
    gt_sizes = targets["gt_box_sizes_normalized"]  # (B, G, 3)
    gt_sizes_at = jnp.take_along_axis(
        jnp.broadcast_to(gt_sizes[None], (L,) + gt_sizes.shape),
        inds[..., None],
        axis=2,
    )
    size_l1 = jnp.sum(jnp.abs(outputs["size_normalized"] - gt_sizes_at), axis=-1)
    losses["loss_size"] = jnp.sum(size_l1 * matched, axis=(1, 2)) / num_boxes

    # --- cardinality, log-only (criterion.py:121-130)
    pred_obj = jnp.sum(
        (jnp.argmax(outputs["sem_cls_logits"], -1) != num_semcls).astype(jnp.float32),
        axis=-1,
    )  # (L, B)
    losses["loss_cardinality"] = jax.lax.stop_gradient(
        jnp.mean(jnp.abs(pred_obj - nactual[None].astype(jnp.float32)), axis=-1)
    )

    # --- 2D alignment distillation (criterion.py:132-141)
    if teacher_feats is not None:
        t = teacher_feats if teacher_feats.ndim == 4 else teacher_feats[None]
        v = outputs["visual_embeds"]
        cos = jnp.sum(v * t, -1) / jnp.clip(
            jnp.linalg.norm(v, axis=-1) * jnp.linalg.norm(t, axis=-1), 1e-8
        )
        losses["loss_2dalignment"] = jnp.sum(1.0 - cos, axis=(1, 2))

    weights = {
        "loss_sem_cls": cfg.sem_cls_weight,
        "loss_angle_cls": cfg.angle_cls_weight,
        "loss_angle_reg": cfg.angle_reg_weight,
        "loss_center": cfg.center_weight,
        "loss_size": cfg.size_weight,
        "loss_giou": cfg.giou_weight,
        "loss_2dalignment": cfg.alignment_2d_weight,
    }
    total = jnp.zeros(())
    loss_dict = {}
    for name, per_layer in losses.items():
        w = weights.get(name, 0.0)
        for l in range(L):
            key = name if l == L - 1 else f"{name}_{l}"
            loss_dict[key] = per_layer[l] * (w if w > 0 else 1.0)
        if w > 0:
            total = total + w * jnp.sum(per_layer)
    loss_dict["loss"] = total
    return total, loss_dict
