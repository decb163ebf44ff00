"""Prediction parsing: empty-box removal + NMS on device, list assembly on host.

Counterpart of the reference's `parse_predictions`
(reference utils/ap_calculator.py:39-238), which is a pure-numpy per-box
python loop (Delaunay in-hull tests against 20-40k points per box, greedy
NMS in while-loops) and dominates eval wall time.  Here:

  * the "box contains >= 5 points" test is a vectorized half-space check —
    the corners form a box, so Delaunay is overkill (3 dot products per
    point);
  * greedy class-aware 3D NMS runs as a fori_loop on device
    (ov3det.geometry.nms), identical keep-set semantics;
  * only the final ragged per-class proposal assembly happens on the host,
    and as (classes, corners, scores) ARRAYS per scan, not python tuples —
    see assemble_predictions.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ov3det.geometry import flip_axis_to_depth
from ov3det.geometry.nms import nms_3d_class_aware, nms_3d, nms_2d


def points_in_box_counts(points: jnp.ndarray, corners: jnp.ndarray) -> jnp.ndarray:
    """Count scene points inside each predicted box.

    points: (B, N, 3) in upright-depth coords; corners: (B, K, 8, 3) in
    camera coords (the reference flips the box to depth coords then runs
    Delaunay, utils/ap_calculator.py:70-84 + utils/box_util.py:22-31).
    Returns (B, K) int32 counts.
    """
    box_depth = flip_axis_to_depth(corners)  # (B, K, 8, 3)
    origin = box_depth[:, :, 0, :]  # (B, K, 3)
    # the three edges of the box at corner 0 (ordering from the codec)
    e1 = box_depth[:, :, 1, :] - origin
    e2 = box_depth[:, :, 3, :] - origin
    e3 = box_depth[:, :, 4, :] - origin
    edges = jnp.stack([e1, e2, e3], axis=2)  # (B, K, 3, 3)
    sq = jnp.sum(edges**2, axis=-1)  # (B, K, 3)
    rel = points[:, None, :, :] - origin[:, :, None, :]  # (B, K, N, 3)
    proj = jnp.einsum("bkne,bkde->bknd", rel, edges)  # (B, K, N, 3)
    eps = 1e-6
    inside = jnp.all((proj >= -eps) & (proj <= sq[:, :, None, :] + eps), axis=-1)
    return jnp.sum(inside, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("remove_empty_box", "use_3d_nms", "cls_nms", "no_nms"))
def parse_predictions_device(
    box_corners: jnp.ndarray,  # (B, K, 8, 3)
    sem_cls_probs: jnp.ndarray,  # (B, K, C)
    objectness_probs: jnp.ndarray,  # (B, K)
    point_clouds: jnp.ndarray,  # (B, N, >=3)
    nms_iou: float = 0.25,
    remove_empty_box: bool = True,
    use_3d_nms: bool = True,
    cls_nms: bool = True,
    no_nms: bool = False,
):
    """Device part of parse_predictions: returns (pred_mask (B,K) bool,
    pred_sem_cls (B,K) int32).  Mirrors the default VoteNet eval config
    (3D class-aware NMS @0.25, reference utils/ap_calculator.py:241-269)."""
    B, K = objectness_probs.shape
    pred_sem_cls = jnp.argmax(sem_cls_probs, axis=-1).astype(jnp.int32)

    if remove_empty_box:
        counts = points_in_box_counts(point_clouds[..., :3], box_corners)
        nonempty = counts >= 5
        # if every box is empty keep the highest-objectness one
        # (reference utils/ap_calculator.py:82-83)
        none_left = ~jnp.any(nonempty, axis=1, keepdims=True)
        best = jnp.argmax(objectness_probs, axis=1)
        fallback = jax.nn.one_hot(best, K, dtype=bool)
        nonempty = jnp.where(none_left, fallback, nonempty)
    else:
        nonempty = jnp.ones((B, K), bool)

    if no_nms:
        return nonempty, pred_sem_cls

    mins = jnp.min(box_corners, axis=2)  # (B, K, 3)
    maxs = jnp.max(box_corners, axis=2)
    aabb = jnp.concatenate([mins, maxs], axis=-1)  # (B, K, 6)
    if use_3d_nms and cls_nms:
        keep = jax.vmap(lambda b, s, c, v: nms_3d_class_aware(b, s, c, nms_iou, v))(
            aabb, objectness_probs, pred_sem_cls, nonempty
        )
    elif use_3d_nms:
        keep = jax.vmap(lambda b, s, v: nms_3d(b, s, nms_iou, v))(
            aabb, objectness_probs, nonempty
        )
    else:
        bev = jnp.concatenate(
            [mins[..., 0:1], mins[..., 2:3], maxs[..., 0:1], maxs[..., 2:3]], axis=-1
        )
        keep = jax.vmap(lambda b, s, v: nms_2d(b, s, nms_iou, v))(
            bev, objectness_probs, nonempty
        )
    return keep, pred_sem_cls


def assemble_predictions(
    box_corners: np.ndarray,
    sem_cls_probs: np.ndarray,
    objectness_probs: np.ndarray,
    pred_mask: np.ndarray,
    pred_sem_cls: np.ndarray,
    conf_thresh: float = 0.05,
    per_class_proposal: bool = True,
    use_cls_confidence_only: bool = False,
) -> list:
    """Host-side ragged assembly (reference utils/ap_calculator.py:192-238).

    Returns one `(classes (M,), corners (M, 8, 3), scores (M,))` array
    triple per sample — entry m of each array is one detection.  The
    reference (and this file, pre round-5) built M python tuples instead;
    with per_class_proposal M = num_classes x kept (~2.5k/scene on the
    flagship config), and the tuple building alone measured ~20 ms/scene
    of eval wall on the bench host (scripts/eval_timing.py).  The arrays
    keep the exact entry ORDER of the reference's class-major loops (class
    ii outer, kept query j inner), so downstream confidence sorting sees
    identical sequences.
    """
    B, K, C = sem_cls_probs.shape
    batch_pred = []
    for i in range(B):
        keep = (pred_mask[i] == 1) & (objectness_probs[i] > conf_thresh)
        idx = np.where(keep)[0]
        n = idx.shape[0]
        boxes_i = box_corners[i, idx]
        if per_class_proposal:
            # (n, C) confidences; flatten CLASS-MAJOR to mirror the
            # reference's `for ii in range(C): for j in idx` ordering
            conf = sem_cls_probs[i, idx, :] * objectness_probs[i, idx, None]
            batch_pred.append((
                np.repeat(np.arange(C, dtype=np.int64), n),
                np.tile(boxes_i, (C, 1, 1)),
                conf.T.reshape(-1),
            ))
        elif use_cls_confidence_only:
            cls = pred_sem_cls[i, idx].astype(np.int64)
            batch_pred.append((cls, boxes_i, sem_cls_probs[i, idx, cls]))
        else:
            cls = pred_sem_cls[i, idx].astype(np.int64)
            batch_pred.append((cls, boxes_i, objectness_probs[i, idx]))
    return batch_pred
