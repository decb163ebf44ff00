"""Greedy non-maximum suppression as fixed-shape on-device ops.

The reference runs NMS in numpy while-loops on the host during every eval
batch (reference utils/nms.py:43-162, called from utils/ap_calculator.py:86-190).
Here greedy NMS is a `lax.fori_loop` over a precomputed pairwise-overlap
matrix, vmappable over the batch and jit-compatible: the selection order and
suppression rule match the reference exactly (descending score, suppress
IoU > threshold), so keep-sets are identical up to score ties.

All functions return a boolean keep mask of shape (K,) (or (B, K) when
batched via vmap) instead of a dynamic index list.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _aabb_overlap_matrix(mins: jnp.ndarray, maxs: jnp.ndarray, old_type: bool) -> jnp.ndarray:
    """Pairwise overlap of axis-aligned boxes given (K, D) mins/maxs."""
    inter = jnp.clip(
        jnp.minimum(maxs[:, None, :], maxs[None, :, :])
        - jnp.maximum(mins[:, None, :], mins[None, :, :]),
        0.0,
    )
    inter_vol = jnp.prod(inter, axis=-1)
    vol = jnp.prod(maxs - mins, axis=-1)
    if old_type:
        # legacy VoteNet "old type": intersection over the *other* box's volume
        # (reference utils/nms.py:107-108)
        return inter_vol / jnp.clip(vol[None, :], 1e-12)
    union = vol[:, None] + vol[None, :] - inter_vol
    return inter_vol / jnp.clip(union, 1e-12)


def _greedy_suppress(
    overlap: jnp.ndarray, scores: jnp.ndarray, threshold: float, valid: jnp.ndarray
) -> jnp.ndarray:
    """Greedy descending-score NMS over a (K, K) overlap matrix.

    valid: (K,) mask of candidate boxes (invalid boxes are never kept).
    Returns (K,) bool keep mask.
    """
    K = scores.shape[0]

    def body(_, state):
        keep, alive = state
        masked = jnp.where(alive, scores, _NEG_INF)
        i = jnp.argmax(masked)
        has_candidate = masked[i] > _NEG_INF / 2
        keep = keep.at[i].set(jnp.where(has_candidate, True, keep[i]))
        suppress = (overlap[i] > threshold) & has_candidate
        alive = alive & ~suppress
        alive = alive.at[i].set(False)
        return keep, alive

    keep0 = jnp.zeros((K,), bool)
    keep, _ = jax.lax.fori_loop(0, K, body, (keep0, valid))
    return keep


def nms_3d(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    threshold: float,
    valid: jnp.ndarray | None = None,
    old_type: bool = False,
) -> jnp.ndarray:
    """3D AABB NMS. boxes: (K, 6) [xmin,ymin,zmin,xmax,ymax,zmax]; scores (K,).

    Parity target: reference utils/nms.py:79-117 (nms_3d_faster).
    """
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    overlap = _aabb_overlap_matrix(boxes[:, 0:3], boxes[:, 3:6], old_type)
    return _greedy_suppress(overlap, scores, threshold, valid)


def nms_3d_class_aware(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    threshold: float,
    valid: jnp.ndarray | None = None,
    old_type: bool = False,
) -> jnp.ndarray:
    """Class-aware 3D NMS: only boxes of the same class suppress each other.

    Parity target: reference utils/nms.py:120-162 (nms_3d_faster_samecls).
    """
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    overlap = _aabb_overlap_matrix(boxes[:, 0:3], boxes[:, 3:6], old_type)
    same_cls = classes[:, None] == classes[None, :]
    return _greedy_suppress(overlap * same_cls, scores, threshold, valid)


def nms_2d(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    threshold: float,
    valid: jnp.ndarray | None = None,
    old_type: bool = False,
) -> jnp.ndarray:
    """2D AABB NMS. boxes: (K, 4) [x1,y1,x2,y2]. Reference utils/nms.py:43-76."""
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    overlap = _aabb_overlap_matrix(boxes[:, 0:2], boxes[:, 2:4], old_type)
    return _greedy_suppress(overlap, scores, threshold, valid)
