"""Point-cloud set-abstraction primitives as pure-XLA ops.

These replace the external CUDA `third_party/pointnet2` extension the
reference imports (reference models/model_3detr.py:8-9): furthest point
sampling, fixed-radius ball query with first-K semantics, and gathering.
Fixed shapes, jit/vmap/grad friendly; indices are non-differentiable by
construction (stop_gradient on the selection path).

Semantics deliberately mirror the CUDA kernels so a converted checkpoint
sees the same neighborhoods:
  * FPS seeds at index 0 and greedily takes the argmax of the running
    min-distance (ties -> lowest index);
  * ball query returns the first `nsample` points (in index order) whose
    squared distance is < radius^2, padding the tail by replicating the
    first hit (every center is its own first hit when querying its source
    cloud, so the pad is always valid there).

A fused Pallas kernel path lives in ov3det.ops.pallas; these jnp versions
are the correctness oracle and the CPU/interpret fallback.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1e10


def furthest_point_sample(xyz: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """Iterative farthest-point sampling.

    xyz: (B, N, 3) float. Returns (B, num_samples) int32 indices.
    """
    B, N, _ = xyz.shape
    xyz = jax.lax.stop_gradient(xyz)

    def body(i, state):
        inds, min_d2, last = state
        # distance from the most recently selected point to every point
        d2 = jnp.sum((xyz - last[:, None, :]) ** 2, axis=-1)  # (B, N)
        min_d2 = jnp.minimum(min_d2, d2)
        nxt = jnp.argmax(min_d2, axis=-1).astype(jnp.int32)  # (B,)
        inds = inds.at[:, i].set(nxt)
        last = jnp.take_along_axis(xyz, nxt[:, None, None], axis=1)[:, 0, :]
        return inds, min_d2, last

    inds0 = jnp.zeros((B, num_samples), jnp.int32)
    last0 = xyz[:, 0, :]
    min_d2_0 = jnp.full((B, N), _BIG, xyz.dtype)
    inds, _, _ = jax.lax.fori_loop(1, num_samples, body, (inds0, min_d2_0, last0))
    return inds


def gather_points(points: jnp.ndarray, inds: jnp.ndarray) -> jnp.ndarray:
    """points: (B, N, C), inds: (B, M) -> (B, M, C)."""
    return jnp.take_along_axis(points, inds[..., None], axis=1)


def ball_query(
    xyz: jnp.ndarray,
    centers: jnp.ndarray,
    radius: float,
    nsample: int,
) -> jnp.ndarray:
    """Fixed-radius neighborhood indices with CUDA-parity first-K semantics.

    xyz: (B, N, 3) source points; centers: (B, M, 3) query centers.
    Returns (B, M, nsample) int32 indices into xyz.
    """
    B, N, _ = xyz.shape
    xyz = jax.lax.stop_gradient(xyz)
    centers = jax.lax.stop_gradient(centers)
    r2 = radius * radius

    def per_batch(pts, ctrs):
        d2 = jnp.sum((ctrs[:, None, :] - pts[None, :, :]) ** 2, axis=-1)  # (M, N)
        in_ball = d2 < r2
        order = jnp.arange(N, dtype=jnp.int32)
        # smallest index-order scores among in-ball points == first hits
        scores = jnp.where(in_ball, order, N)
        neg_topk, idx = jax.lax.top_k(-scores, nsample)  # ascending scores
        count = jnp.sum(in_ball, axis=-1, keepdims=True)  # (M, 1)
        slot = jnp.arange(nsample)[None, :]
        # pad the tail by replicating the first hit (CUDA kernel behavior)
        idx = jnp.where(slot < count, idx, idx[:, 0:1])
        return idx.astype(jnp.int32)

    return jax.vmap(per_batch)(xyz, centers)


def group_points(
    xyz: jnp.ndarray,
    features: jnp.ndarray | None,
    centers: jnp.ndarray,
    group_inds: jnp.ndarray,
    radius: float,
    normalize_xyz: bool = True,
) -> jnp.ndarray:
    """Gather grouped relative coordinates (+ features) per center.

    xyz: (B, N, 3); features: (B, N, C) or None; centers: (B, M, 3);
    group_inds: (B, M, K). Returns (B, M, K, 3 + C) with relative xyz first —
    the layout QueryAndGroup produces for the SA module (pointnet2 lineage).
    """
    B, M, K = group_inds.shape
    flat = group_inds.reshape(B, M * K)
    g_xyz = gather_points(xyz, flat).reshape(B, M, K, 3)
    rel = g_xyz - centers[:, :, None, :]
    if normalize_xyz:
        rel = rel / radius
    if features is None:
        return rel
    C = features.shape[-1]
    g_feat = gather_points(features, flat).reshape(B, M, K, C)
    return jnp.concatenate([rel, g_feat], axis=-1)
