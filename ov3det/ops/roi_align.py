"""RoIAlign (detectron2 V2 / aligned=True semantics) as pure-XLA gathers.

Replaces the ROIAlign CUDA kernel RegionCLIP's RoI head uses (the external
detectron2 dependency at reference models/model_regionclip.py:15-22).  For
each output cell, samples a fixed 2x2 grid of bilinear taps (sampling_ratio
= 2) and averages — batched over (R, out_h, out_w) with plain gathers, which
XLA fuses into a handful of kernels.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear(feat: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """feat: (H, W, C); y/x: (...,) fractional pixel coords. Returns (..., C)."""
    H, W, _ = feat.shape
    y = jnp.clip(y, 0.0, H - 1.0)
    x = jnp.clip(x, 0.0, W - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (y - y0)[..., None]
    wx = (x - x0)[..., None]
    v00 = feat[y0, x0]
    v01 = feat[y0, x1]
    v10 = feat[y1, x0]
    v11 = feat[y1, x1]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align(
    features: jnp.ndarray,  # (B, H, W, C)
    boxes: jnp.ndarray,  # (R, 4) [x1, y1, x2, y2] in input-image pixels
    box_batch_idx: jnp.ndarray,  # (R,) int32 image index per box
    spatial_scale: float,
    output_size: int,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Returns (R, output_size, output_size, C), aligned=True convention
    (half-pixel offset, like detectron2 ROIAlignV2)."""
    scaled = boxes * spatial_scale
    x1, y1, x2, y2 = scaled[:, 0], scaled[:, 1], scaled[:, 2], scaled[:, 3]
    # aligned=True: shift by half a pixel
    x1, y1, x2, y2 = x1 - 0.5, y1 - 0.5, x2 - 0.5, y2 - 0.5
    roi_w = jnp.maximum(x2 - x1, 1e-6)
    roi_h = jnp.maximum(y2 - y1, 1e-6)
    bin_w = roi_w / output_size
    bin_h = roi_h / output_size
    s = sampling_ratio

    oy = jnp.arange(output_size, dtype=jnp.float32)
    sy = jnp.arange(s, dtype=jnp.float32)
    # sample coords: y1 + (oy + (sy + .5)/s) * bin_h  -> (R, out, s)
    ys = y1[:, None, None] + (oy[None, :, None] + (sy[None, None, :] + 0.5) / s) * bin_h[:, None, None]
    xs = x1[:, None, None] + (oy[None, :, None] + (sy[None, None, :] + 0.5) / s) * bin_w[:, None, None]

    def per_roi(feat, ys_r, xs_r):
        # ys_r/xs_r: (out, s); full grid (out, s, out, s)
        yy = ys_r[:, :, None, None]
        xx = xs_r[None, None, :, :]
        vals = _bilinear(
            feat,
            jnp.broadcast_to(yy, (ys_r.shape[0], s, xs_r.shape[0], s)),
            jnp.broadcast_to(xx, (ys_r.shape[0], s, xs_r.shape[0], s)),
        )  # (out, s, out, s, C)
        return jnp.mean(vals, axis=(1, 3))  # (out, out, C)

    feats_per_roi = features[box_batch_idx]  # (R, H, W, C)
    return jax.vmap(per_roi)(feats_per_roi, ys, xs)


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align_batched(
    features: jnp.ndarray,  # (B, H, W, C)
    boxes: jnp.ndarray,  # (B, Q, 4) [x1, y1, x2, y2] in input-image pixels
    spatial_scale: float,
    output_size: int,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """RoIAlign for the Q-boxes-per-image layout: (B, Q, out, out, C).

    Numerically identical to roi_align (same aligned=True taps) but built
    for scale: the generic path materializes a per-RoI copy of the whole
    feature map (features[batch_idx] -> (R, H, W, C); at the RegionCLIP
    teacher's 1024 RoIs over 34x46x1280 features that one intermediate is
    ~8GB and OOMs a 16GB chip).  Here every RoI gathers directly from its
    image's shared feature map, and the s*s sample taps are accumulated in
    a python loop so the peak extra memory is two (B, Q, out, out, C)
    buffers in the feature dtype.
    """
    B, H, W, C = features.shape
    Q = boxes.shape[1]
    dtype = features.dtype
    scaled = boxes * spatial_scale
    x1, y1 = scaled[..., 0] - 0.5, scaled[..., 1] - 0.5
    x2, y2 = scaled[..., 2] - 0.5, scaled[..., 3] - 0.5
    bin_w = jnp.maximum(x2 - x1, 1e-6) / output_size
    bin_h = jnp.maximum(y2 - y1, 1e-6) / output_size
    s = sampling_ratio

    o = jnp.arange(output_size, dtype=jnp.float32)
    frac = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s

    # Bilinear sampling + tap averaging as SEPARABLE interpolation
    # matrices: out[i,j] = mean_taps bilerp(feat) = Wy @ feat @ Wx^T with
    # Wy[i,h] = mean_t hat(clip(y_tap(i,t)) - h) (hat = the 1-|d|+ tent; at
    # clamped borders the tent reproduces _bilinear's corner duplication
    # exactly).  Two batched MXU matmuls instead of s*s*4 per-pixel
    # gathers — random-access gathers over (R, out, out, C) ran at ~10% of
    # HBM streaming bandwidth and dominated the teacher forward (~250ms of
    # a 273ms batch); this formulation is ~30 GFLOP of dense contraction.
    def interp(tap_lo, bin_sz, size):  # -> (B, Q, out, size) weights
        taps = (
            tap_lo[..., None, None]
            + (o[None, None, :, None] + frac[None, None, None, :])
            * bin_sz[..., None, None]
        )  # (B, Q, out, s)
        taps = jnp.clip(taps, 0.0, size - 1.0)
        grid = jnp.arange(size, dtype=jnp.float32)
        hat = jnp.maximum(0.0, 1.0 - jnp.abs(taps[..., None] - grid))
        return jnp.mean(hat, axis=3)  # (B, Q, out, size)

    # materialize the weight matrices before the contractions: left fusable,
    # XLA folds the tent construction INTO the einsum loop and recomputes it
    # per output tile (traced as 4.9 ms/step of "abs_reduce" fusion at
    # teacher scale vs ~0.1 ms to build the (B,Q,out,size) weights once —
    # docs/PROFILE.md round 4)
    wy, wx = jax.lax.optimization_barrier(
        (interp(y1, bin_h, H).astype(dtype), interp(x1, bin_w, W).astype(dtype))
    )
    # contract the LARGER image axis first so the materialized intermediate
    # carries the smaller one: (B,Q,out,H,C) with H=34 vs (B,Q,out,W,C) with
    # W=46 at teacher scale is ~25% less HBM traffic on a bandwidth-bound op
    cols = jnp.einsum(
        "bqjw,bhwc->bqjhc", wx, features,
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    return jnp.einsum(
        "bqih,bqjhc->bqijc", wy, cols,
        preferred_element_type=jnp.float32,
    ).astype(dtype)
