"""Fused bucketed ball-query + grouping Pallas kernel.

Replaces the XLA formulation in ov3det.ops.pointcloud.ball_group (the
TPU-native counterpart of the reference's CUDA QueryAndGroup,
third_party/pointnet2 imported at reference models/model_3detr.py:8-9) for
the hot pre-encoder path.  The XLA version is HBM-bound: it materializes
the (B, M, Npad) squared-distance matrix, the (B, M, K, Nb) in-ball mask
and a (B, M, K, Nb) f32 one-hot — ~3 GB of intermediates per flagship batch
(B=8, N=20k, M=2048, K=64).  This kernel keeps all of that in VMEM: per
(batch, center-tile) grid cell it loops over the K buckets, computes the
(TM, Nb) distance tile, picks each bucket's first in-radius point, and
extracts it with a (TM, Nb) x (Nb, 3+C) MXU contraction — HBM sees only
the inputs once and the (B, K, M, 3+C) output.

Semantics match ops.pointcloud.ball_group exactly (same bucketed
neighborhoods, same empty-slot replication of the first non-empty bucket's
point, same center/zero fallback when a ball is empty, relative xyz
optionally normalized by the radius); tests/test_ops.py drives both against
each other, including the feature-gradient path.

Output layout is (B, K, M, 3 + C) — neighbor-major rather than
center-major — so grid cells can store their bucket slab contiguously.
The SA module's shared MLP + max-pool is layout-agnostic (Dense acts on the
channel axis, the pool reduces the K axis wherever it lives), so no
transpose is ever paid.

Gradients: xyz and centers are non-differentiable by construction (the
selection path is stop_gradient in the XLA version too); features receive
the exact cotangent via a custom VJP whose backward recomputes the bucket
picks with the cheap XLA helper (ops.pointcloud.bucket_picks) and
scatter-adds — only the masked-encoder configs differentiate through
grouped features (the flagship pre-encoder groups raw input color, which
JAX never differentiates), so the forward stays residual-free.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pts_ref, centers_ref, out_ref, first, found, has_all, *,
            radius: float, normalize_xyz: bool):
    """Grid cell = (batch b, center tile mt).

    pts_ref:     (1, K, P, Nb)  bucketed points, channels = [xyz, feats]
                 (xyz padding beyond num_valid carries 1e6 sentinels)
    centers_ref: (1, TM, P)     tile centers, feature channels zero
    out_ref:     (1, K, TM, P)  grouped output slab
    first/found/has_all: VMEM scratch for the first-hit replication pass.
    """
    _, K, P, Nb = pts_ref.shape
    TM = centers_ref.shape[1]
    r2 = radius * radius

    cpad = centers_ref[0]  # (TM, P): [cx, cy, cz, 0...]
    cx = cpad[:, 0:1]
    cy = cpad[:, 1:2]
    cz = cpad[:, 2:3]
    first[:, :] = cpad  # no-hit-anywhere fallback: the center itself
    found[:, :] = jnp.zeros((TM, 1), jnp.float32)
    # float lane index: Mosaic's reduce-index lowering (argmax/argmin) only
    # supports f32 operands, and bool reduces (any) are equally off-limits,
    # so "first in-ball lane" is expressed as a plain f32 min-reduce over a
    # masked iota and "any hit" as an f32 max-reduce
    colf = jax.lax.broadcasted_iota(jnp.int32, (TM, Nb), 1).astype(jnp.float32)

    def pick_pass(k, _):
        ptsk = pts_ref[0, k]  # (P, Nb)
        dx = cx - ptsk[0:1, :]
        dy = cy - ptsk[1:2, :]
        dz = cz - ptsk[2:3, :]
        d2 = dx * dx + dy * dy + dz * dz  # (TM, Nb)
        in_ball = d2 < r2  # xyz padding is 1e6 -> never in ball
        in_ballf = jnp.where(in_ball, 1.0, 0.0)  # (TM, Nb) f32
        # first hit = min masked lane id; Nb when the ball is empty (no lane
        # equals Nb, so the one-hot row is then all-zero without gating)
        pick = jnp.min(
            jnp.where(in_ball, colf, jnp.float32(Nb)), axis=-1
        )[:, None]  # (TM, 1) f32
        has = jnp.max(in_ballf, axis=-1)[:, None]  # (TM, 1)
        onehot = jnp.where(colf == pick, 1.0, 0.0)  # (TM, Nb) f32
        g = jax.lax.dot_general(
            onehot, ptsk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TM, P)
        out_ref[0, k] = g
        take = (1.0 - found[:, :]) * has
        first[:, :] = first[:, :] * (1.0 - take) + g * take
        found[:, :] = jnp.maximum(found[:, :], has)
        has_all[k] = has[:, 0]
        return 0

    jax.lax.fori_loop(0, K, pick_pass, 0)

    # channel scale: relative xyz / radius on the first 3 lanes; cpad's
    # feature lanes are zero, so subtracting it centers only the xyz part
    lane = jax.lax.broadcasted_iota(jnp.int32, (TM, P), 1)
    inv_r = 1.0 / radius if normalize_xyz else 1.0
    scale = jnp.where(lane < 3, jnp.float32(inv_r), 1.0)

    def fill_pass(k, _):
        v = out_ref[0, k]  # (TM, P)
        h = has_all[k][:, None]  # (TM, 1)
        w = v * h + first[:, :] * (1.0 - h)
        out_ref[0, k] = (w - cpad) * scale
        return 0

    jax.lax.fori_loop(0, K, fill_pass, 0)


def _forward(xyz, features, centers, radius, nsample, normalize_xyz,
             interpret):
    B, N, _ = xyz.shape
    M = centers.shape[1]
    K = nsample
    C = 0 if features is None else features.shape[-1]
    P = 3 + C
    pad = (-N) % K
    Npad = N + pad
    Nb = Npad // K

    # xyz sentinel padding keeps padded points out of every ball; feature
    # padding is zero (matches ops.pointcloud.ball_group)
    pts = jnp.pad(
        xyz.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)),
        constant_values=1e6,
    )
    if features is not None:
        pts = jnp.concatenate(
            [pts, jnp.pad(features.astype(jnp.float32),
                          ((0, 0), (0, pad), (0, 0)))],
            axis=-1,
        )
    # bucket-major, channel-sublane, point-lane layout: bucket k is a major
    # index (dynamic in-kernel) and the Nb points sit on the lane axis
    pts = pts.reshape(B, K, Nb, P).transpose(0, 1, 3, 2)  # (B, K, P, Nb)
    cpad = jnp.pad(centers.astype(jnp.float32), ((0, 0), (0, 0), (0, P - 3)))

    # center tile: small enough that (K, TM, P-padded) stays well under VMEM
    TM = 128 if P <= 128 else 64
    while M % TM:
        TM //= 2
    assert TM >= 1

    kern = functools.partial(
        _kernel, radius=float(radius), normalize_xyz=bool(normalize_xyz),
    )
    out = pl.pallas_call(
        kern,
        grid=(B, M // TM),
        in_specs=[
            pl.BlockSpec((1, K, P, Nb), lambda b, mt: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM, P), lambda b, mt: (b, mt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, TM, P), lambda b, mt: (b, 0, mt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K, M, P), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TM, P), jnp.float32),   # first-hit value
            pltpu.VMEM((TM, 1), jnp.float32),   # found flag
            pltpu.VMEM((K, TM), jnp.float32),   # per-bucket has
        ],
        interpret=interpret,
    )(pts, cpad)
    return out


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6)
)
def ball_group_pallas(
    xyz: jnp.ndarray,
    features: jnp.ndarray | None,
    centers: jnp.ndarray,
    radius: float,
    nsample: int,
    normalize_xyz: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused ball query + group.  Returns (B, K, M, 3 + C) — see module doc.

    xyz: (B, N, 3); features: (B, N, C) or None; centers: (B, M, 3).
    """
    return _forward(
        jax.lax.stop_gradient(xyz), features,
        jax.lax.stop_gradient(centers), radius, nsample, normalize_xyz,
        interpret,
    )


def _fwd(xyz, features, centers, radius, nsample, normalize_xyz, interpret):
    out = _forward(
        jax.lax.stop_gradient(xyz), features,
        jax.lax.stop_gradient(centers), radius, nsample, normalize_xyz,
        interpret,
    )
    feat_shape = None if features is None else features.shape
    return out, (xyz, centers, feat_shape)


def _bwd(radius, nsample, normalize_xyz, interpret, res, dg):
    """Cotangent for `features` only (xyz/centers selection is stop-grad,
    matching ops.pointcloud.ball_group).  Recomputes the bucket picks with
    the cheap XLA helper instead of saving per-slot residuals — this runs
    only for configs that differentiate grouped features (masked-encoder
    interim SA, N=2048), where the recompute is a few MB."""
    xyz, centers, feat_shape = res
    if feat_shape is None:
        return (None, None, None)
    from ov3det.ops.pointcloud import bucket_picks

    B, N, _ = xyz.shape
    K = nsample
    pad = (-N) % K
    Nb = (N + pad) // K
    pick, has = bucket_picks(xyz, centers, radius, K)  # (B, M, K) each
    # effective source slot: empty slots replicate the first non-empty
    # bucket's pick; fully-empty centers contribute no feature gradient
    first_bucket = jnp.argmax(has, axis=-1)  # (B, M)
    take = lambda a: jnp.take_along_axis(a, first_bucket[..., None], axis=-1)
    eff_bucket = jnp.where(has, jnp.arange(K, dtype=jnp.int32)[None, None, :],
                           first_bucket[..., None])
    eff_pick = jnp.where(has, pick, take(pick))
    any_hit = jnp.any(has, axis=-1, keepdims=True)
    glob = eff_bucket * Nb + eff_pick  # (B, M, K) indices into Npad
    dg_feat = dg[..., 3:].transpose(0, 2, 1, 3)  # (B, K, M, C)->(B, M, K, C)
    dg_feat = jnp.where(any_hit[..., None], dg_feat, 0.0)
    d_feats = jnp.zeros((B, N + pad, dg_feat.shape[-1]), dg_feat.dtype)
    d_feats = d_feats.at[
        jnp.arange(B, dtype=jnp.int32)[:, None], glob.reshape(B, -1)
    ].add(dg_feat.reshape(B, -1, dg_feat.shape[-1]))
    return (None, d_feats[:, :N].reshape(feat_shape), None)


ball_group_pallas.defvjp(_fwd, _bwd)
