"""Fused multi-head attention Pallas kernel (fwd + bwd) with weight dropout.

Replaces flax's materialized dot-product attention in the detector's
transformer stack (reference models/transformer.py uses torch
nn.MultiheadAttention with attention-weight dropout).  At the encoder's
2048 point tokens the (B, H, N, N) logits tensor is ~268MB bf16 per layer
per pass — all HBM traffic, ~10 ms/step of the point-only train step.
This kernel keeps each (q-tile x N) score block in VMEM: logits, softmax,
dropout, and the value contraction never touch HBM.

Design notes (sized for this model family: N <= ~8192, D <= 128):
  * K and V for one (batch, head) fit in VMEM outright (N x D bf16 =
    256KB at the encoder's 2048 x 64), so each grid step computes FULL
    softmax rows for a TQ-row tile — exact softmax, no online rescaling.
  * Attention-weight dropout matches torch semantics (independent per
    (b, h, q, k) element): weights (post softmax) are zeroed with prob p
    and survivors scaled by 1/(1-p); mask bits come from the on-core PRNG
    seeded per (seed, batch*head, q-tile) so the SAME bits are
    regenerated in the backward kernels — nothing is stored.
  * backward: two kernels.  dq grids over q-tiles (like fwd); dk/dv grid
    over batch*head with an inner q-tile loop accumulating in VMEM.  Both
    recompute probabilities from the saved row logsumexp.  For softmax
    with dropout, rowsum(e * de) collapses to the SAME delta =
    rowsum(dO * O) as the no-dropout case (sum_j a_j da_j = dO . out), so
    ds = e * (mask/(1-p) * (dO V^T) - delta) * scale.
  * optional radius mask (the masked encoder's geometric sparsity,
    reference models/transformer.py:152-159): passes q/k point coords and
    a squared radius; the (TQ, N) boolean is built in VMEM from coords —
    the (B, N, N) distance matrix never exists.

Precision: scores and softmax in f32 regardless of input dtype
(preferred_element_type on every MXU call); outputs cast back to the
input dtype.  bf16 inputs are thus MORE precise here than flax's all-bf16
attention path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9  # mask fill; f32-safe "minus infinity" for softmax


def _drop_mask(seed, bh, qi, tq, nk, keep_scale, threshold):
    """(TQ, NK) float mask: 0 dropped, keep_scale kept — regenerable bits.

    Bits are a murmur3-finalizer hash of (seed, batch*head, global row,
    col) computed on the VPU — stateless, so the forward and both backward
    kernels regenerate IDENTICAL masks from indices alone (nothing stored),
    and the same code runs under interpret mode on CPU (the TPU-native
    prng_seed/prng_random_bits pair has no interpret lowering).  Murmur's
    avalanche is ample mixing for dropout.
    """
    qoff = (jnp.asarray(qi, jnp.int32) * tq).astype(jnp.uint32)
    row = jax.lax.broadcasted_iota(jnp.uint32, (tq, nk), 0) + qoff
    col = jax.lax.broadcasted_iota(jnp.uint32, (tq, nk), 1)
    h = (
        jnp.asarray(seed, jnp.int32).astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
        + jnp.asarray(bh, jnp.int32).astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
        + row * jnp.uint32(0xC2B2AE35)
        + col * jnp.uint32(0x27D4EB2F)
    )
    h ^= h >> 16
    h *= jnp.uint32(0x85EBCA6B)
    h ^= h >> 13
    h *= jnp.uint32(0xC2B2AE35)
    h ^= h >> 16
    return jnp.where(h >= threshold, keep_scale, 0.0).astype(jnp.float32)


def _scores(q_tile, k, scale):
    """(TQ, D) x (NK, D) -> f32 (TQ, NK) scaled scores on the MXU."""
    s = jax.lax.dot_general(
        q_tile, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return s * scale


def _radius_bias(qxyz_tile, kxyz, r2):
    """f32 (TQ, NK) additive bias: 0 inside the radius, -1e9 outside.

    The q.k cross term MUST run at HIGHEST precision: the TPU MXU's
    default truncates f32 operands to bf16, which perturbs d2 by ~1e-3
    and flips thousands of near-boundary mask bits vs the f32
    subtract-form oracle (measured 0.44 max output error at N=2048).
    The dot is (TQ, 3) x (NK, 3) — negligible FLOPs either way.
    """
    d2 = (
        jnp.sum(qxyz_tile * qxyz_tile, -1, keepdims=True)
        - 2.0
        * jax.lax.dot_general(
            qxyz_tile, kxyz, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        + jnp.sum(kxyz * kxyz, -1)[None, :]
    )
    return jnp.where(d2 < r2, 0.0, _NEG)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, qx_ref, kx_ref, o_ref,
                lse_ref, *, scale, dropout_rate, r2):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    tq, nk = q_ref.shape[1], k_ref.shape[1]
    s = _scores(q_ref[0], k_ref[0], scale)
    if r2 is not None:
        s += _radius_bias(qx_ref[0].astype(jnp.float32),
                          kx_ref[0].astype(jnp.float32), r2)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    lse_ref[0] = m + jnp.log(l)
    a = e / l
    if dropout_rate > 0.0:
        a = a * _drop_mask(seed_ref[0], bh, qi, tq, nk,
                           1.0 / (1.0 - dropout_rate),
                           jnp.uint32(min(int(dropout_rate * 2**32), 2**32 - 1)))
    o_ref[0] = jax.lax.dot_general(
        a.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, qx_ref, kx_ref, do_ref,
               lse_ref, delta_ref, dq_ref, *, scale, dropout_rate, r2):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    tq, nk = q_ref.shape[1], k_ref.shape[1]
    s = _scores(q_ref[0], k_ref[0], scale)
    if r2 is not None:
        s += _radius_bias(qx_ref[0].astype(jnp.float32),
                          kx_ref[0].astype(jnp.float32), r2)
    e = jnp.exp(s - lse_ref[0])  # normalized probs (rowsum 1)
    dp = jax.lax.dot_general(  # dO V^T: (TQ, NK) f32
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if dropout_rate > 0.0:
        dp = dp * _drop_mask(seed_ref[0], bh, qi, tq, nk,
                             1.0 / (1.0 - dropout_rate),
                             jnp.uint32(min(int(dropout_rate * 2**32), 2**32 - 1)))
    ds = e * (dp - delta_ref[0]) * scale
    dq_ref[0] = jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)


def _dkv_kernel(seed_ref, q_ref, k_ref, v_ref, qx_ref, kx_ref, do_ref,
                lse_ref, delta_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                scale, dropout_rate, r2, tq):
    """Grid (BH,): K/V/Q all VMEM-resident; fori_loop over q-tiles
    accumulates dk/dv into f32 VMEM scratch (a python unroll made all 16
    tiles' f32 score blocks co-live and busted the 16MB scoped-VMEM
    stack).  ds^T Q and a^T dO are (NK, D) updates."""
    bh = pl.program_id(0)
    nq, nk = q_ref.shape[1], k_ref.shape[1]
    dk_acc[:, :] = jnp.zeros_like(dk_acc)
    dv_acc[:, :] = jnp.zeros_like(dv_acc)
    keep = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0
    thresh = jnp.uint32(min(int(dropout_rate * 2**32), 2**32 - 1))

    def body(qi, _):
        qs = qi * tq
        q_tile = q_ref[0, pl.ds(qs, tq)]
        s = _scores(q_tile, k_ref[0], scale)
        if r2 is not None:
            s += _radius_bias(qx_ref[0, pl.ds(qs, tq)].astype(jnp.float32),
                              kx_ref[0].astype(jnp.float32), r2)
        e = jnp.exp(s - lse_ref[0, pl.ds(qs, tq)])
        dp = jax.lax.dot_general(
            do_ref[0, pl.ds(qs, tq)], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if dropout_rate > 0.0:
            mask = _drop_mask(seed_ref[0], bh, qi, tq, nk, keep, thresh)
            a = e * mask
            dp = dp * mask
        else:
            a = e
        ds = e * (dp - delta_ref[0, pl.ds(qs, tq)]) * scale
        dv_acc[:, :] += jax.lax.dot_general(  # a^T dO
            a.astype(do_ref.dtype), do_ref[0, pl.ds(qs, tq)],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dk_acc[:, :] += jax.lax.dot_general(  # ds^T Q
            ds.astype(q_ref.dtype), q_tile, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, nq // tq, body, 0)
    dk_ref[0] = dk_acc[:, :].astype(dk_ref.dtype)
    dv_ref[0] = dv_acc[:, :].astype(dv_ref.dtype)


def _pick_tq(nq: int) -> int:
    # 256 rows keeps the f32 (TQ, NK) score/prob blocks ~2MB each at the
    # encoder's NK=2048 — comfortably in VMEM next to K/V and DMA buffers
    for t in (256, 128):
        if nq % t == 0:
            return t
    return nq


def _specs(BH, NQ, NK, D, TQ, with_grads: bool):
    """Common in_specs for (seed, q, k, v, qxyz, kxyz [, do, lse, delta])."""
    sp = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
        pl.BlockSpec((1, TQ, D), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NK, D), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NK, D), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TQ, 3), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NK, 3), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if with_grads:
        sp += [
            pl.BlockSpec((1, TQ, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ]
    return sp


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _attn(q, k, v, qxyz, kxyz, seed, scale, dropout_rate, r2, interpret):
    out, _ = _attn_fwd(q, k, v, qxyz, kxyz, seed, scale, dropout_rate, r2,
                       interpret)
    return out


def _attn_fwd(q, k, v, qxyz, kxyz, seed, scale, dropout_rate, r2, interpret):
    BH, NQ, D = q.shape
    NK = k.shape[1]
    TQ = _pick_tq(NQ)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale,
                          dropout_rate=dropout_rate, r2=r2),
        grid=(BH, NQ // TQ),
        in_specs=_specs(BH, NQ, NK, D, TQ, with_grads=False),
        out_specs=[
            pl.BlockSpec((1, TQ, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, NQ, D), q.dtype),
            jax.ShapeDtypeStruct((BH, NQ, 1), jnp.float32),
        ],
        interpret=interpret,
    )(seed, q, k, v, qxyz, kxyz)
    return out, (q, k, v, qxyz, kxyz, seed, out, lse)


def _attn_bwd(scale, dropout_rate, r2, interpret, res, g):
    q, k, v, qxyz, kxyz, seed, out, lse = res
    BH, NQ, D = q.shape
    NK = k.shape[1]
    TQ = _pick_tq(NQ)
    do = g.astype(q.dtype)
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), -1,
                    keepdims=True)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale,
                          dropout_rate=dropout_rate, r2=r2),
        grid=(BH, NQ // TQ),
        in_specs=_specs(BH, NQ, NK, D, TQ, with_grads=True),
        out_specs=pl.BlockSpec((1, TQ, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, NQ, D), q.dtype),
        interpret=interpret,
    )(seed, q, k, v, qxyz, kxyz, do, lse, delta)

    full = [  # dkv grid is (BH,) — whole-sequence blocks
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, NQ, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NK, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NK, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NQ, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NK, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NQ, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NQ, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NQ, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    # dkv holds whole-sequence Q/K/V/dO blocks PLUS f32 dk/dv accumulators
    # and three f32 (tq, NK) score blocks — the scoped-VMEM stack budget is
    # 16MB and the surrounding program changes the residual accounting:
    # tq=128 fit inside the point-only train step but busted the limit by
    # 480KB inside the (much larger) open-vocab step, so tq=64 buys ~1.5MB
    # of headroom (the q-tile loop stays MXU-bound either way)
    dkv_tq = min(TQ, 64)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale,
                          dropout_rate=dropout_rate, r2=r2, tq=dkv_tq),
        grid=(BH,),
        in_specs=full,
        out_specs=[
            pl.BlockSpec((1, NK, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NK, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, NK, D), k.dtype),
            jax.ShapeDtypeStruct((BH, NK, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((NK, D), jnp.float32),
            pltpu.VMEM((NK, D), jnp.float32),
        ],
        interpret=interpret,
    )(seed, q, k, v, qxyz, kxyz, do, lse, delta)
    return dq, dk, dv, None, None, None


_attn.defvjp(_attn_fwd, _attn_bwd)


def _prep(x, B, H):
    """(B, N, H, D) -> (B*H, N, D)."""
    return x.transpose(0, 2, 1, 3).reshape(B * H, x.shape[1], x.shape[3])


@functools.partial(
    jax.jit,
    static_argnames=("dropout_rate", "radius_sq", "interpret"),
)
def fused_attention(
    q: jnp.ndarray,  # (B, NQ, H, D) — flax attention layout
    k: jnp.ndarray,  # (B, NK, H, D)
    v: jnp.ndarray,  # (B, NK, H, D)
    *,
    dropout_rate: float = 0.0,
    dropout_seed=0,  # int or int32 scalar array; per-step value
    q_xyz: jnp.ndarray | None = None,  # (B, NQ, 3) for the radius mask
    k_xyz: jnp.ndarray | None = None,  # (B, NK, 3)
    radius_sq: float | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused softmax(q k^T / sqrt(D) [+ radius mask]) @ v with weight dropout.

    Returns (B, NQ, H, D).  With radius_sq set, token pairs farther than
    sqrt(radius_sq) (Euclidean, from q_xyz/k_xyz) cannot attend — the
    masked encoder's per-layer geometric mask (reference
    models/transformer.py:152-159) without the (B, N, N) cdist tensor.
    """
    B, NQ, H, D = q.shape
    NK = k.shape[1]
    scale = 1.0 / (D ** 0.5)
    if q_xyz is None:
        q_xyz = jnp.zeros((B, NQ, 3), jnp.float32)
        k_xyz = jnp.zeros((B, NK, 3), jnp.float32)
    qx = jnp.repeat(q_xyz[:, None], H, axis=1).reshape(B * H, NQ, 3)
    kx = jnp.repeat(k_xyz[:, None], H, axis=1).reshape(B * H, NK, 3)
    seed = jnp.asarray(dropout_seed, jnp.int32).reshape((1,))
    out = _attn(
        _prep(q, B, H), _prep(k, B, H), _prep(v, B, H), qx, kx, seed,
        scale, float(dropout_rate), radius_sq, interpret,
    )
    return out.reshape(B, H, NQ, D).transpose(0, 2, 1, 3)


def attention_reference(q, k, v, *, q_xyz=None, k_xyz=None, radius_sq=None):
    """Plain-jnp oracle (no dropout) for parity tests."""
    B, NQ, H, D = q.shape
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / (D ** 0.5)
    if radius_sq is not None:
        d2 = jnp.sum((q_xyz[:, :, None] - k_xyz[:, None]) ** 2, -1)
        s = jnp.where((d2 < radius_sq)[:, None], s, _NEG)
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", a, v.astype(jnp.float32)).astype(q.dtype)
