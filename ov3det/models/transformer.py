"""Pre-norm transformer encoder/decoder for point tokens.

Counterpart of the reference's DETR-style stack
(reference models/transformer.py): 3-layer encoder over pre-encoder tokens,
8-layer decoder over query tokens returning all intermediate states, plus
the radius-masked encoder variant with an interim set-abstraction
downsample after layer 0 (models/transformer.py:144-209).

Layout is channels-last (B, N, C) throughout — the reference's
(N, B, C) layout is a torch nn.MultiheadAttention artifact.
LayerNorm epsilon is pinned to torch's 1e-5 (flax defaults to 1e-6):
at the small activation scales of a converted checkpoint the epsilon gap
is a ~0.5% systematic error that breaks forward parity.
Attention masks are boolean with True = may attend (the reference uses the
inverted torch convention).
"""
from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ov3det.models.mlp import ACTIVATIONS

_XAVIER = nn.initializers.xavier_uniform()


def _seed_from_rng(rng) -> jnp.ndarray:
    """Fold a flax dropout PRNG key into the fused kernel's int32 seed."""
    data = (
        jax.random.key_data(rng)
        if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key)
        else rng
    )
    data = data.ravel().astype(jnp.uint32)
    return (data[0] ^ data[-1]).astype(jnp.int32)


def fused_attention_eligible(NQ: int, NK: int, D: int,
                             has_mask: bool = False) -> bool:
    """Dispatch rule for the Pallas fused attention (mirrors
    ops.pointcloud): TPU backend (or OV3DET_ATTENTION=fused forcing
    interpret mode off-TPU), kernel-tileable shapes, and no explicit
    boolean mask (the radius mask has its own in-kernel path)."""
    force = os.environ.get("OV3DET_ATTENTION")
    if force == "xla":
        return False
    shapes_ok = (
        not has_mask and NQ % 128 == 0 and NK % 128 == 0 and D % 8 == 0
    )
    if force == "fused":  # tests force the kernel at any size
        return shapes_ok
    # Auto mode: TPU + large sequences only.  Each pallas_call carries
    # ~150us of fixed dispatch/DMA-setup cost, so the decoder's small
    # attentions (128 queries; logits <= 8MB) are FASTER on the XLA path —
    # the kernel wins where the materialized logits are big (encoder:
    # 2048x2048 = 268MB/pass).  Measured on v5e: routing the decoder
    # through the kernel cost +7 ms/step in call overhead.
    return (
        shapes_ok
        and NQ * NK >= 1024 * 1024
        and jax.default_backend() == "tpu"
    )


def _fused_attention_fn(query, key, value, mask=None, dropout_rng=None,
                        dropout_rate=0.0, deterministic=True, dtype=None,
                        precision=None, radius_ctx=None):
    """flax-compatible attention_fn backed by the Pallas fused kernel.

    Dispatch mirrors ops.pointcloud: the kernel runs on TPU (or anywhere
    when OV3DET_ATTENTION=fused forces it, in interpret mode off-TPU);
    OV3DET_ATTENTION=xla opts out.  Falls back to flax's materialized
    attention for explicit boolean masks and for shapes the kernel isn't
    tiled for (tiny test models).  radius_ctx=(q_xyz, k_xyz, radius_sq)
    applies the masked encoder's geometric mask IN-KERNEL — no (B, N, N)
    tensor.  The kernel computes scores/softmax in f32 even for bf16
    inputs — slightly MORE precise than flax's all-bf16 path;
    attention-weight dropout keeps torch semantics (independent per
    (b, h, q, k))."""
    NQ, NK, D = query.shape[1], key.shape[1], query.shape[3]
    if not fused_attention_eligible(NQ, NK, D, has_mask=mask is not None):
        assert radius_ctx is None, (
            "radius_ctx callers must check fused_attention_eligible first"
        )
        return nn.dot_product_attention(
            query, key, value, mask=mask, dropout_rng=dropout_rng,
            dropout_rate=dropout_rate, deterministic=deterministic,
            dtype=dtype, precision=precision,
        )
    from functools import partial

    from ov3det.ops.pallas.attention_kernel import fused_attention
    from ov3det.parallel.mesh import DATA_AXIS, data_mesh

    use_dropout = (
        not deterministic and dropout_rate > 0.0 and dropout_rng is not None
    )
    rate = float(dropout_rate) if use_dropout else 0.0
    seed = _seed_from_rng(dropout_rng) if use_dropout else jnp.int32(0)
    q_xyz, k_xyz, radius_sq = radius_ctx or (None, None, None)
    fn = partial(
        fused_attention,
        dropout_rate=rate,
        radius_sq=radius_sq,
        interpret=jax.default_backend() != "tpu",
    )
    mesh = data_mesh()
    if mesh is not None and mesh.size > 1 and query.shape[0] % mesh.size == 0:
        from jax.sharding import PartitionSpec as P

        # pallas_call carries no GSPMD partitioning rule; attention is
        # batch-parallel, so run the kernel per-shard (same pattern as
        # ops.pointcloud._pallas_dispatch).  Seed folded with the shard
        # index so dropout masks decorrelate across devices.
        def sharded(q, k, v, qx, kx, s):
            return fn(q, k, v, q_xyz=qx, k_xyz=kx,
                      dropout_seed=s + jax.lax.axis_index(DATA_AXIS))

        if q_xyz is None:
            B = query.shape[0]
            q_xyz = jnp.zeros((B, NQ, 3), jnp.float32)
            k_xyz = jnp.zeros((B, NK, 3), jnp.float32)
        out = jax.shard_map(
            sharded, mesh=mesh,
            in_specs=(P(DATA_AXIS),) * 5 + (P(),),
            out_specs=P(DATA_AXIS), check_vma=False,
        )(query, key, value, q_xyz, k_xyz, seed)
    else:
        out = fn(query, key, value, q_xyz=q_xyz, k_xyz=k_xyz,
                 dropout_seed=seed)
    return out.astype(query.dtype)


def _attention(dim, num_heads, dropout, dtype, radius_ctx=None):
    from functools import partial as _partial

    # radius_ctx rides in through the attention_fn closure: flax modules
    # are reconstructed on every @nn.compact call, so capturing the call's
    # xyz tensors here is trace-safe and keeps the MHA param names (the
    # checkpoint converter targets MultiHeadDotProductAttention_{0,1}).
    fn = (
        _fused_attention_fn
        if radius_ctx is None
        else _partial(_fused_attention_fn, radius_ctx=radius_ctx)
    )
    return nn.MultiHeadDotProductAttention(
        num_heads=num_heads,
        qkv_features=dim,
        out_features=dim,
        dropout_rate=dropout,
        kernel_init=_XAVIER,
        dtype=dtype,
        attention_fn=fn,
    )


def _with_pos(x, pos):
    return x if pos is None else x + pos


class TransformerEncoderLayer(nn.Module):
    """Pre-norm self-attention layer (reference models/transformer.py:213-295)."""

    dim: int
    num_heads: int = 4
    ffn_dim: int = 128
    dropout: float = 0.1
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos=None, mask=None, train: bool = False,
                 radius_ctx=None):
        act = ACTIVATIONS[self.activation]
        y = nn.LayerNorm(epsilon=1e-5)(x)
        qk = _with_pos(y, pos)
        attn = _attention(self.dim, self.num_heads, self.dropout, self.dtype,
                          radius_ctx=radius_ctx)(
            qk, qk, y, mask=mask, deterministic=not train
        )
        x = x + nn.Dropout(self.dropout, deterministic=not train)(attn)
        y = nn.LayerNorm(epsilon=1e-5)(x)
        y = nn.Dense(self.ffn_dim, kernel_init=_XAVIER, dtype=self.dtype)(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(act(y))
        y = nn.Dense(self.dim, kernel_init=_XAVIER, dtype=self.dtype)(y)
        x = x + nn.Dropout(self.dropout, deterministic=not train)(y)
        return x


class TransformerEncoder(nn.Module):
    """Vanilla encoder: full self-attention over all point tokens."""

    num_layers: int
    dim: int
    num_heads: int = 4
    ffn_dim: int = 128
    dropout: float = 0.1
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, xyz, pos=None, train: bool = False):
        for _ in range(self.num_layers):
            feats = TransformerEncoderLayer(
                self.dim, self.num_heads, self.ffn_dim, self.dropout,
                self.activation, self.dtype,
            )(feats, pos=pos, train=train)
        # vanilla encoder performs no downsampling: inds is None
        return xyz, feats, None


class MaskedTransformerEncoder(nn.Module):
    """Radius-masked encoder with interim SA downsample after layer 0.

    masking_radius holds *Euclidean-distance* thresholds per layer; the
    reference's documented quirk of comparing cdist against squared radii is
    preserved by the caller passing squared values (see EncoderConfig).
    Reference models/transformer.py:144-209.
    """

    num_layers: int
    dim: int
    masking_radius: tuple[float, ...]
    interim_downsample: nn.Module
    num_heads: int = 4
    ffn_dim: int = 128
    dropout: float = 0.1
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, xyz, pos=None, train: bool = False):
        assert len(self.masking_radius) == self.num_layers
        inds = None
        for idx in range(self.num_layers):
            r = self.masking_radius[idx]
            N = feats.shape[1]
            D = self.dim // self.num_heads
            if fused_attention_eligible(N, N, D):
                # in-kernel radius mask: the (B, N, N) cdist/mask tensors
                # (134MB f32 at N=2048) are never materialized
                mask, radius_ctx = None, (xyz, xyz, float(r * r))
            else:
                d2 = jnp.sum(
                    (xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2, axis=-1
                )
                # (B, 1, N, N); True = attend
                mask, radius_ctx = (d2 < r * r)[:, None, :, :], None
            feats = TransformerEncoderLayer(
                self.dim, self.num_heads, self.ffn_dim, self.dropout,
                self.activation, self.dtype,
            )(feats, pos=pos, mask=mask, train=train, radius_ctx=radius_ctx)
            if idx == 0:
                xyz, feats, inds = self.interim_downsample(xyz, feats, train=train)
        return xyz, feats, inds


class TransformerDecoderLayer(nn.Module):
    """Pre-norm self + cross attention (reference models/transformer.py:298-393)."""

    dim: int
    num_heads: int = 4
    ffn_dim: int = 256
    dropout: float = 0.1
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, query_pos=None, mem_pos=None, train: bool = False):
        act = ACTIVATIONS[self.activation]
        y = nn.LayerNorm(epsilon=1e-5)(tgt)
        qk = _with_pos(y, query_pos)
        sa = _attention(self.dim, self.num_heads, self.dropout, self.dtype)(
            qk, qk, y, deterministic=not train
        )
        tgt = tgt + nn.Dropout(self.dropout, deterministic=not train)(sa)

        y = nn.LayerNorm(epsilon=1e-5)(tgt)
        ca = _attention(self.dim, self.num_heads, self.dropout, self.dtype)(
            _with_pos(y, query_pos), _with_pos(memory, mem_pos), memory,
            deterministic=not train,
        )
        tgt = tgt + nn.Dropout(self.dropout, deterministic=not train)(ca)

        y = nn.LayerNorm(epsilon=1e-5)(tgt)
        y = nn.Dense(self.ffn_dim, kernel_init=_XAVIER, dtype=self.dtype)(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(act(y))
        y = nn.Dense(self.dim, kernel_init=_XAVIER, dtype=self.dtype)(y)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=not train)(y)
        return tgt


class TransformerDecoder(nn.Module):
    """Decoder returning the LayerNormed state after every layer, stacked.

    Output shape (num_layers, B, Q, C); the last slice is the final output
    (reference models/transformer.py:114-139 return_intermediate path).
    """

    num_layers: int
    dim: int
    num_heads: int = 4
    ffn_dim: int = 256
    dropout: float = 0.1
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, query_pos=None, mem_pos=None, train: bool = False):
        final_norm = nn.LayerNorm(epsilon=1e-5)
        inter = []
        for _ in range(self.num_layers):
            tgt = TransformerDecoderLayer(
                self.dim, self.num_heads, self.ffn_dim, self.dropout,
                dtype=self.dtype,
            )(tgt, memory, query_pos=query_pos, mem_pos=mem_pos, train=train)
            inter.append(final_norm(tgt))
        return jnp.stack(inter, axis=0)
