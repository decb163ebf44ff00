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

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ov3det.models.mlp import ACTIVATIONS

_XAVIER = nn.initializers.xavier_uniform()


def _attention(dim, num_heads, dropout, dtype):
    return nn.MultiHeadDotProductAttention(
        num_heads=num_heads,
        qkv_features=dim,
        out_features=dim,
        dropout_rate=dropout,
        kernel_init=_XAVIER,
        dtype=dtype,
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
    def __call__(self, x, pos=None, mask=None, train: bool = False):
        act = ACTIVATIONS[self.activation]
        y = nn.LayerNorm(epsilon=1e-5)(x)
        qk = _with_pos(y, pos)
        attn = _attention(self.dim, self.num_heads, self.dropout, self.dtype)(
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
            d2 = jnp.sum((xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2, axis=-1)
            mask = (d2 < r * r)[:, None, :, :]  # (B, 1, N, N); True = attend
            feats = TransformerEncoderLayer(
                self.dim, self.num_heads, self.ffn_dim, self.dropout,
                self.activation, self.dtype,
            )(feats, pos=pos, mask=mask, train=train)
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
