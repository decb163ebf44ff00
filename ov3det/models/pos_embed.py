"""Coordinate positional embeddings (Fourier features / sine).

Counterpart of the reference's PositionEmbeddingCoordsSine
(reference models/position_embedding.py:12-139).  The Fourier variant draws
a fixed Gaussian projection matrix once at init and keeps it as a
non-trainable variable — the reference registers it as a buffer that ships
with checkpoints (models/position_embedding.py:37-39), so it must be
persisted here too (stored in params but gradient-stopped).

Output layout is channels-last (B, N, D) — callers needing the torch
(B, D, N) layout transpose at the boundary.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ov3det.geometry import shift_scale_points


class PositionEmbeddingCoords(nn.Module):
    d_pos: int
    pos_type: str = "fourier"  # "fourier" | "sine"
    d_in: int = 3
    gauss_scale: float = 1.0
    normalize: bool = True
    temperature: float = 10000.0
    scale: float = 2 * math.pi

    def setup(self):
        if self.pos_type == "fourier":
            assert self.d_pos % 2 == 0
            self.gauss_B = self.param(
                "gauss_B",
                lambda key: jax.random.normal(key, (self.d_in, self.d_pos // 2))
                * self.gauss_scale,
            )

    def _fourier(self, xyz, input_range, num_channels):
        d_out = num_channels // 2
        proj = jax.lax.stop_gradient(self.gauss_B[:, :d_out])
        if self.normalize:
            xyz = shift_scale_points(xyz, src_range=input_range)
        xyz = xyz * (2.0 * np.pi)
        feat = jnp.einsum(
            "bnd,de->bne", xyz, proj, precision=jax.lax.Precision.HIGHEST
        )
        return jnp.concatenate([jnp.sin(feat), jnp.cos(feat)], axis=-1)

    def _sine(self, xyz, input_range, num_channels):
        # per-coordinate interleaved sin/cos at geometric frequencies
        # (reference models/position_embedding.py:42-87)
        if self.normalize:
            xyz = shift_scale_points(xyz, src_range=input_range)
        ndim = num_channels // xyz.shape[-1]
        if ndim % 2 != 0:
            ndim -= 1
        rems = num_channels - ndim * xyz.shape[-1]
        outs = []
        for d in range(xyz.shape[-1]):
            cdim = ndim + (2 if rems > 0 else 0)
            rems -= 2 if rems > 0 else 0
            dim_t = jnp.arange(cdim, dtype=jnp.float32)
            dim_t = self.temperature ** (2 * (dim_t // 2) / cdim)
            pos = xyz[..., d] * self.scale
            pos = pos[..., None] / dim_t
            inter = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])], axis=-1)
            outs.append(inter.reshape(pos.shape[:-1] + (cdim,)))
        return jnp.concatenate(outs, axis=-1)

    def __call__(
        self,
        xyz: jnp.ndarray,
        input_range: tuple[jnp.ndarray, jnp.ndarray],
        num_channels: Optional[int] = None,
    ) -> jnp.ndarray:
        """xyz: (B, N, d_in) -> (B, N, num_channels or d_pos)."""
        num_channels = num_channels or self.d_pos
        xyz = jax.lax.stop_gradient(xyz)
        if self.pos_type == "fourier":
            return self._fourier(xyz, input_range, num_channels)
        return self._sine(xyz, input_range, num_channels)
