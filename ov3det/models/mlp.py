"""Shared MLP building block with configurable norm/activation/dropout.

TPU-native counterpart of the reference's GenericMLP
(reference models/helpers.py:45-112).  Works channels-last on (..., C)
tensors — the 1x1-conv-vs-linear distinction of the torch version is a
layout artifact that doesn't exist in XLA.

BatchNorm semantics: normalizes each channel over *all* leading axes, which
reproduces the reference's BN1d applied to (N, C, L) activations (batch and
sequence jointly); `bn_axis_name` extends the reduction across the data-
parallel mesh axis, the GSPMD analogue of SyncBatchNorm
(reference main.py:427-431).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

ACTIVATIONS = {
    "relu": nn.relu,
    "gelu": nn.gelu,
    "leakyrelu": lambda x: nn.leaky_relu(x, negative_slope=0.1),
}


class GenericMLP(nn.Module):
    hidden_dims: Sequence[int]
    output_dim: int
    norm: Optional[str] = None  # None | "bn" | "ln"
    activation: str = "relu"
    dropout: Optional[float] = None
    hidden_use_bias: bool = False
    output_use_bias: bool = True
    output_use_activation: bool = False
    output_use_norm: bool = False
    bn_axis_name: Optional[str] = None
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay float32)

    def _norm(self, x, train: bool):
        if self.norm == "bn":
            # flax BatchNorm reduces over every axis but the channel axis,
            # which reproduces the reference BN1d on (N, C, L) activations
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.bn_axis_name if train else None,
            )(x)
        if self.norm == "ln":
            return nn.LayerNorm(epsilon=1e-5)(x)
        return x

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = ACTIVATIONS[self.activation]
        for width in self.hidden_dims:
            x = nn.Dense(width, use_bias=self.hidden_use_bias, kernel_init=self.kernel_init, dtype=self.dtype)(x)
            if self.norm is not None:
                x = self._norm(x, train)
            x = act(x)
            if self.dropout is not None and self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.output_dim, use_bias=self.output_use_bias, kernel_init=self.kernel_init, dtype=self.dtype)(x)
        if self.output_use_norm and self.norm is not None:
            x = self._norm(x, train)
        if self.output_use_activation:
            x = act(x)
        return x
