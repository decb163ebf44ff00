"""PointNet++-style set abstraction as a flax module over XLA point ops.

TPU-native counterpart of `PointnetSAModuleVotes` from the external CUDA
extension the reference depends on (imported at reference
models/model_3detr.py:8-9; configured at :353-362 for the pre-encoder and
:385-391 for the masked encoder's interim downsampler):

  FPS -> ball query -> group (relative xyz / radius, concat features)
      -> shared MLP (Dense+BN+ReLU per width) -> max-pool over neighbors.

The gather/group stage runs as XLA ops (ov3det.ops.pointcloud); the shared
MLP is a stack of 1x1 "convs" = Dense over the channel axis, which XLA maps
straight onto the MXU batched over (B, M, K).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ov3det.ops import (
    ball_group_auto,
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
)


class PointnetSAModule(nn.Module):
    npoint: int
    radius: float
    nsample: int
    mlp_dims: Sequence[int]
    normalize_xyz: bool = True
    bn_axis_name: Optional[str] = None
    # "bucketed" avoids the O(N log N) top_k selection; statistically
    # equivalent to CUDA first-K under random point order (see ops.ball_query)
    ball_query_method: str = "bucketed"
    fps_shards: int = 1
    dtype: Optional[jnp.dtype] = None  # compute dtype for the shared MLP

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        features: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        """xyz: (B, N, 3); features: (B, N, C) or None.

        Returns (new_xyz (B, npoint, 3), new_features (B, npoint, mlp[-1]),
        fps_inds (B, npoint)).
        """
        inds = furthest_point_sample(xyz, self.npoint, shards=self.fps_shards)
        new_xyz = gather_points(xyz, inds)
        if self.ball_query_method == "bucketed":
            # fused query+group: a VMEM-resident Pallas kernel on TPU, a
            # one-hot MXU contraction elsewhere.  The two paths differ only
            # in which axis carries the K neighbors — the shared MLP acts on
            # the channel axis and the pool reduces K wherever it lives, so
            # neither pays a transpose.
            grouped, k_axis = ball_group_auto(
                xyz, features, new_xyz, self.radius, self.nsample,
                self.normalize_xyz,
            )
        else:
            group_idx = ball_query(xyz, new_xyz, self.radius, self.nsample,
                                   method=self.ball_query_method)
            grouped = group_points(
                xyz, features, new_xyz, group_idx, self.radius, self.normalize_xyz
            )  # (B, M, K, 3 + C)
            k_axis = 2

        h = grouped
        for width in self.mlp_dims:
            h = nn.Dense(width, use_bias=False, dtype=self.dtype)(h)
            h = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.bn_axis_name if train else None,
            )(h)
            h = nn.relu(h)
        new_features = jnp.max(h, axis=k_axis)  # max-pool over the K neighbors
        return new_xyz, new_features, inds
