"""Fused furthest-point-sampling Pallas kernel.

FPS is inherently sequential over the k selections (SURVEY hard-part #1):
the XLA fori_loop version pays per-iteration HBM round trips for the
(B, N) running min-distance vector (~100 ms for 20k points -> 2048 samples
on v5e).  This kernel keeps xyz and the min-distance state resident in VMEM
for all k iterations; each iteration is a handful of VPU passes:

    d2 = |x - last|^2 ; mind2 = min(mind2, d2) ; next = argmax(mind2)
    last = one-hot(next) . xyz        (contraction instead of a gather)

Selection semantics match ov3det.ops.furthest_point_sample exactly
(seed index 0, argmax ties -> lowest index), which is the test oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(x_ref, y_ref, z_ref, out_ref, mind2, lastx, lasty, lastz):
    B, N = x_ref.shape
    K = out_ref.shape[0]  # out is (K, B): dynamic stores go on the major axis
    mind2[:, :] = jnp.full((B, N), 1e10, jnp.float32)
    out_ref[0, :] = jnp.zeros((B,), jnp.int32)
    lastx[:, :] = x_ref[:, 0:1]
    lasty[:, :] = y_ref[:, 0:1]
    lastz[:, :] = z_ref[:, 0:1]

    col = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)

    def body(i, _):
        dx = x_ref[:, :] - lastx[:, :]
        dy = y_ref[:, :] - lasty[:, :]
        dz = z_ref[:, :] - lastz[:, :]
        d2 = dx * dx + dy * dy + dz * dz
        m = jnp.minimum(mind2[:, :], d2)
        mind2[:, :] = m
        nxt = jnp.argmax(m, axis=-1).astype(jnp.int32)  # (B,)
        out_ref[i, :] = nxt
        onehot = (col == nxt[:, None]).astype(jnp.float32)
        lastx[:, :] = jnp.sum(onehot * x_ref[:, :], axis=-1, keepdims=True)
        lasty[:, :] = jnp.sum(onehot * y_ref[:, :], axis=-1, keepdims=True)
        lastz[:, :] = jnp.sum(onehot * z_ref[:, :], axis=-1, keepdims=True)
        return 0

    jax.lax.fori_loop(1, K, body, 0)


@functools.partial(jax.jit, static_argnames=("num_samples", "interpret"))
def furthest_point_sample_pallas(
    xyz: jnp.ndarray, num_samples: int, interpret: bool = False
) -> jnp.ndarray:
    """xyz: (B, N, 3) -> (B, num_samples) int32, VMEM-resident FPS."""
    B, N, _ = xyz.shape
    xyz = jax.lax.stop_gradient(xyz).astype(jnp.float32)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    out = pl.pallas_call(
        _fps_kernel,
        out_shape=jax.ShapeDtypeStruct((num_samples, B), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, N), jnp.float32),
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x, y, z)
    return out.T
