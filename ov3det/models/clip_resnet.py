"""CLIP ModifiedResNet image tower + attention pooling (flax, frozen teacher).

TPU-native counterpart of the RN50x4 visual backbone inside RegionCLIP's
CLIPFastRCNN (external detectron2 dependency of the reference,
models/model_regionclip.py:15-22).  Architecture follows the public CLIP
ModifiedResNet design: 3-conv stem with avgpool, anti-aliased downsampling
(stride-1 convs + avgpool), bottleneck expansion 4, and a final
AttentionPool2d head producing the 640-d joint-embedding feature.

The tower runs in inference mode only (frozen teacher): BatchNorm always
uses running statistics, weights are converted from the RegionCLIP torch
checkpoint via ov3det.models.regionclip.convert_torch_checkpoint.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


class FrozenBatchNorm(nn.Module):
    """Inference-only BatchNorm: y = (x - mean) / sqrt(var + eps) * scale + bias.

    The affine is computed in f32 from the stored stats and applied in the
    tower's compute dtype, so a bfloat16 tower (the TPU-fast configuration)
    folds BN into the surrounding convs without double rounding.
    """

    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        mean = self.param("mean", nn.initializers.zeros, (C,))
        var = self.param("var", nn.initializers.ones, (C,))
        inv = jax.lax.rsqrt(var + self.epsilon)
        w = scale * inv
        b = bias - mean * inv * scale
        if self.dtype is not None:
            w, b = w.astype(self.dtype), b.astype(self.dtype)
            x = x.astype(self.dtype)
        return x * w + b


def _avg_pool(x, window, stride):
    return nn.avg_pool(x, (window, window), strides=(stride, stride))


class QuantConv(nn.Module):
    """W8A8 convolution for the frozen trunk (TPU int8 MXU path).

    Weights are STATIC int8 with one f32 scale per output channel, written
    by `regionclip.quantize_teacher_params` from the f32 checkpoint (the
    teacher is frozen, so post-training quantization needs no QAT).
    Activations are quantized symmetrically per tensor; the conv
    accumulates exactly in int32 on the MXU and the dequant is a single
    fused multiply.  Measured on v5e at the teacher's res5 shape: int8
    conv 1.72x the bf16 conv (the driver of reference
    criterion.py:363-399's teacher cost).

    Two activation-scale modes:
    - static_act=True (production): the scale is a CALIBRATED constant
      (`a_scale` param, written at load by quantize_teacher_params), so
      the round/clip/cast quantize fuses into the preceding BN+relu
      elementwise chain — no extra reduce pass.  A traced abs-max reduce
      + separate quantize pass cost a measured ~10.6 ms/step across the
      ~50 trunk convs of the OV train step (docs/PROFILE.md round 4).
    - static_act=False (calibration): dynamic abs-max scale, and the
      observed abs-max is sown into the `quant_stats` collection
      (max-reduced across calls, e.g. the chunked res5 head) for
      quantize_teacher_params to turn into `a_scale`.

    use_bias=True is the FOLDED-BN production form: the frozen
    FrozenBatchNorm that follows every trunk conv is an affine
    `y*w_c + b_c` with load-time-constant w, b — quantize_teacher_params
    composes it into this conv's dequant (`scale *= w`, `bias = b`) and
    the module graph drops the BN node entirely.  One shorter fused
    elementwise chain per conv (the dequant+BN+relu+requant passes were a
    measured ~42 ms traced / ~20 ms wall of the round-4 OV step,
    docs/PROFILE.md) and exact up to f32 reassociation.
    """

    features: int
    kernel_size: tuple = (1, 1)
    padding: int = 0
    dtype: Optional[jnp.dtype] = None
    static_act: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        C = x.shape[-1]
        kernel_q = self.param(
            "kernel_q", nn.initializers.zeros, (kh, kw, C, self.features), jnp.int8
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        xf = x.astype(jnp.float32)
        if self.static_act:
            s_x = self.param("a_scale", nn.initializers.ones, ())
        else:
            a_max = jnp.max(jnp.abs(xf))
            self.sow(
                "quant_stats", "a_max", a_max,
                init_fn=lambda: jnp.zeros(()), reduce_fn=jnp.maximum,
            )
            s_x = jnp.maximum(a_max, 1e-6) / 127.0
        xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel_q.shape, ("NHWC", "HWIO", "NHWC")
        )
        pad = [(self.padding, self.padding)] * 2
        y = jax.lax.conv_general_dilated(
            xq, kernel_q, (1, 1), pad, dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        out = y.astype(jnp.float32) * (s_x * scale)
        if self.use_bias:  # folded frozen-BN shift (f32, fuses with dequant)
            out = out + self.param("bias", nn.initializers.zeros, (self.features,))
        return out.astype(self.dtype) if self.dtype is not None else out


def _trunk_conv(quant, dtype, features, kernel_size, padding=0, name=None):
    """Conv factory for the trunk: W8A8 QuantConv when `quant` is "folded"
    (production: static act scales + folded-BN bias, no BN module follows),
    "static" (static act scales, separate BN) or "dynamic" (calibration),
    plain nn.Conv when falsy."""
    if quant:
        return QuantConv(features, tuple(kernel_size), padding, dtype,
                         static_act=(quant in ("static", "folded")),
                         use_bias=(quant == "folded"), name=name)
    return nn.Conv(
        features, kernel_size, padding=padding, use_bias=False, dtype=dtype,
        name=name,
    )


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None
    quant: Any = False  # False | "folded" | "static" | "dynamic" (see QuantConv)

    @nn.compact
    def __call__(self, x):
        expansion = 4
        conv = partial(_trunk_conv, self.quant, self.dtype)
        # quant=="folded": the frozen BN affine lives in each QuantConv's
        # dequant constants (quantize_teacher_params), so no BN node here
        folded = self.quant == "folded"
        bn = (lambda name: (lambda y: y)) if folded else (
            lambda name: FrozenBatchNorm(dtype=self.dtype, name=name)
        )
        out = conv(self.planes, (1, 1), name="conv1")(x)
        out = bn(name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, (3, 3), padding=1, name="conv2")(out)
        out = bn(name="bn2")(out)
        out = nn.relu(out)
        if self.stride > 1:  # anti-aliased: avgpool instead of strided conv
            out = _avg_pool(out, self.stride, self.stride)
        out = conv(self.planes * expansion, (1, 1), name="conv3")(out)
        out = bn(name="bn3")(out)

        identity = x
        if self.stride > 1 or x.shape[-1] != self.planes * expansion:
            identity = _avg_pool(x, self.stride, self.stride) if self.stride > 1 else x
            identity = conv(
                self.planes * expansion, (1, 1), name="downsample_conv"
            )(identity)
            identity = bn(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class _ProjParams(nn.Module):
    """Parameter-only stand-in for an nn.Dense whose matmul is folded away.

    Declares the exact {kernel, bias} the checkpoint converter writes for
    the attnpool k/v projections (same names, shapes, and default inits as
    nn.Dense) without running the (tokens x CxC) matmul — see the
    single-query folding note in AttentionPool2d.
    """

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class AttentionPool2d(nn.Module):
    embed_dim: int
    num_heads: int
    spacial_dim: int
    output_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) -> (B, output_dim)."""
        B, H, W, C = x.shape
        # tokens stay in the tower's compute dtype end-to-end: a f32
        # round-trip here costs two full-tensor cast kernels per chunk
        # (~7 ms/step at teacher scale, measured) that the MXU matmuls
        # never amortize.  Only the mean reduction runs in f32 (the pooled
        # query is a 1-token tensor; exactness is free there)...
        tokens = x.reshape(B, H * W, C)
        mean_tok = jnp.mean(tokens.astype(jnp.float32), axis=1, keepdims=True)
        tokens = jnp.concatenate(
            [mean_tok.astype(tokens.dtype), tokens], axis=1
        )  # (B, 1+HW, C)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=C**-0.5),
            (self.spacial_dim**2 + 1, C),
        )
        # checkpoints carry the training-resolution grid; interpolate if the
        # runtime spatial size differs (detectron2 RegionCLIP does the same)
        if pos.shape[0] != H * W + 1:
            cls_pos, grid = pos[:1], pos[1:]
            side = int(round((pos.shape[0] - 1) ** 0.5))
            grid = grid.reshape(side, side, C)
            grid = jax.image.resize(grid, (H, W, C), method="bilinear")
            pos = jnp.concatenate([cls_pos, grid.reshape(H * W, C)], axis=0)
        # ...and the positional add follows the token dtype (the q/k/v
        # Dense layers would round to compute dtype right after anyway)
        tokens = tokens + pos[None].astype(tokens.dtype)

        # Single-query folding: the pool has exactly ONE query (the mean
        # token), so the k/v projections over all 1+HW tokens — the head's
        # dominant FLOPs, ~2.1 GFLOP/region of CxC=2560x2560 matmuls at
        # teacher scale — collapse algebraically:
        #   logits_h(x_k) = q_h . (x_k K_h + b_k,h) = x_k . (K_h q_h) + const_h
        #     (the q.b_k term is a per-head constant shift — softmax-invariant)
        #   sum_k a_k v(x_k)_h = (sum_k a_k x_k) V_h + b_v,h   since sum_k a_k = 1
        # i.e. fold K into a per-head C-vector u_h = K_h q_h, attend over RAW
        # tokens, and apply V to the single pooled token.  ~35x fewer FLOPs,
        # exact up to reassociation (torch-oracle parity-tested).  The params
        # keep nn.Dense's exact {kernel,bias} layout for the converter.
        hd = C // self.num_heads
        nh = self.num_heads
        q = nn.Dense(C, dtype=self.dtype, name="q_proj")(tokens[:, :1])
        k_kernel, _k_bias = _ProjParams(C, name="k_proj")(C)
        v_kernel, v_bias = _ProjParams(C, name="v_proj")(C)
        if self.dtype is not None:  # same promote nn.Dense(dtype=...) applied
            k_kernel = k_kernel.astype(self.dtype)
            v_kernel = v_kernel.astype(self.dtype)
            v_bias = v_bias.astype(self.dtype)
        q = q.reshape(B, nh, hd)
        # u_h = K_h q_h: fold the key projection through the single query
        u = jnp.einsum(
            "bhd,chd->bhc", q, k_kernel.reshape(C, nh, hd), precision=_HI,
            preferred_element_type=jnp.float32,
        ).astype(tokens.dtype)
        attn = jnp.einsum(
            "bkc,bhc->bhk", tokens, u, precision=_HI,
            preferred_element_type=jnp.float32,
        ) / jnp.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        # pooled raw token per head, then one v-projection of that token
        z = jnp.einsum(
            "bhk,bkc->bhc", attn, tokens.astype(jnp.float32), precision=_HI,
        )
        out = jnp.einsum(
            "bhc,chd->bhd", z.astype(v_kernel.dtype), v_kernel.reshape(C, nh, hd),
            precision=_HI, preferred_element_type=jnp.float32,
        ) + v_bias.reshape(nh, hd)
        out = out.reshape(B, 1, C)
        return nn.Dense(self.output_dim, name="c_proj")(out)[:, 0]


class ModifiedResNetStem(nn.Module):
    width: int
    dtype: Optional[jnp.dtype] = None
    quant: Any = False  # False | "static" | "dynamic" (see QuantConv)

    @nn.compact
    def __call__(self, x):
        w = self.width
        conv = partial(_trunk_conv, self.quant, self.dtype)
        folded = self.quant == "folded"
        bn = lambda name: FrozenBatchNorm(dtype=self.dtype, name=name)
        # conv1 stays a plain (bf16) conv even in int8 mode: it reads the
        # 3-channel normalized image (per-channel std does not fold into a
        # per-tensor activation scale) and is <0.5% of trunk FLOPs.  Its
        # bn1 therefore also stays a live module under quant=="folded"
        # (folding only composes BN into QuantConv dequant constants).
        x = nn.Conv(
            w // 2, (3, 3), strides=2, padding=1, use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        x = nn.relu(bn(name="bn1")(x))
        x = conv(w // 2, (3, 3), padding=1, name="conv2")(x)
        x = nn.relu(x if folded else bn(name="bn2")(x))
        x = conv(w, (3, 3), padding=1, name="conv3")(x)
        x = nn.relu(x if folded else bn(name="bn3")(x))
        return _avg_pool(x, 2, 2)


class ResNetStage(nn.Module):
    planes: int
    blocks: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None
    quant: Any = False  # False | "static" | "dynamic" (see QuantConv)

    @nn.compact
    def __call__(self, x):
        x = Bottleneck(self.planes, self.stride, self.dtype, self.quant,
                       name="block0")(x)
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes, 1, self.dtype, self.quant,
                           name=f"block{i}")(x)
        return x


class CLIPResNetBackbone(nn.Module):
    """Stem + res2..res4 (stride 16) — the region-feature trunk."""

    width: int = 80  # RN50x4
    layers: Sequence[int] = (4, 6, 10, 6)
    dtype: Optional[jnp.dtype] = None  # bfloat16 = TPU-fast frozen teacher
    quant: Any = False  # False | "static" | "dynamic" W8A8 trunk convs (QuantConv)

    @nn.compact
    def __call__(self, x):
        w = self.width
        x = ModifiedResNetStem(w, self.dtype, self.quant, name="stem")(x)
        x = ResNetStage(w, self.layers[0], 1, self.dtype, self.quant,
                        name="layer1")(x)
        x = ResNetStage(w * 2, self.layers[1], 2, self.dtype, self.quant,
                        name="layer2")(x)
        x = ResNetStage(w * 4, self.layers[2], 2, self.dtype, self.quant,
                        name="layer3")(x)
        return x  # (B, H/16, W/16, width*16)


class CLIPResNetRes5Head(nn.Module):
    """res5 stage + attention pooling over RoI features."""

    width: int = 80
    blocks: int = 6
    embed_dim: int = 640
    image_resolution: int = 288
    dtype: Optional[jnp.dtype] = None
    quant: Any = False  # False | "static" | "dynamic" (see QuantConv)

    @nn.compact
    def __call__(self, x):
        """x: (R, P, P, width*16) pooled RoI features -> (R, embed_dim)."""
        x = ResNetStage(self.width * 8, self.blocks, 2, self.dtype, self.quant,
                        name="layer4")(x)
        heads = self.width * 32 // 64
        return AttentionPool2d(
            embed_dim=self.width * 32,
            num_heads=heads,
            spacial_dim=self.image_resolution // 32,
            output_dim=self.embed_dim,
            dtype=self.dtype,
            name="attnpool",
        )(x)
