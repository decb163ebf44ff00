"""Frozen RegionCLIP 2D teacher: region features for given crop boxes.

Counterpart of the reference's detectron2 CLIPFastRCNN usage
(reference models/model_regionclip.py:15-22; invoked from the criterion at
criterion.py:363-399): given full images and per-query projected 2D boxes,
extract 640-d CLIP-space region features:

    image -> ModifiedResNet stem..res4 (stride 16)
          -> RoIAlign(pooler 18x18, scale 1/16) on the predicted boxes
          -> res5 -> AttentionPool -> (B*Q, 640)

Entirely frozen; the distillation loss aligns the detector's
visual_embed_head output with these features (criterion.py:132-141).

Weight conversion from the `regionclip_pretrained-cc_rn50x4.pth` detectron2
checkpoint is provided (convert_torch_checkpoint); with no checkpoint the
tower runs with random weights (useful for tests and wiring).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ov3det.models.clip_resnet import CLIPResNetBackbone, CLIPResNetRes5Head
from ov3det.ops.roi_align import roi_align_batched

# CLIP RGB normalization (the scale detectron2's CLIP models use)
_PIXEL_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32) * 255.0
_PIXEL_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32) * 255.0


class RegionCLIPTeacher(nn.Module):
    width: int = 80  # RN50x4
    layers: tuple = (4, 6, 10, 6)
    embed_dim: int = 640
    pooler_resolution: int = 18
    pooler_scale: float = 1.0 / 16.0
    image_resolution: int = 288
    # compute dtype for the conv trunk AND the attnpool q/k/v projections;
    # "bfloat16" is the TPU-fast frozen-teacher configuration (MXU convs,
    # halved HBM traffic); attention logits/softmax always accumulate in
    # f32. "int8" runs the trunk convs as W8A8 (static per-channel int8
    # weights + static calibrated per-tensor activation scales from
    # quantize_teacher_params, int32 MXU accumulation — ~1.5x the bf16
    # trunk on v5e) with everything else in bfloat16. "int8_calib" is the
    # calibration mode quantize_teacher_params uses internally (dynamic
    # activation scales, observed abs-max sown into `quant_stats`).
    # None = float32 (parity-test setting).
    compute_dtype: Optional[str] = None
    # max regions (B x Q-chunk) per RoI-head pass — bounds HBM (see below)
    roi_chunk_regions: int = 256

    @nn.compact
    def __call__(self, images: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        """images: (B, H, W, 3) raw RGB in [0, 255];
        boxes: (B, Q, 4) [x1, y1, x2, y2] pixels.
        Returns (B, Q, embed_dim) region features."""
        B, Q = boxes.shape[:2]
        # "int8" production mode runs the FOLDED trunk: each QuantConv's
        # dequant constants carry the frozen BN affine (written by
        # quantize_teacher_params) and the BN modules are gone from the
        # graph — one shorter HBM-bound elementwise chain per trunk conv.
        # "int8_calib" keeps live BN modules (calibration runs on the
        # pre-fold tree so the sown abs-max sees the exact same activations)
        quant = {"int8": "folded", "int8_calib": "dynamic"}.get(
            self.compute_dtype, False
        )
        dtype = (
            jnp.bfloat16
            if self.compute_dtype in ("bfloat16", "int8", "int8_calib")
            else None
        )
        # NOTE on canvas padding: SUN RGB-D ships images zero-padded to a
        # fixed 530x730 canvas (reference sunrgbd.py:47), so the backbone
        # convolves padding for smaller frames.  That waste is bounded by
        # the backbone's share of teacher FLOPs — ~7% (stem..res4 at
        # 530x730 is ~87 GFLOP/image vs ~1.2 TFLOP/image for the
        # 128-region RoI head, whose cost is canvas-independent) — so
        # multi-size canvas bucketing would buy <7% and is not worth the
        # per-shape recompiles on this runtime.
        # normalize straight into the compute dtype: the (B,530,730,3)
        # canvas is the biggest tensor the step touches, and emitting f32
        # here doubles the bytes of the layout copy feeding the stem conv
        # (measured 5.7 ms/step of reshape+copy at this line in round 4's
        # trace, docs/PROFILE.md)
        x = (images - _PIXEL_MEAN) * (1.0 / _PIXEL_STD)
        if dtype is not None:
            x = x.astype(dtype)
        feat = CLIPResNetBackbone(
            self.width, self.layers, dtype, quant, name="backbone"
        )(x)
        head = CLIPResNetRes5Head(
            self.width,
            self.layers[3],
            self.embed_dim,
            self.image_resolution,
            dtype,
            quant,
            name="roi_head",
        )
        # RoI pipeline runs in region chunks: at teacher scale (1024 RoIs x
        # 18x18 x 1280ch) the pooled tensor alone is ~850MB and the res5 +
        # f32-attnpool intermediates several GB — chunking bounds the live
        # set to one chunk's worth (the 530x730 B=8 teacher forward fits a
        # 16GB chip with headroom; un-chunked it needs >17GB).  Params are
        # shared across calls (same flax module instance).
        P = self.pooler_resolution
        chunk_q = max(1, min(Q, self.roi_chunk_regions // max(B, 1)))
        embs = []
        for q0 in range(0, Q, chunk_q):
            boxes_c = boxes[:, q0 : q0 + chunk_q]
            qc = boxes_c.shape[1]
            pooled = roi_align_batched(
                feat,
                boxes_c,
                spatial_scale=self.pooler_scale,
                output_size=P,
            ).reshape(B * qc, P, P, -1)
            embs.append(head(pooled).reshape(B, qc, self.embed_dim))
        return jnp.concatenate(embs, axis=1) if len(embs) > 1 else embs[0]


def cast_teacher_params(variables, compute_dtype: Optional[str] = "bfloat16"):
    """Pre-cast the frozen tower's matmul weights to the compute dtype.

    flax's promote_dtype re-casts every f32 param to the module dtype on
    EVERY apply — at RN50x4 scale that is ~350MB of f32 reads and ~1000
    cast kernels inside each train step (~7 ms/step measured on v5e).  The
    teacher is frozen, so cast once at load time; numerics are identical
    (same f32->bf16 rounding, just hoisted out of the step).

    Kept in f32: FrozenBatchNorm stats (folded in f32 before applying) and
    the attnpool c_proj (the head's f32 output projection).
    """
    if compute_dtype != "bfloat16":
        return variables

    def walk(tree, path):
        out = {}
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, dict):
                if "kernel_q" in v:  # already-quantized W8A8 conv: int8
                    out[k] = v       # kernel + f32 dequant scale stay as-is
                else:
                    out[k] = walk(v, p)
            elif (
                "c_proj" not in p
                # the attnpool positional grid may be bilinearly resized at
                # apply time — resizing a pre-rounded bf16 grid diverges
                # from the module's f32-resize-then-cast; keep it f32 (tiny)
                and p[-1] != "positional_embedding"
                and not (len(p) > 1 and (p[-2].startswith("bn") or p[-2] == "downsample_bn"))
                and v.dtype == jnp.float32
            ):
                out[k] = v.astype(jnp.bfloat16)
            else:
                out[k] = v
        return out

    import flax.core

    raw = flax.core.unfreeze(variables) if not isinstance(variables, dict) else variables
    return walk(raw, ())


def _bilinear_upsample_np(low: np.ndarray, H: int, W: int) -> np.ndarray:
    """(h, w, C) -> (H, W, C) separable bilinear resize, pure numpy (no
    scipy/cv2 dependency in the package)."""
    h, w, _ = low.shape

    def axis_lerp(a, n_out, axis):
        n_in = a.shape[axis]
        pos = np.linspace(0.0, n_in - 1.0, n_out, dtype=np.float32)
        i0 = np.floor(pos).astype(np.int64)
        i1 = np.minimum(i0 + 1, n_in - 1)
        t = (pos - i0).astype(np.float32)
        lo = np.take(a, i0, axis=axis)
        hi = np.take(a, i1, axis=axis)
        shape = [1] * a.ndim
        shape[axis] = n_out
        return lo + (hi - lo) * t.reshape(shape)

    return axis_lerp(axis_lerp(low.astype(np.float32), H, 0), W, 1)


def _smooth_calibration_images(rng, B: int, H: int, W: int) -> np.ndarray:
    """Default PTQ calibration content: low-frequency bilinear base +-30
    per-pixel luma detail — the activation distribution real (4:2:0 JPEG)
    camera content drives, unlike uniform noise (see quantize docstring)."""
    low = rng.uniform(30.0, 225.0, size=(B, H // 8 + 1, W // 8 + 1, 3))
    base = np.stack([_bilinear_upsample_np(low[b], H, W) for b in range(B)])
    luma = rng.uniform(-30.0, 30.0, size=(B, H, W, 1))
    return np.clip(base + luma, 0.0, 255.0).astype(np.float32)


def quantize_teacher_params(
    variables,
    compute_dtype: Optional[str] = "int8",
    teacher: Optional[RegionCLIPTeacher] = None,
    calib: Optional[tuple] = None,
    calib_margin: float = 1.25,
):
    """Post-training W8A8 quantization of the frozen trunk (load-time, host).

    Maps every trunk conv's f32 `kernel` to the int8 `kernel_q` + per-output-
    channel f32 `scale` pair QuantConv expects (symmetric abs-max grid; the
    teacher is frozen, so static weight scales need no calibration data),
    CALIBRATES one static per-tensor activation scale per conv (`a_scale`),
    then bf16-casts the rest of the tower exactly like cast_teacher_params.
    Excluded from quantization, matching the module structure:
    - the stem's conv1 (3-channel image input; <0.5% of trunk FLOPs),
    - the attnpool projections (Dense kernels WITH biases — never matched
      by the kernel-only rule) and batch-norm statistics.

    Activation calibration: ONE forward of the int8-weight tower in
    "int8_calib" mode on the CPU backend (no device program is ever stood
    up at load) records each conv input's abs-max via the `quant_stats`
    collection; a_scale = abs_max * calib_margin / 127.  The margin covers
    range excursions beyond the calibration batch — values past it clip
    symmetrically at +-127, the standard PTQ trade (fidelity vs f32 is
    golden-tested at true RN50x4 width in tests/test_teacher_parity.py,
    with calibration and evaluation on DIFFERENT images).
    `teacher` supplies the tower hyperparameters; `calib` is an optional
    (images, boxes) pair — real samples when the caller has them, else a
    deterministic synthetic batch.

    Use with RegionCLIPTeacher(compute_dtype="int8").  With any other
    compute_dtype this falls through to cast_teacher_params semantics.
    """
    if compute_dtype != "int8":
        return cast_teacher_params(variables, compute_dtype)
    if teacher is None:
        raise ValueError(
            "int8 quantization calibrates activation scales with one "
            "forward pass — pass the RegionCLIPTeacher module"
        )

    import flax.core

    def quant_kernel(w):
        w = np.asarray(w, np.float32)
        s = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0
        s = np.maximum(s, 1e-12).astype(np.float32)
        q = np.clip(np.rint(w / s), -127, 127).astype(np.int8)
        return q, s

    raw = flax.core.unfreeze(variables) if not isinstance(variables, dict) else dict(variables)

    def walk(tree, path):
        out = {}
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, dict):
                if (
                    set(v) == {"kernel"}
                    and getattr(v["kernel"], "ndim", 0) == 4
                    and not (len(p) >= 2 and p[-2] == "stem" and k == "conv1")
                ):
                    q, s = quant_kernel(v["kernel"])
                    out[k] = {"kernel_q": jnp.asarray(q), "scale": jnp.asarray(s)}
                else:
                    out[k] = walk(v, p)
            else:
                out[k] = v
        return out

    qvars = cast_teacher_params(walk(raw, ()), "bfloat16")

    # --- activation-scale calibration (host CPU, one forward) -------------
    if calib is None:
        rng = np.random.default_rng(0)
        ih = iw = max(64, int(teacher.image_resolution))
        # SMOOTH synthetic content, not uniform noise: camera images are
        # low-frequency with sparse edges, and uniform per-pixel noise
        # drives early-conv activations to ranges real content never
        # reaches (over-wide a_scale = wasted int8 resolution on every
        # real image).  Low-frequency bilinear base + mild per-pixel luma
        # detail mirrors what the yuv fidelity tests use.
        images = _smooth_calibration_images(rng, 1, ih, iw)
        x1 = rng.uniform(0, iw * 0.5, size=(1, 8)).astype(np.float32)
        y1 = rng.uniform(0, ih * 0.5, size=(1, 8)).astype(np.float32)
        boxes = np.stack(
            [x1, y1,
             np.minimum(x1 + rng.uniform(8, iw * 0.5, (1, 8)), iw - 1.0),
             np.minimum(y1 + rng.uniform(8, ih * 0.5, (1, 8)), ih - 1.0)],
            axis=-1,
        ).astype(np.float32)
    else:
        images, boxes = calib
    calib_teacher = teacher.clone(compute_dtype="int8_calib")
    cpu = jax.local_devices(backend="cpu")[0]
    qvars_cpu = jax.device_put(qvars, cpu)
    with jax.default_device(cpu):
        _, collections = calib_teacher.apply(
            qvars_cpu,
            jnp.asarray(np.asarray(images, np.float32)),
            jnp.asarray(np.asarray(boxes, np.float32)),
            mutable=["quant_stats"],
        )
    stats = collections["quant_stats"]

    def inject(ptree, stree):
        for k, v in stree.items():
            if isinstance(v, dict) and "a_max" not in v:
                inject(ptree[k], v)
            else:  # leaf module holding the sown a_max
                a_max = float(np.asarray(v["a_max"]).max())
                ptree[k]["a_scale"] = jnp.float32(
                    max(a_max, 1e-6) * calib_margin / 127.0
                )

    inject(qvars["params"], stats)

    # --- fold the frozen BN affine into each QuantConv's dequant ----------
    # Every quantized trunk conv is immediately followed by a FrozenBatchNorm
    # (convN -> bnN, downsample_conv -> downsample_bn); its inference affine
    # y*w_c + b_c is a load-time constant, so compose it into the conv's
    # per-channel dequant (scale *= w, bias = b) and DELETE the BN subtree —
    # the "int8" module graph (quant=="folded") declares no BN after
    # quantized convs.  Exact up to f32 reassociation (the BN previously
    # applied in the compute dtype AFTER the dequant cast; folding applies
    # it in f32 BEFORE the cast — slightly more precise).  The round-4
    # trace motivates this: the dequant+BN+relu+requant chains between
    # trunk convs were ~42 ms traced of pure HBM passes (docs/PROFILE.md).
    eps = 1e-5  # FrozenBatchNorm.epsilon

    def fold(tree):
        for k in list(tree):
            if k not in tree:  # bn entry already popped by its conv
                continue
            v = tree[k]
            if not isinstance(v, dict):
                continue
            if "kernel_q" in v:
                bn_key = (
                    "downsample_bn" if k == "downsample_conv" else "bn" + k[-1]
                )
                bn = tree.pop(bn_key)  # KeyError = structural bug, want loud
                var = np.asarray(bn["var"], np.float32)
                w = np.asarray(bn["scale"], np.float32) / np.sqrt(var + eps)
                b = (
                    np.asarray(bn["bias"], np.float32)
                    - np.asarray(bn["mean"], np.float32) * w
                )
                v["scale"] = jnp.asarray(np.asarray(v["scale"], np.float32) * w)
                v["bias"] = jnp.asarray(b)
            else:
                fold(v)

    fold(qvars["params"])
    return qvars


def make_teacher_fn(teacher: RegionCLIPTeacher, per_layer: bool = False):
    """Build the criterion hook: (variables, batch, outputs) -> region feats.

    The frozen weights are an ARGUMENT of the returned function, not a
    closure capture: a closed-over 87M-param tree would be baked into the
    jitted train step as HLO constants — a ~350MB program that remote
    compile services reject outright (and that recompiles on every weight
    change).  The engine threads the weights through TrainState.frozen.

    per_layer=False (default) hoists the teacher out of the aux-layer loop:
    features are computed once on the FINAL decoder layer's boxes and reused
    for every aux loss.  per_layer=True reproduces the reference exactly —
    it re-runs the teacher on every decoder layer's boxes
    (criterion.py:434-442), ~L x the teacher cost.  NOTE: on the
    remote-tunnel runtime this repo benches on, the x8-unrolled program is
    additionally penalized far beyond 8x by program-size dispatch
    pathology (measured 0.062 scenes/s vs the ~8x-of-hoisted expectation;
    the same runtime runs lax.scan/while bodies 2-3x slow, so neither
    formulation is cheap there).  per_layer is therefore an opt-in parity
    mode — the hoisted default is the supported production configuration,
    and the criterion's per-layer losses still consume the (shared)
    features exactly as the reference's do.

    Expects batches from the SUN RGB-D loader with `image` as a zero-padded
    (B, H, W, 3) canvas plus per-sample image_height/image_width and
    calibration matrices.
    """
    from ov3det.utils.calibration import SunrgbdCalibration, project_boxes_to_image

    def _project(batch, outputs, layer_slice):
        calib = SunrgbdCalibration(batch["calib_Rtilt"], batch["calib_K"])
        return project_boxes_to_image(
            calib,
            jax.lax.stop_gradient(outputs["center_unnormalized"][layer_slice]),
            jax.lax.stop_gradient(outputs["size_unnormalized"][layer_slice]),
            jax.lax.stop_gradient(outputs["angle_continuous"][layer_slice]),
            image_hw=jnp.stack([batch["image_height"], batch["image_width"]], -1),
        )

    def teacher_fn(variables, batch, outputs):
        if not per_layer:
            boxes = _project(batch, outputs, -1)  # (B, Q, 4)
            feats = teacher.apply(variables, batch["image"], boxes)
            return jax.lax.stop_gradient(feats)  # (B, Q, C)
        L = outputs["center_unnormalized"].shape[0]
        # unrolled python loop, not lax.map: the teacher body is heavy
        # (26-block conv tower + chunked RoI head) and scan-wrapping it
        # measured ~30x slower than the same work unrolled on the target
        # runtime; L=8 copies of a shared-weight body dedupe fine in XLA
        feats = jnp.stack(
            [
                teacher.apply(variables, batch["image"], _project(batch, outputs, l))
                for l in range(L)
            ]
        )  # (L, B, Q, C)
        return jax.lax.stop_gradient(feats)

    return teacher_fn


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------


def _bn(params, prefix):
    return {
        "scale": params[f"{prefix}.weight"],
        "bias": params[f"{prefix}.bias"],
        "mean": params[f"{prefix}.running_mean"],
        "var": params[f"{prefix}.running_var"],
    }


def _conv(params, key):
    # torch OIHW -> flax HWIO
    return {"kernel": np.transpose(params[key], (2, 3, 1, 0))}


def _block(params, prefix):
    out = {
        "conv1": _conv(params, f"{prefix}.conv1.weight"),
        "bn1": _bn(params, f"{prefix}.bn1"),
        "conv2": _conv(params, f"{prefix}.conv2.weight"),
        "bn2": _bn(params, f"{prefix}.bn2"),
        "conv3": _conv(params, f"{prefix}.conv3.weight"),
        "bn3": _bn(params, f"{prefix}.bn3"),
    }
    if f"{prefix}.downsample.0.weight" in params:
        out["downsample_conv"] = _conv(params, f"{prefix}.downsample.0.weight")
        out["downsample_bn"] = _bn(params, f"{prefix}.downsample.1")
    return out


def _stage(params, prefix, blocks):
    return {f"block{i}": _block(params, f"{prefix}.{i}") for i in range(blocks)}


def convert_torch_checkpoint(
    path: str, layers=(4, 6, 10, 6), visual_prefix: Optional[str] = None
) -> dict:
    """Convert a RegionCLIP/CLIP torch checkpoint into this module's params.

    Accepts either a raw CLIP state dict (keys `visual.*`) or a detectron2
    RegionCLIP checkpoint ({"model": {"backbone.visual.*": ...}}).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("model", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    if visual_prefix is None:
        for cand in ("backbone.visual", "visual", "backbone"):
            if any(k.startswith(cand + ".conv1") for k in sd):
                visual_prefix = cand
                break
    assert visual_prefix is not None, f"no visual tower found in {list(sd)[:5]}"
    v = {k[len(visual_prefix) + 1:]: a for k, a in sd.items() if k.startswith(visual_prefix + ".")}

    backbone = {
        "stem": {
            "conv1": _conv(v, "conv1.weight"),
            "bn1": _bn(v, "bn1"),
            "conv2": _conv(v, "conv2.weight"),
            "bn2": _bn(v, "bn2"),
            "conv3": _conv(v, "conv3.weight"),
            "bn3": _bn(v, "bn3"),
        },
        "layer1": _stage(v, "layer1", layers[0]),
        "layer2": _stage(v, "layer2", layers[1]),
        "layer3": _stage(v, "layer3", layers[2]),
    }
    embed_dim_in = v["attnpool.k_proj.weight"].shape[1]
    attnpool = {
        "positional_embedding": v["attnpool.positional_embedding"],
        "q_proj": {
            "kernel": v["attnpool.q_proj.weight"].T,
            "bias": v["attnpool.q_proj.bias"],
        },
        "k_proj": {
            "kernel": v["attnpool.k_proj.weight"].T,
            "bias": v["attnpool.k_proj.bias"],
        },
        "v_proj": {
            "kernel": v["attnpool.v_proj.weight"].T,
            "bias": v["attnpool.v_proj.bias"],
        },
        "c_proj": {
            "kernel": v["attnpool.c_proj.weight"].T,
            "bias": v["attnpool.c_proj.bias"],
        },
    }
    roi_head = {"layer4": _stage(v, "layer4", layers[3]), "attnpool": attnpool}
    del embed_dim_in
    return {"params": {"backbone": backbone, "roi_head": roi_head}}
