"""Convert reference-format (torch) 3DETR checkpoints into ov3det params.

The reference trains torch Model3DETR (reference models/model_3detr.py) and
the upstream 3DETR project publishes golden checkpoints
(reference utils/download_weights.py:9-37).  This converter maps a torch
state_dict — `{"model": {...}}` or a raw state_dict — onto this framework's
flax variable tree (params + batch_stats + frozen), enabling AP-parity
evaluation of reference-trained weights.

Key layout facts encoded here:
  * GenericMLP is an nn.Sequential "layers" whose indices depend on
    (hidden count, norm?, dropout?, output norm/activation)
    (reference models/helpers.py:45-112);
  * torch nn.MultiheadAttention packs q/k/v into in_proj_weight
    (reference models/transformer.py:223,307-308);
  * Conv1d 1x1 weights (out, in, 1) are this framework's Dense kernels
    transposed;
  * BatchNorm running stats land in the `batch_stats` collection;
  * the frozen text-embedding classifier (mlp_heads.sem_cls_head.weight)
    lands in the `frozen` collection.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _t(a):
    return np.asarray(a)


def _conv1d_kernel(w):  # (out, in, 1) -> (in, out)
    return _t(w)[:, :, 0].T


def _attn(sd: Dict[str, np.ndarray], prefix: str, num_heads: int) -> dict:
    d = sd[f"{prefix}.in_proj_weight"].shape[1]
    hd = d // num_heads
    qw, kw, vw = np.split(_t(sd[f"{prefix}.in_proj_weight"]), 3, axis=0)
    qb, kb, vb = np.split(_t(sd[f"{prefix}.in_proj_bias"]), 3, axis=0)

    def proj(w, b):
        return {
            "kernel": w.T.reshape(d, num_heads, hd),
            "bias": b.reshape(num_heads, hd),
        }

    return {
        "query": proj(qw, qb),
        "key": proj(kw, kb),
        "value": proj(vw, vb),
        "out": {
            "kernel": _t(sd[f"{prefix}.out_proj.weight"]).T.reshape(num_heads, hd, d),
            "bias": _t(sd[f"{prefix}.out_proj.bias"]),
        },
    }


def _ln(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _generic_mlp(sd, prefix, num_hidden, norm=True, dropout=False,
                 output_norm=False):
    """Map a reference GenericMLP Sequential onto Dense_i/BatchNorm_i params.

    Sequential layout per hidden layer: conv, [norm], act, [dropout];
    then the output conv, [output norm], [output act]
    (reference models/helpers.py:73-98)."""
    params, stats = {}, {}
    idx = 0
    for i in range(num_hidden):
        params[f"Dense_{i}"] = {"kernel": _conv1d_kernel(sd[f"{prefix}.layers.{idx}.weight"])}
        if f"{prefix}.layers.{idx}.bias" in sd:
            params[f"Dense_{i}"]["bias"] = _t(sd[f"{prefix}.layers.{idx}.bias"])
        idx += 1
        if norm:
            params[f"BatchNorm_{i}"] = _ln(sd, f"{prefix}.layers.{idx}")
            stats[f"BatchNorm_{i}"] = {
                "mean": _t(sd[f"{prefix}.layers.{idx}.running_mean"]),
                "var": _t(sd[f"{prefix}.layers.{idx}.running_var"]),
            }
            idx += 1
        idx += 1  # activation
        if dropout:
            idx += 1
    params[f"Dense_{num_hidden}"] = {
        "kernel": _conv1d_kernel(sd[f"{prefix}.layers.{idx}.weight"])
    }
    if f"{prefix}.layers.{idx}.bias" in sd:
        params[f"Dense_{num_hidden}"]["bias"] = _t(sd[f"{prefix}.layers.{idx}.bias"])
    idx += 1
    if output_norm:
        params[f"BatchNorm_{num_hidden}"] = _ln(sd, f"{prefix}.layers.{idx}")
        stats[f"BatchNorm_{num_hidden}"] = {
            "mean": _t(sd[f"{prefix}.layers.{idx}.running_mean"]),
            "var": _t(sd[f"{prefix}.layers.{idx}.running_var"]),
        }
    return params, stats


def _pointnet_sa(sd, prefix, num_layers=3):
    """PointnetSAModuleVotes shared MLP: mlp_module.layer{i}.conv/bn
    (external pointnet2; conv2d 1x1 + BatchNorm2d)."""
    params, stats = {}, {}
    for i in range(num_layers):
        conv_key = f"{prefix}.mlp_module.layer{i}.conv.weight"
        if conv_key not in sd:  # some exports use .0/.1 indices
            conv_key = f"{prefix}.mlp_module.layer{i}.weight"
        w = _t(sd[conv_key])  # (out, in, 1, 1)
        params[f"Dense_{i}"] = {"kernel": w[:, :, 0, 0].T}
        for bn_prefix in (
            f"{prefix}.mlp_module.layer{i}.bn.bn",
            f"{prefix}.mlp_module.layer{i}.bn",
        ):
            if f"{bn_prefix}.weight" in sd:
                params[f"BatchNorm_{i}"] = _ln(sd, bn_prefix)
                stats[f"BatchNorm_{i}"] = {
                    "mean": _t(sd[f"{bn_prefix}.running_mean"]),
                    "var": _t(sd[f"{bn_prefix}.running_var"]),
                }
                break
    return params, stats


def _enc_layer(sd, prefix, num_heads):
    return {
        "MultiHeadDotProductAttention_0": _attn(sd, f"{prefix}.self_attn", num_heads),
        "LayerNorm_0": _ln(sd, f"{prefix}.norm1"),
        "LayerNorm_1": _ln(sd, f"{prefix}.norm2"),
        "Dense_0": {
            "kernel": _t(sd[f"{prefix}.linear1.weight"]).T,
            "bias": _t(sd[f"{prefix}.linear1.bias"]),
        },
        "Dense_1": {
            "kernel": _t(sd[f"{prefix}.linear2.weight"]).T,
            "bias": _t(sd[f"{prefix}.linear2.bias"]),
        },
    }


def _dec_layer(sd, prefix, num_heads):
    out = _enc_layer(sd, prefix, num_heads)
    out["MultiHeadDotProductAttention_1"] = _attn(
        sd, f"{prefix}.multihead_attn", num_heads
    )
    out["LayerNorm_2"] = _ln(sd, f"{prefix}.norm3")
    return out


def convert_3detr_checkpoint(
    state_dict: Dict[str, np.ndarray],
    enc_layers: int = 3,
    dec_layers: int = 8,
    enc_heads: int = 4,
    dec_heads: int = 4,
    enc_kind: str = "vanilla",
) -> dict:
    """torch state_dict -> {"params", "batch_stats", "frozen"} trees."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in state_dict.items()}
    params, stats = {}, {}

    p, s = _pointnet_sa(sd, "pre_encoder")
    params["pre_encoder"], stats["pre_encoder"] = p, s

    enc = {}
    for i in range(enc_layers):
        enc[f"TransformerEncoderLayer_{i}"] = _enc_layer(
            sd, f"encoder.layers.{i}", enc_heads
        )
    if enc_kind == "masked":
        # the interim SA module is instantiated in Model3DETR's own scope
        # (then *called* inside the masked encoder), so its variables live
        # at the top level, not under encoder/
        p, s = _pointnet_sa(sd, "encoder.interim_downsampling")
        params["interim_downsample"], stats["interim_downsample"] = p, s
    params["encoder"] = enc

    hidden = 1 if enc_kind == "masked" else 2
    p, s = _generic_mlp(
        sd, "encoder_to_decoder_projection", hidden, norm=True, output_norm=True
    )
    params["encoder_to_decoder_projection"] = p
    stats["encoder_to_decoder_projection"] = s

    params["pos_embedding"] = {"gauss_B": _t(sd["pos_embedding.gauss_B"])}
    p, _ = _generic_mlp(sd, "query_projection", 1, norm=False)
    params["query_projection"] = p

    dec = {"LayerNorm_0": _ln(sd, "decoder.norm")}
    for i in range(dec_layers):
        dec[f"TransformerDecoderLayer_{i}"] = _dec_layer(
            sd, f"decoder.layers.{i}", dec_heads
        )
    params["decoder"] = dec

    for head in ("visual_embed_head", "center_head", "size_head",
                 "angle_cls_head", "angle_residual_head"):
        if f"mlp_heads.{head}.layers.0.weight" in sd:
            p, s = _generic_mlp(sd, f"mlp_heads.{head}", 2, norm=True, dropout=True)
            params[head] = p
            stats[head] = s
    if "mlp_heads.angle_residual_head.layers.0.weight" not in sd and \
            "mlp_heads.angle_reg_head.layers.0.weight" in sd:
        p, s = _generic_mlp(sd, "mlp_heads.angle_reg_head", 2, norm=True, dropout=True)
        params["angle_residual_head"] = p
        stats["angle_residual_head"] = s

    frozen = {}
    if "mlp_heads.sem_cls_head.weight" in sd:
        frozen["text_embed"] = _t(sd["mlp_heads.sem_cls_head.weight"])

    return {"params": params, "batch_stats": stats, "frozen": frozen}


def load_reference_checkpoint(path: str, **kwargs) -> dict:
    """Load a reference .pth checkpoint file and convert it."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("model", ckpt)
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
          for k, v in sd.items()}
    return convert_3detr_checkpoint(sd, **kwargs)
