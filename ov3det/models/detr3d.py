"""3DETR open-vocabulary detector (flax).

Counterpart of the reference's Model3DETR + BoxProcessor
(reference models/model_3detr.py:19-350), redesigned channels-last and
fully shape-static for XLA:

  pre-encoder SA (N pts -> 2048 tokens) -> transformer encoder
  -> enc->dec projection -> FPS query seeds + Fourier pos embeds
  -> 8-layer decoder (all intermediates kept, stacked on a leading L axis)
  -> 6 MLP heads -> box decode.

Open-vocabulary classification head: the class logits are the product of
the predicted 640-d visual embedding with a FROZEN CLIP text-embedding
matrix (reference models/model_3detr.py:151-154), stored in the separate
"frozen" variable collection so the optimizer never touches or decays it.

NOTE a genuine reference bug fixed here (capabilities, not bugs): the fork
applies its Linear sem_cls_head to the already-(LB, Q, C)-transposed
visual embeds but keeps the conv-era `.transpose(1, 2)`
(reference models/model_3detr.py:240), so the flat `.reshape(L, B, Q, -1)`
at :252 reinterprets each (nclass, Q) block as (Q, nclass) — the
reference's sem_cls_logits / sem_cls_prob / objectness_prob are
query-class scrambled (verified numerically in tests/test_fullmodel.py).
ov3det computes the intended logits; the forward-parity test de-scrambles
the reference output before comparing.

All per-decoder-layer outputs are returned stacked with a leading layer
axis instead of the reference's list-of-dicts (model_3detr.py:264-315);
index [-1] is the final prediction, [:-1] are the aux outputs.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ov3det.config import ModelConfig
from ov3det.geometry import (
    bin_to_angle,
    corners_from_upright_depth_param,
    shift_scale_points,
)
from ov3det.models.mlp import GenericMLP
from ov3det.models.pointnet import PointnetSAModule
from ov3det.models.pos_embed import PositionEmbeddingCoords
from ov3det.models.transformer import (
    MaskedTransformerEncoder,
    TransformerDecoder,
    TransformerEncoder,
)
from ov3det.ops import furthest_point_sample, gather_points


def decode_boxes(
    *,
    center_offset: jnp.ndarray,  # (L, B, Q, 3) in [-0.5, 0.5]
    size_normalized: jnp.ndarray,  # (L, B, Q, 3) in [0, 1]
    angle_logits: jnp.ndarray,  # (L, B, Q, nbins)
    angle_residual: jnp.ndarray,  # (L, B, Q, nbins), radians
    query_xyz: jnp.ndarray,  # (B, Q, 3)
    pc_min: jnp.ndarray,  # (B, 3)
    pc_max: jnp.ndarray,  # (B, 3)
    num_angle_bin: int,
):
    """Head outputs -> boxes; the BoxProcessor (reference model_3detr.py:19-69)."""
    L, B, Q, _ = center_offset.shape
    center_unnorm = query_xyz[None] + center_offset  # (L, B, Q, 3)
    flat_center = center_unnorm.reshape(L * B, Q, 3)
    rng_min = jnp.tile(pc_min, (L, 1))
    rng_max = jnp.tile(pc_max, (L, 1))
    center_norm = shift_scale_points(flat_center, (rng_min, rng_max)).reshape(
        L, B, Q, 3
    )

    scene_scale = jnp.clip(pc_max - pc_min, 1e-1)  # (B, 3)
    size_unnorm = size_normalized * scene_scale[None, :, None, :]

    if num_angle_bin > 1:
        pred_bin = jax.lax.stop_gradient(jnp.argmax(angle_logits, axis=-1))
        residual = jnp.take_along_axis(angle_residual, pred_bin[..., None], axis=-1)[
            ..., 0
        ]
        angle = bin_to_angle(pred_bin, residual, num_angle_bin, to_label_format=True)
    else:
        # no-rotation datasets: zero angle but keep graph deps harmless
        angle = jnp.zeros(angle_logits.shape[:-1], angle_logits.dtype)

    corners = corners_from_upright_depth_param(center_unnorm, size_unnorm, angle)
    return center_norm, center_unnorm, size_unnorm, angle, corners


class Model3DETR(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, inputs: dict, train: bool = False, encoder_only: bool = False):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        pc = inputs["point_clouds"]
        pc_min = inputs["point_cloud_dims_min"][..., :3]
        pc_max = inputs["point_cloud_dims_max"][..., :3]
        xyz = pc[..., :3]
        feats = pc[..., 3:] if pc.shape[-1] > 3 else None

        # --- pre-encoder set abstraction (reference model_3detr.py:353-362)
        pre_xyz, pre_feats, _pre_inds = PointnetSAModule(
            npoint=cfg.preenc_npoints,
            radius=cfg.preenc_radius,
            nsample=cfg.preenc_nsample,
            mlp_dims=tuple(cfg.preenc_mlp[:-1]) + (cfg.encoder.dim,),
            fps_shards=cfg.fps_shards,
            ball_query_method=cfg.ball_query_method,
            dtype=dtype,
            name="pre_encoder",
        )(xyz, feats, train=train)

        # --- encoder
        enc = cfg.encoder
        if enc.kind == "masked":
            interim = PointnetSAModule(
                npoint=cfg.preenc_npoints // 2,
                radius=cfg.interim_radius,
                nsample=cfg.interim_nsample,
                mlp_dims=tuple(cfg.interim_mlp[:-1]) + (enc.dim,),
                fps_shards=min(cfg.fps_shards, 4),
                ball_query_method=cfg.ball_query_method,
                dtype=dtype,
                name="interim_downsample",
            )
            encoder = MaskedTransformerEncoder(
                num_layers=enc.num_layers,
                dim=enc.dim,
                masking_radius=enc.masking_radius,
                interim_downsample=interim,
                num_heads=enc.num_heads,
                ffn_dim=enc.ffn_dim,
                dropout=enc.dropout,
                activation=enc.activation,
                dtype=dtype,
                name="encoder",
            )
        elif enc.kind == "vanilla":
            encoder = TransformerEncoder(
                num_layers=enc.num_layers,
                dim=enc.dim,
                num_heads=enc.num_heads,
                ffn_dim=enc.ffn_dim,
                dropout=enc.dropout,
                activation=enc.activation,
                dtype=dtype,
                name="encoder",
            )
        else:
            raise ValueError(f"unknown encoder kind {enc.kind}")
        enc_xyz, enc_feats, _ = encoder(pre_feats, pre_xyz, train=train)

        # --- encoder -> decoder projection (reference model_3detr.py:106-120)
        proj_hidden = [enc.dim] if enc.kind == "masked" else [enc.dim, enc.dim]
        enc_feats = GenericMLP(
            hidden_dims=proj_hidden,
            output_dim=cfg.decoder.dim,
            norm="bn",
            output_use_activation=True,
            output_use_norm=True,
            output_use_bias=False,
            name="encoder_to_decoder_projection",
        )(enc_feats, train=train)

        if encoder_only:
            return enc_xyz, enc_feats

        pos_embedding = PositionEmbeddingCoords(
            d_pos=cfg.decoder.dim, pos_type=cfg.pos_embed, name="pos_embedding"
        )

        # --- query seeds via FPS over encoder tokens (model_3detr.py:173-186)
        query_inds = furthest_point_sample(enc_xyz, cfg.num_queries, shards=cfg.query_fps_shards)
        query_xyz = gather_points(enc_xyz, query_inds)
        query_embed = GenericMLP(
            hidden_dims=[cfg.decoder.dim],
            output_dim=cfg.decoder.dim,
            hidden_use_bias=True,
            output_use_activation=True,
            name="query_projection",
        )(pos_embedding(query_xyz, (pc_min, pc_max)), train=train)
        enc_pos = pos_embedding(enc_xyz, (pc_min, pc_max))

        # --- decoder (all intermediates)
        tgt = jnp.zeros_like(query_embed)
        box_features = TransformerDecoder(
            num_layers=cfg.decoder.num_layers,
            dim=cfg.decoder.dim,
            num_heads=cfg.decoder.num_heads,
            ffn_dim=cfg.decoder.ffn_dim,
            dropout=cfg.decoder.dropout,
            dtype=dtype,
            name="decoder",
        )(tgt, enc_feats, query_pos=query_embed, mem_pos=enc_pos, train=train)
        # box_features: (L, B, Q, C)

        # --- MLP heads (reference model_3detr.py:138-171). BatchNorm inside
        # reduces over (L, B, Q) jointly, matching the reference's fold of
        # num_layers into the batch dim (model_3detr.py:227-234).
        def head(out_dim, name):
            return GenericMLP(
                hidden_dims=[cfg.decoder.dim, cfg.decoder.dim],
                output_dim=out_dim,
                norm="bn",
                dropout=cfg.mlp_dropout,
                dtype=dtype,
                name=name,
            )

        visual_embeds = head(cfg.clip_embed_dim, "visual_embed_head")(
            box_features, train=train
        )
        # frozen open-vocab classifier: CLIP text-embedding matrix
        text_embed = self.variable(
            "frozen",
            "text_embed",
            lambda: jax.random.normal(
                jax.random.PRNGKey(0), (cfg.num_semcls + 1, cfg.clip_embed_dim)
            )
            / np.sqrt(cfg.clip_embed_dim),
        ).value
        cls_logits = jnp.einsum(
            "lbqc,nc->lbqn",
            visual_embeds,
            jax.lax.stop_gradient(text_embed),
            precision=jax.lax.Precision.HIGHEST,
        )

        center_offset = (
            nn.sigmoid(head(3, "center_head")(box_features, train=train)) - 0.5
        )
        size_normalized = nn.sigmoid(head(3, "size_head")(box_features, train=train))
        angle_logits = head(cfg.num_angle_bin, "angle_cls_head")(
            box_features, train=train
        )
        angle_residual_normalized = head(cfg.num_angle_bin, "angle_residual_head")(
            box_features, train=train
        )
        angle_residual = angle_residual_normalized * (np.pi / cfg.num_angle_bin)

        center_norm, center_unnorm, size_unnorm, angle, corners = decode_boxes(
            center_offset=center_offset,
            size_normalized=size_normalized,
            angle_logits=angle_logits,
            angle_residual=angle_residual,
            query_xyz=query_xyz,
            pc_min=pc_min,
            pc_max=pc_max,
            num_angle_bin=cfg.num_angle_bin,
        )

        probs = jax.lax.stop_gradient(jax.nn.softmax(cls_logits, axis=-1))
        return {
            # all stacked (L, B, Q, ...); [-1] = final layer, [:-1] = aux
            "visual_embeds": visual_embeds,
            "sem_cls_logits": cls_logits,
            "center_normalized": center_norm,
            "center_unnormalized": center_unnorm,
            "size_normalized": size_normalized,
            "size_unnormalized": size_unnorm,
            "angle_logits": angle_logits,
            "angle_residual": angle_residual,
            "angle_residual_normalized": angle_residual_normalized,
            "angle_continuous": angle,
            "objectness_prob": 1.0 - probs[..., -1],
            "sem_cls_prob": probs[..., :-1],
            "box_corners": corners,
            "query_xyz": query_xyz,
        }


def last_layer_outputs(outputs: dict) -> dict:
    """Slice the final decoder layer's predictions (the reference's
    `outputs["outputs"]`, model_3detr.py:308-315)."""
    per_layer = {
        k: v[-1]
        for k, v in outputs.items()
        if k != "query_xyz"
    }
    per_layer["query_xyz"] = outputs["query_xyz"]
    return per_layer
