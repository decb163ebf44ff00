"""Symmetric CLIP-style contrastive loss (ULIP).

Counterpart of reference utils/ulip_losses.py:14-53 (CLIPLoss): symmetric
InfoNCE between point-cloud embeddings and the text embeddings of their
labels, logit scale 1/0.07.  The reference instantiates this inside the
criterion but never invokes it (criterion.py:107 — a vestigial self-training
hook); here it is a usable loss for embedding-alignment experiments.

The reference's cross-GPU `all_gather_batch` (utils/SLIP_utils.py:123-146)
is unnecessary under GSPMD jit — the batch axis is already global.  When
called inside shard_map, pass `axis_name` to gather across devices.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def clip_contrastive_loss(
    pc_embed: jnp.ndarray,  # (B, D)
    text_embed_per_sample: jnp.ndarray,  # (B, D) text embedding of each label
    logit_scale: float = 1.0 / 0.07,
    axis_name: Optional[str] = None,
):
    """Returns (loss, {"clip_loss", "clip_acc"})."""
    if axis_name is not None:
        pc_embed = jax.lax.all_gather(pc_embed, axis_name, tiled=True)
        text_embed_per_sample = jax.lax.all_gather(
            text_embed_per_sample, axis_name, tiled=True
        )
    pc = pc_embed / jnp.clip(jnp.linalg.norm(pc_embed, axis=-1, keepdims=True), 1e-8)
    tx = text_embed_per_sample / jnp.clip(
        jnp.linalg.norm(text_embed_per_sample, axis=-1, keepdims=True), 1e-8
    )
    logits = logit_scale * jnp.einsum(
        "bd,cd->bc", pc, tx, precision=jax.lax.Precision.HIGHEST
    )
    B = logits.shape[0]
    labels = jnp.arange(B)
    logp_pc = jax.nn.log_softmax(logits, axis=-1)
    logp_tx = jax.nn.log_softmax(logits.T, axis=-1)
    loss = -0.5 * (
        jnp.mean(logp_pc[labels, labels]) + jnp.mean(logp_tx[labels, labels])
    )
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32)) * 100.0
    return loss, {"clip_loss": loss, "clip_acc": acc}
