"""Cosine LR schedule with linear warmup, evaluated per iteration.

Reference engine.py:22-44 (compute_learning_rate / adjust_learning_rate):
warmup is linear from warm_lr to base_lr over warm_lr_epochs, then cosine
from base_lr down to final_lr across the remaining schedule.  Expressed as
an optax-compatible schedule of the global step so it lives inside the
jitted update instead of mutating optimizer state from the host each iter.
"""
from __future__ import annotations

import jax.numpy as jnp

from ov3det.config import OptimConfig


def make_lr_schedule(cfg: OptimConfig, max_epoch: int, iters_per_epoch: int):
    max_iters = max(max_epoch * iters_per_epoch, 1)

    def schedule(step):
        frac = jnp.clip(step / max_iters, 0.0, 1.0)
        warm_frac = cfg.warm_lr_epochs / max_epoch if max_epoch > 0 else 0.0
        warm_lr = cfg.warm_lr + frac * max_epoch * (
            (cfg.base_lr - cfg.warm_lr) / max(cfg.warm_lr_epochs, 1)
        )
        cos_lr = cfg.final_lr + 0.5 * (cfg.base_lr - cfg.final_lr) * (
            1.0 + jnp.cos(jnp.pi * frac)
        )
        use_warm = (frac <= warm_frac) & (cfg.warm_lr_epochs > 0)
        return jnp.where(use_warm, warm_lr, cos_lr)

    return schedule
