"""Fused Pallas attention kernel: parity vs the jnp oracle, dropout
semantics, radius masking, and the flax integration path.

All tests run the kernel in interpret mode on CPU (the dispatch in
models/transformer.py uses the identical code path on TPU).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ov3det.ops.pallas.attention_kernel import (
    attention_reference,
    fused_attention,
)


def _qkv(rng, B=2, NQ=256, NK=256, H=4, D=64):
    q = jnp.asarray(rng.normal(size=(B, NQ, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, NK, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, NK, H, D)).astype(np.float32))
    return q, k, v


def _np_drop_mask(seed, bh, tq, nq, nk, p):
    """Reconstruct the kernel's hash-based dropout mask in numpy."""
    rows = np.arange(nq, dtype=np.uint64)[:, None]
    cols = np.arange(nk, dtype=np.uint64)[None, :]
    M = np.uint64(0xFFFFFFFF)
    h = (
        np.uint64(np.uint32(seed)) * np.uint64(0x9E3779B9)
        + np.uint64(bh) * np.uint64(0x85EBCA6B)
        + rows * np.uint64(0xC2B2AE35)
        + cols * np.uint64(0x27D4EB2F)
    ) & M
    h ^= h >> np.uint64(16)
    h = (h * np.uint64(0x85EBCA6B)) & M
    h ^= h >> np.uint64(13)
    h = (h * np.uint64(0xC2B2AE35)) & M
    h ^= h >> np.uint64(16)
    thresh = min(int(p * 2**32), 2**32 - 1)
    return np.where(h >= thresh, 1.0 / (1.0 - p), 0.0).astype(np.float32)


class TestFusedAttention:
    def test_forward_matches_reference(self):
        rng = np.random.default_rng(0)
        q, k, v = _qkv(rng)
        out = fused_attention(q, k, v, interpret=True)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_cross_attention_shapes(self):
        """Decoder cross-attn: NQ=128 queries over NK=256 memory tokens."""
        rng = np.random.default_rng(1)
        q, _, _ = _qkv(rng, NQ=128)
        _, k, v = _qkv(rng, NK=256)
        out = fused_attention(q, k, v, interpret=True)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_gradients_match_reference(self):
        rng = np.random.default_rng(2)
        q, k, v = _qkv(rng, B=1, NQ=128, NK=128)

        def loss_fused(q, k, v):
            return jnp.sum(jnp.sin(fused_attention(q, k, v, interpret=True)))

        def loss_ref(q, k, v):
            return jnp.sum(jnp.sin(attention_reference(q, k, v)))

        g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g1, g2, "qkv"):
            rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))
            assert rel < 5e-3, (name, rel)  # flash-style bwd recompute envelope

    def test_radius_mask_matches_reference(self):
        rng = np.random.default_rng(3)
        q, k, v = _qkv(rng)
        qx = jnp.asarray(rng.uniform(-1, 1, (2, 256, 3)).astype(np.float32))
        out = fused_attention(q, k, v, q_xyz=qx, k_xyz=qx, radius_sq=0.25,
                              interpret=True)
        ref = attention_reference(q, k, v, q_xyz=qx, k_xyz=qx, radius_sq=0.25)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_dropout_matches_mask_oracle(self):
        """Dropout = softmax weights x the hash mask / (1-p): rebuild the
        mask in numpy and compare against a dense jnp computation."""
        rng = np.random.default_rng(4)
        B, NQ, NK, H, D, p, seed = 1, 128, 128, 2, 64, 0.3, 7
        q, k, v = _qkv(rng, B=B, NQ=NQ, NK=NK, H=H, D=D)
        out = fused_attention(q, k, v, dropout_rate=p, dropout_seed=seed,
                              interpret=True)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (D ** 0.5)
        a = jax.nn.softmax(s, axis=-1)
        masks = np.stack(
            [_np_drop_mask(seed, bh, 128, NQ, NK, p) for bh in range(B * H)]
        ).reshape(B, H, NQ, NK)
        ref = jnp.einsum("bhqk,bkhd->bqhd", a * masks, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)

    def test_dropout_deterministic_and_seed_sensitive(self):
        rng = np.random.default_rng(5)
        q, k, v = _qkv(rng, B=1, NQ=128, NK=128)
        a = fused_attention(q, k, v, dropout_rate=0.5, dropout_seed=3,
                            interpret=True)
        b = fused_attention(q, k, v, dropout_rate=0.5, dropout_seed=3,
                            interpret=True)
        c = fused_attention(q, k, v, dropout_rate=0.5, dropout_seed=4,
                            interpret=True)
        assert float(jnp.max(jnp.abs(a - b))) == 0.0
        assert float(jnp.max(jnp.abs(a - c))) > 0.0

    def test_dropout_backward_uses_same_mask(self):
        """Directional finite difference through the dropped forward — only
        consistent if bwd regenerates the identical mask bits."""
        rng = np.random.default_rng(6)
        q, k, v = _qkv(rng, B=1, NQ=128, NK=128)

        def f(q):
            return jnp.sum(fused_attention(q, k, v, dropout_rate=0.5,
                                           dropout_seed=3, interpret=True))

        g = jax.grad(f)(q)
        d = jnp.asarray(rng.normal(size=q.shape).astype(np.float32))
        eps = 1e-2
        fd = (f(q + eps * d) - f(q - eps * d)) / (2 * eps)
        an = jnp.sum(g * d)
        assert abs(float(fd) - float(an)) < 0.05 * max(1.0, abs(float(fd)))


class TestFlaxIntegration:
    def test_encoder_layer_fused_equals_xla(self, monkeypatch):
        """TransformerEncoderLayer with the fused kernel (forced, interpret
        mode) matches the flax attention path at f32, deterministic."""
        from ov3det.models.transformer import TransformerEncoderLayer

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(2, 128, 64)).astype(np.float32))
        layer = TransformerEncoderLayer(dim=64, num_heads=4, ffn_dim=32,
                                        dropout=0.1)
        monkeypatch.setenv("OV3DET_ATTENTION", "xla")
        params = layer.init(jax.random.PRNGKey(0), x, train=False)
        ref = layer.apply(params, x, train=False)
        monkeypatch.setenv("OV3DET_ATTENTION", "fused")
        out = layer.apply(params, x, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-4, rtol=1e-4)

    def test_masked_encoder_fused_equals_xla(self, monkeypatch):
        """MaskedTransformerEncoder: the in-kernel radius mask (no (B,N,N)
        tensor) matches the materialized boolean-mask path."""
        import flax.linen as nn

        from ov3det.models.transformer import MaskedTransformerEncoder

        class _NoOpDownsample(nn.Module):
            @nn.compact
            def __call__(self, xyz, feats, train=False):
                return xyz, feats, None

        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.normal(size=(2, 128, 64)).astype(np.float32))
        xyz = jnp.asarray(rng.uniform(-1, 1, (2, 128, 3)).astype(np.float32))
        enc = MaskedTransformerEncoder(
            num_layers=2, dim=64, masking_radius=(0.4, 0.8),
            interim_downsample=_NoOpDownsample(), num_heads=4, ffn_dim=32,
        )
        monkeypatch.setenv("OV3DET_ATTENTION", "xla")
        params = enc.init(jax.random.PRNGKey(0), x, xyz, train=False)
        _, ref, _ = enc.apply(params, x, xyz, train=False)
        monkeypatch.setenv("OV3DET_ATTENTION", "fused")
        _, out, _ = enc.apply(params, x, xyz, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-4, rtol=1e-4)

    def test_train_dropout_path_runs(self, monkeypatch):
        """Fused path with train=True consumes the dropout rng and differs
        across rng keys (attention-weight dropout is live)."""
        from ov3det.models.transformer import TransformerEncoderLayer

        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.normal(size=(1, 128, 64)).astype(np.float32))
        layer = TransformerEncoderLayer(dim=64, num_heads=4, ffn_dim=32,
                                        dropout=0.3)
        monkeypatch.setenv("OV3DET_ATTENTION", "fused")
        params = layer.init(jax.random.PRNGKey(0), x, train=False)
        a = layer.apply(params, x, train=True,
                        rngs={"dropout": jax.random.PRNGKey(1)})
        b = layer.apply(params, x, train=True,
                        rngs={"dropout": jax.random.PRNGKey(2)})
        assert float(jnp.max(jnp.abs(a - b))) > 0.0
