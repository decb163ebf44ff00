"""Checkpoint-converter tests: semantic parity of converted torch layers.

Uses live torch modules (same classes as the reference architecture) with
random weights as oracles, so the converter's layout mapping (attention
in_proj packing, conv1d->Dense transposes, BN running stats) is verified
numerically, not just structurally.
"""
import numpy as np
import pytest

from tests.conftest import stub_module

stub_module("third_party.pointnet2.pointnet2_modules", PointnetSAModuleVotes=object)
stub_module("third_party.pointnet2.pointnet2_utils", furthest_point_sample=None)
stub_module("detectron2.structures", Boxes=object, Instances=object)
stub_module("detectron2.modeling.meta_arch", CLIPFastRCNN=object)
stub_module("detectron2.config", get_cfg=lambda: None)
stub_module("detectron2.checkpoint", DetectionCheckpointer=object)

import torch
import torch.nn as nn
import jax
import jax.numpy as jnp
import flax.linen as fnn

from ov3det.models.convert_3detr import _attn, _generic_mlp, convert_3detr_checkpoint
from ov3det.models.mlp import GenericMLP
from ov3det.models.transformer import TransformerEncoderLayer


class TestAttentionConversion:
    def test_mha_matches_torch(self):
        torch.manual_seed(0)
        d, h, B, N = 32, 4, 2, 10
        mha = nn.MultiheadAttention(d, h, dropout=0.0, batch_first=True)
        x = torch.randn(B, N, d)
        with torch.no_grad():
            want, _ = mha(x, x, x)

        sd = {f"attn.{k}": v.detach().numpy() for k, v in mha.state_dict().items()}
        params = _attn(sd, "attn", h)
        flax_mha = fnn.MultiHeadDotProductAttention(
            num_heads=h, qkv_features=d, out_features=d
        )
        got = flax_mha.apply({"params": params}, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)

    def test_full_encoder_layer_matches_reference_layer(self):
        from tests.conftest import add_reference_to_path, reference_available

        if not reference_available():
            pytest.skip("reference absent")
        add_reference_to_path()
        from models.transformer import TransformerEncoderLayer as RefLayer

        torch.manual_seed(1)
        d, h, ffn = 32, 4, 64
        ref = RefLayer(d_model=d, nhead=h, dim_feedforward=ffn, dropout=0.0)
        ref.eval()
        B, N = 2, 12
        x = torch.randn(N, B, d)  # reference layout (npoints, batch, ch)
        with torch.no_grad():
            want = ref(x)  # pre-norm forward

        sd = {f"encoder.layers.0.{k}": v.detach().numpy()
              for k, v in ref.state_dict().items()}
        from ov3det.models.convert_3detr import _enc_layer

        params = _enc_layer(sd, "encoder.layers.0", h)
        layer = TransformerEncoderLayer(dim=d, num_heads=h, ffn_dim=ffn, dropout=0.0)
        got = layer.apply(
            {"params": params}, jnp.asarray(x.permute(1, 0, 2).numpy()), train=False
        )
        np.testing.assert_allclose(
            np.asarray(got), want.permute(1, 0, 2).numpy(), atol=3e-5
        )


class TestGenericMLPConversion:
    def test_mlp_with_bn_matches_reference(self):
        from tests.conftest import add_reference_to_path, reference_available

        if not reference_available():
            pytest.skip("reference absent")
        add_reference_to_path()
        from models.helpers import GenericMLP as RefMLP

        torch.manual_seed(2)
        ref = RefMLP(
            input_dim=16, hidden_dims=[16, 16], output_dim=8,
            norm_fn_name="bn1d", activation="relu", use_conv=True, dropout=0.3,
        )
        ref.eval()
        # push some data through in train mode first so running stats move
        ref.train()
        with torch.no_grad():
            for _ in range(3):
                ref(torch.randn(4, 16, 20))
        ref.eval()
        x = torch.randn(2, 16, 20)
        with torch.no_grad():
            want = ref(x)  # (B, C_out, L)

        sd = {f"mlp_heads.h.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
        params, stats = _generic_mlp(sd, "mlp_heads.h", 2, norm=True, dropout=True)
        mlp = GenericMLP(hidden_dims=[16, 16], output_dim=8, norm="bn", dropout=0.3)
        got = mlp.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x.permute(0, 2, 1).numpy()),
            train=False,
        )
        np.testing.assert_allclose(
            np.asarray(got), want.permute(0, 2, 1).numpy(), atol=3e-5
        )


class TestFullTreeShapes:
    def test_converted_tree_matches_model_init(self):
        """Build a fake reference state_dict with the right shapes and check
        the converted tree loads into the model (shape-exact)."""
        import chex
        from ov3det.config import DecoderConfig, EncoderConfig, ModelConfig
        from ov3det.datasets import make_batch
        from ov3det.models import Model3DETR

        d, ffn_e, ffn_d, h = 32, 24, 40, 4
        cfg = ModelConfig(
            encoder=EncoderConfig(num_layers=2, dim=d, ffn_dim=ffn_e, num_heads=h,
                                  masking_radius=(0.16, 0.64)),
            decoder=DecoderConfig(num_layers=2, dim=d, ffn_dim=ffn_d, num_heads=h),
            preenc_npoints=64,
            num_queries=16,
            preenc_mlp=(16, 24, d),
            num_semcls=6,
            num_angle_bin=12,
            clip_embed_dim=20,
        )
        rng = np.random.default_rng(3)

        def rand(*shape):
            return rng.normal(size=shape).astype(np.float32)

        sd = {}
        # pre-encoder SA mlp: in 3 -> 16 -> 24 -> 32
        dims = [3, 16, 24, d]
        for i in range(3):
            sd[f"pre_encoder.mlp_module.layer{i}.conv.weight"] = rand(dims[i+1], dims[i], 1, 1)
            for stat, val in (("weight", 1), ("bias", 0), ("running_mean", 0), ("running_var", 1)):
                sd[f"pre_encoder.mlp_module.layer{i}.bn.bn.{stat}"] = (
                    np.full(dims[i+1], val, np.float32) + rand(dims[i+1]) * 0.01
                )

        def attn_sd(prefix):
            sd[f"{prefix}.in_proj_weight"] = rand(3 * d, d)
            sd[f"{prefix}.in_proj_bias"] = rand(3 * d)
            sd[f"{prefix}.out_proj.weight"] = rand(d, d)
            sd[f"{prefix}.out_proj.bias"] = rand(d)

        def ln_sd(prefix):
            sd[f"{prefix}.weight"] = rand(d)
            sd[f"{prefix}.bias"] = rand(d)

        for i in range(2):
            p = f"encoder.layers.{i}"
            attn_sd(f"{p}.self_attn")
            ln_sd(f"{p}.norm1"); ln_sd(f"{p}.norm2")
            sd[f"{p}.linear1.weight"] = rand(ffn_e, d)
            sd[f"{p}.linear1.bias"] = rand(ffn_e)
            sd[f"{p}.linear2.weight"] = rand(d, ffn_e)
            sd[f"{p}.linear2.bias"] = rand(d)
        for i in range(2):
            p = f"decoder.layers.{i}"
            attn_sd(f"{p}.self_attn"); attn_sd(f"{p}.multihead_attn")
            ln_sd(f"{p}.norm1"); ln_sd(f"{p}.norm2"); ln_sd(f"{p}.norm3")
            sd[f"{p}.linear1.weight"] = rand(ffn_d, d)
            sd[f"{p}.linear1.bias"] = rand(ffn_d)
            sd[f"{p}.linear2.weight"] = rand(d, ffn_d)
            sd[f"{p}.linear2.bias"] = rand(d)
        ln_sd("decoder.norm")

        # enc2dec projection: hidden [d, d], bn throughout, output norm
        seq = []
        for _ in range(2):
            seq += ["conv", "bn", "act"]
        seq += ["conv", "bn", "act"]
        idx = 0
        for item in seq:
            if item == "conv":
                sd[f"encoder_to_decoder_projection.layers.{idx}.weight"] = rand(d, d, 1)
            elif item == "bn":
                for stat in ("weight", "bias", "running_mean"):
                    sd[f"encoder_to_decoder_projection.layers.{idx}.{stat}"] = rand(d)
                sd[f"encoder_to_decoder_projection.layers.{idx}.running_var"] = (
                    np.abs(rand(d)) + 0.5
                )
            idx += 1
        sd["pos_embedding.gauss_B"] = rand(3, d // 2)
        # query projection: hidden [d] with bias, no norm: conv(b),act,conv(b),act
        sd["query_projection.layers.0.weight"] = rand(d, d, 1)
        sd["query_projection.layers.0.bias"] = rand(d)
        sd["query_projection.layers.2.weight"] = rand(d, d, 1)
        sd["query_projection.layers.2.bias"] = rand(d)

        # heads: hidden [d, d] bn + dropout; layout conv,bn,act,drop x2 + conv
        head_dims = {
            "visual_embed_head": 20, "center_head": 3, "size_head": 3,
            "angle_cls_head": 12, "angle_residual_head": 12,
        }
        for head, out in head_dims.items():
            idx = 0
            for _ in range(2):
                sd[f"mlp_heads.{head}.layers.{idx}.weight"] = rand(d, d, 1); idx += 1
                for stat in ("weight", "bias", "running_mean"):
                    sd[f"mlp_heads.{head}.layers.{idx}.{stat}"] = rand(d)
                sd[f"mlp_heads.{head}.layers.{idx}.running_var"] = np.abs(rand(d)) + 0.5
                idx += 3  # bn, act, dropout
            sd[f"mlp_heads.{head}.layers.{idx}.weight"] = rand(out, d, 1)
            sd[f"mlp_heads.{head}.layers.{idx}.bias"] = rand(out)
        sd["mlp_heads.sem_cls_head.weight"] = rand(7, 20)

        converted = convert_3detr_checkpoint(sd, enc_layers=2, dec_layers=2)

        model = Model3DETR(cfg)
        b = make_batch(rng, batch_size=1, num_points=256, num_semcls=6, num_angle_bin=12)
        inputs = {k: jnp.asarray(b[k]) for k in
                  ("point_clouds", "point_cloud_dims_min", "point_cloud_dims_max")}
        ref_vars = jax.jit(lambda: model.init(jax.random.PRNGKey(0), inputs, train=False))()
        chex.assert_trees_all_equal_shapes(converted["params"], ref_vars["params"])
        chex.assert_trees_all_equal_shapes(
            converted["batch_stats"], ref_vars["batch_stats"]
        )
        # the converted weights actually run
        out = model.apply(
            {"params": converted["params"],
             "batch_stats": converted["batch_stats"],
             "frozen": converted["frozen"]},
            inputs, train=False,
        )
        assert np.isfinite(np.asarray(out["box_corners"])).all()


class TestCLIPTextConversion:
    def test_text_tower_matches_torch_oracle(self, tmp_path):
        """Converted-checkpoint parity for the CLIP text encoder against a
        live torch oracle built exactly like the public CLIP text tower
        (reference 3DOVDet_tools/extract_class_features.py consumes that
        tower's encode_text): nn.MultiheadAttention resblocks with causal
        mask, LayerNorm eps 1e-5, QuickGELU, EOT pooling @ text_projection.
        Guards the systematic-epsilon class of bug (flax default 1e-6)."""
        from ov3det.models.clip_text import CLIPTextEncoder, convert_text_checkpoint

        torch.manual_seed(7)
        vocab, ctx, width, layers, embed = 100, 16, 64, 2, 32
        heads = width // 64  # converter's head-count rule

        class QuickGELU(nn.Module):
            def forward(self, x):
                return x * torch.sigmoid(1.702 * x)

        class Block(nn.Module):
            def __init__(self):
                super().__init__()
                self.attn = nn.MultiheadAttention(width, heads)
                self.ln_1 = nn.LayerNorm(width)
                self.mlp = nn.Sequential()
                self.mlp.add_module("c_fc", nn.Linear(width, width * 4))
                self.mlp.add_module("gelu", QuickGELU())
                self.mlp.add_module("c_proj", nn.Linear(width * 4, width))
                self.ln_2 = nn.LayerNorm(width)

            def forward(self, x, mask):
                y = self.ln_1(x)
                x = x + self.attn(y, y, y, need_weights=False, attn_mask=mask)[0]
                return x + self.mlp(self.ln_2(x))

        class Oracle(nn.Module):
            def __init__(self):
                super().__init__()
                self.token_embedding = nn.Embedding(vocab, width)
                self.positional_embedding = nn.Parameter(torch.randn(ctx, width) * 0.01)
                self.transformer = nn.Module()
                self.transformer.resblocks = nn.ModuleList(
                    [Block() for _ in range(layers)]
                )
                self.ln_final = nn.LayerNorm(width)
                self.text_projection = nn.Parameter(torch.randn(width, embed) * width**-0.5)

            def forward(self, ids):
                x = self.token_embedding(ids) + self.positional_embedding
                mask = torch.full((ctx, ctx), float("-inf")).triu(1)
                x = x.permute(1, 0, 2)  # torch MHA default: (T, B, C)
                for blk in self.transformer.resblocks:
                    x = blk(x, mask)
                x = self.ln_final(x.permute(1, 0, 2))
                pooled = x[torch.arange(x.shape[0]), ids.argmax(dim=-1)]
                return pooled @ self.text_projection

        oracle = Oracle().eval()
        ids = torch.randint(1, vocab - 1, (3, ctx))
        ids[:, 0] = vocab - 2
        ids[:, 5:] = 0
        ids[:, 4] = vocab - 1  # EOT = highest id, argmax-pooled
        with torch.no_grad():
            want = oracle(ids).numpy()

        path = tmp_path / "text.pth"
        torch.save(oracle.state_dict(), str(path))
        variables = convert_text_checkpoint(str(path), layers=layers)
        enc = CLIPTextEncoder(vocab_size=vocab, context_length=ctx, width=width,
                              heads=heads, layers=layers, embed_dim=embed)
        got = enc.apply(variables, jnp.asarray(ids.numpy(), jnp.int32))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)
