"""Whole-model forward parity: reference torch Model3DETR vs ov3det.

The reference detector (reference models/model_3detr.py:317-350) is run
end-to-end on CPU with working pure-torch pointnet2 stand-ins
(tests/ref_oracle.py), its state_dict converted via
convert_3detr_checkpoint, and the ov3det flax model — driven with exact
CUDA-parity ops (fps_shards=1, ball_query_method="first_k") — must
reproduce encoder->decoder->heads->BoxProcessor numerics on the same scene:
box corners, class logits, centers, sizes, angles, objectness.

This is the AP-parity keystone: it proves a converted reference checkpoint
produces the same detections through ov3det.
"""
import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference absent", allow_module_level=True)

import torch

from tests.ref_oracle import install_working_pointnet2


@pytest.fixture(scope="module", autouse=True)
def _fresh_reference():
    """(Re)install working pointnet2 stand-ins at TEST time, not import
    time: pytest imports every test module during collection, and evicting
    the cached reference modules then would leave earlier-running tests
    (test_eval's RefAPCalculator) holding functions from dead module
    objects — the reference's mp.Pool pickles its class-eval worker by
    qualified name and fails with 'not the same object'."""
    install_working_pointnet2()
    add_reference_to_path()


import jax
import jax.numpy as jnp

from ov3det.config import DecoderConfig, EncoderConfig, ModelConfig
from ov3det.models import Model3DETR
from ov3det.models.convert_3detr import convert_3detr_checkpoint


class _Args:
    """Reference CLI defaults scaled down for a CPU test
    (reference main.py:43-86)."""

    enc_type = "vanilla"
    enc_nlayers = 3
    enc_dim = 256
    enc_ffn_dim = 128
    enc_nhead = 4
    enc_dropout = 0.0
    enc_activation = "relu"
    dec_nlayers = 8
    dec_dim = 256
    dec_ffn_dim = 256
    dec_nhead = 4
    dec_dropout = 0.0
    preenc_npoints = 512
    nqueries = 64
    mlp_dropout = 0.3  # inactive in eval; keeps the Sequential layout honest
    use_color = False


def _build_reference(enc_type: str):
    from datasets.sunrgbd import SunrgbdDatasetConfig
    from models.model_3detr import (
        Model3DETR as RefModel,
        build_decoder,
        build_encoder,
        build_preencoder,
    )

    args = _Args()
    args.enc_type = enc_type
    dc = SunrgbdDatasetConfig()
    torch.manual_seed(7)
    text_embedding = torch.randn(dc.num_semcls + 1, dc.clip_embed_length)
    model = RefModel(
        build_preencoder(args),
        build_encoder(args),
        build_decoder(args),
        dc,
        text_embedding,
        encoder_dim=args.enc_dim,
        decoder_dim=args.dec_dim,
        mlp_dropout=args.mlp_dropout,
        num_queries=args.nqueries,
    )
    return model, dc


def _scene(batch=2, num_points=2048, seed=11):
    rng = np.random.default_rng(seed)
    pc = rng.uniform([0, 0, 0], [2.0, 2.0, 1.0], size=(batch, num_points, 3))
    pc = pc.astype(np.float32)
    return {
        "point_clouds": pc,
        "point_cloud_dims_min": pc.min(axis=1),
        "point_cloud_dims_max": pc.max(axis=1),
    }


def _run_pair(enc_type: str):
    ref, dc = _build_reference(enc_type)
    inputs = _scene()
    t_inputs = {k: torch.from_numpy(v) for k, v in inputs.items()}

    # move BN running stats off their init so the converted stats matter
    ref.train()
    with torch.no_grad():
        for _ in range(2):
            ref(t_inputs)
    ref.eval()
    with torch.no_grad():
        want = ref(t_inputs)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_3detr_checkpoint(
        sd, enc_layers=3, dec_layers=8, enc_kind=enc_type
    )

    cfg = ModelConfig(
        encoder=EncoderConfig(
            kind=enc_type, num_layers=3, dim=256, ffn_dim=128, num_heads=4,
            dropout=0.0,
        ),
        decoder=DecoderConfig(num_layers=8, dim=256, ffn_dim=256, num_heads=4,
                              dropout=0.0),
        preenc_npoints=512,
        num_queries=64,
        mlp_dropout=0.3,
        num_semcls=dc.num_semcls,
        num_angle_bin=dc.num_angle_bin,
        clip_embed_dim=dc.clip_embed_length,
        fps_shards=1,
        query_fps_shards=1,
        ball_query_method="first_k",
    )
    model = Model3DETR(cfg)
    variables = {
        "params": converted["params"],
        "batch_stats": converted["batch_stats"],
        "frozen": converted["frozen"],
    }
    j_inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
    got = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, j_inputs)
    return want, got


_KEYS_ATOL = {
    # after 11 attention layers + BN heads in f32, torch-vs-XLA rounding
    # accumulates to ~1e-4 relative; corners/centers are meters at ~2m scale
    "sem_cls_logits": 2e-3,
    "visual_embeds": 1e-3,
    "center_unnormalized": 1e-3,
    "center_normalized": 1e-3,
    "size_unnormalized": 2e-3,
    "size_normalized": 1e-3,
    "angle_logits": 2e-3,
    "angle_residual": 1e-3,
    "objectness_prob": 1e-3,
    "box_corners": 3e-3,
}


def _unscramble_reference_cls(want_layer: dict) -> dict:
    """Undo the reference's class-logit layout bug.

    The fork switched sem_cls_head from a conv over (LB, C, Q) to a Linear
    over the already-transposed (LB, Q, C) visual embeds but kept the old
    `.transpose(1, 2)` (reference models/model_3detr.py:240), so the
    subsequent flat `.reshape(L, B, Q, -1)` (:252) reinterprets each
    (nclass, Q) block as (Q, nclass) — the stored sem_cls_logits /
    sem_cls_prob / objectness_prob are query-class scrambled.  ov3det
    implements the intended semantics (SURVEY: capabilities, not bugs);
    for comparison we invert the scramble and recompute the probs.
    """
    logits = want_layer["sem_cls_logits"].numpy()
    B, Q, C = logits.shape
    clean = logits.reshape(B, C, Q).transpose(0, 2, 1)
    e = np.exp(clean - clean.max(-1, keepdims=True))
    prob = e / e.sum(-1, keepdims=True)
    fixed = dict(want_layer)
    fixed["sem_cls_logits"] = torch.from_numpy(clean)
    fixed["sem_cls_prob"] = torch.from_numpy(prob[..., :-1])
    fixed["objectness_prob"] = torch.from_numpy(1.0 - prob[..., -1])
    return fixed


def _compare_layer(want_layer: dict, got: dict, layer_idx: int):
    want_layer = _unscramble_reference_cls(want_layer)
    for key, atol in _KEYS_ATOL.items():
        w = want_layer[key].numpy()
        g = np.asarray(got[key][layer_idx])
        np.testing.assert_allclose(g, w, atol=atol, err_msg=f"{key}[{layer_idx}]")
    # discrete angle-bin argmax must agree exactly for angle_continuous parity
    w_bin = want_layer["angle_logits"].numpy().argmax(-1)
    g_bin = np.asarray(got["angle_logits"][layer_idx]).argmax(-1)
    if (w_bin == g_bin).all():
        np.testing.assert_allclose(
            np.asarray(got["angle_continuous"][layer_idx]),
            want_layer["angle_continuous"].numpy(),
            atol=1e-3,
            err_msg=f"angle_continuous[{layer_idx}]",
        )


class TestFullModelParity:
    def test_vanilla_encoder_forward_matches_reference(self):
        want, got = _run_pair("vanilla")
        _compare_layer(want["outputs"], got, -1)  # final decoder layer
        _compare_layer(want["aux_outputs"][0], got, 0)  # first aux layer
        _compare_layer(want["aux_outputs"][3], got, 3)

    def test_masked_encoder_forward_matches_reference(self):
        want, got = _run_pair("masked")
        _compare_layer(want["outputs"], got, -1)
        _compare_layer(want["aux_outputs"][0], got, 0)
