"""Model forward-pass tests: shapes, jit, determinism, box decode sanity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ov3det.config import EncoderConfig, ModelConfig
from ov3det.datasets import make_batch
from ov3det.models import Model3DETR, last_layer_outputs

B, N, NPRE, Q = 2, 1024, 256, 64


def tiny_cfg(kind="vanilla", num_angle_bin=1, num_semcls=18):
    return ModelConfig(
        encoder=EncoderConfig(
            kind=kind,
            num_layers=2,
            dim=64,
            ffn_dim=64,
            num_heads=4,
            masking_radius=(0.4**2, 0.8**2),
        ),
        decoder=__import__("ov3det.config", fromlist=["DecoderConfig"]).DecoderConfig(
            num_layers=3, dim=64, ffn_dim=64, num_heads=4
        ),
        preenc_npoints=NPRE,
        num_queries=Q,
        preenc_mlp=(32, 64, 64),
        interim_mlp=(64, 64, 64),
        num_semcls=num_semcls,
        num_angle_bin=num_angle_bin,
        clip_embed_dim=128,
    )


def make_inputs(num_angle_bin=1):
    rng = np.random.default_rng(0)
    batch = make_batch(rng, batch_size=B, num_points=N, num_angle_bin=num_angle_bin)
    return {
        "point_clouds": jnp.asarray(batch["point_clouds"]),
        "point_cloud_dims_min": jnp.asarray(batch["point_cloud_dims_min"]),
        "point_cloud_dims_max": jnp.asarray(batch["point_cloud_dims_max"]),
    }


@pytest.fixture(scope="module", params=["vanilla", "masked"])
def model_and_outputs(request):
    cfg = tiny_cfg(kind=request.param)
    model = Model3DETR(cfg)
    inputs = make_inputs()
    variables = model.init(jax.random.PRNGKey(0), inputs, train=False)
    outputs = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, inputs)
    return cfg, model, variables, inputs, outputs


class TestForward:
    def test_output_shapes(self, model_and_outputs):
        cfg, _, _, _, out = model_and_outputs
        L = cfg.decoder.num_layers
        ncls = cfg.num_semcls
        assert out["sem_cls_logits"].shape == (L, B, Q, ncls + 1)
        assert out["box_corners"].shape == (L, B, Q, 8, 3)
        assert out["center_unnormalized"].shape == (L, B, Q, 3)
        assert out["objectness_prob"].shape == (L, B, Q)
        assert out["sem_cls_prob"].shape == (L, B, Q, ncls)
        assert out["visual_embeds"].shape == (L, B, Q, cfg.clip_embed_dim)
        assert out["query_xyz"].shape == (B, Q, 3)

    def test_finite_and_bounded(self, model_and_outputs):
        _, _, _, _, out = model_and_outputs
        for k, v in out.items():
            assert np.isfinite(np.asarray(v)).all(), k
        prob = np.asarray(out["objectness_prob"])
        assert (prob >= 0).all() and (prob <= 1).all()
        sizes = np.asarray(out["size_normalized"])
        assert (sizes >= 0).all() and (sizes <= 1).all()

    def test_center_inside_scene_margin(self, model_and_outputs):
        _, _, _, inputs, out = model_and_outputs
        # center = query_xyz + offset in [-0.5, 0.5]^3: stays within scene+-0.5
        c = np.asarray(out["center_unnormalized"])
        mn = np.asarray(inputs["point_cloud_dims_min"])[None, :, None, :] - 0.5
        mx = np.asarray(inputs["point_cloud_dims_max"])[None, :, None, :] + 0.5
        assert (c >= mn - 1e-5).all() and (c <= mx + 1e-5).all()

    def test_deterministic_eval(self, model_and_outputs):
        _, model, variables, inputs, out = model_and_outputs
        out2 = model.apply(variables, inputs, train=False)
        np.testing.assert_allclose(
            np.asarray(out["box_corners"]), np.asarray(out2["box_corners"]), atol=1e-6
        )

    def test_last_layer_slicing(self, model_and_outputs):
        cfg, _, _, _, out = model_and_outputs
        last = last_layer_outputs(out)
        assert last["box_corners"].shape == (B, Q, 8, 3)
        np.testing.assert_array_equal(
            np.asarray(last["box_corners"]), np.asarray(out["box_corners"][-1])
        )


class TestTrainMode:
    def test_train_step_updates_and_grads(self):
        cfg = tiny_cfg()
        model = Model3DETR(cfg)
        inputs = make_inputs()
        variables = model.init(jax.random.PRNGKey(0), inputs, train=False)
        params = variables["params"]
        other = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, **other},
                inputs,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            return jnp.sum(out["center_unnormalized"] ** 2) * 1e-3, updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(grads)
        assert any(float(jnp.abs(g).sum()) > 0 for g in leaves)
        assert "batch_stats" in updates

    def test_frozen_text_embed_not_in_params(self):
        cfg = tiny_cfg()
        model = Model3DETR(cfg)
        inputs = make_inputs()
        variables = model.init(jax.random.PRNGKey(0), inputs, train=False)
        assert "frozen" in variables
        flat = jax.tree_util.tree_leaves_with_path(variables["params"])
        assert not any("text_embed" in str(p) for p, _ in flat)


class TestAngleBins:
    def test_sunrgbd_style_angles(self):
        cfg = tiny_cfg(num_angle_bin=12, num_semcls=20)
        model = Model3DETR(cfg)
        inputs = make_inputs(num_angle_bin=12)
        variables = model.init(jax.random.PRNGKey(0), inputs, train=False)
        out = model.apply(variables, inputs, train=False)
        ang = np.asarray(out["angle_continuous"])
        assert (ang > -np.pi - 1e-5).all() and (ang <= np.pi + 0.3).all()
        assert out["angle_logits"].shape[-1] == 12
