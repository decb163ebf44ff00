"""Tests: SUN RGB-D calibration parity, RoIAlign correctness, teacher shapes."""
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.conftest import add_reference_to_path, reference_available, stub_module

from ov3det.ops.roi_align import roi_align
from ov3det.utils.calibration import (
    SunrgbdCalibration,
    box_corners_upright_depth,
    project_boxes_to_image,
)

add_reference_to_path()
stub_module(
    "torchvision.transforms",
    InterpolationMode=object, Compose=object, Resize=object, CenterCrop=object,
    ToTensor=object, Normalize=object,
)
stub_module("imageio", imread=None)

import torch  # noqa: E402


def random_calib(rng):
    # Rtilt: small tilt rotation; K: plausible intrinsics
    a, b = rng.uniform(-0.2, 0.2, 2)
    Rx = np.array(
        [[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]]
    )
    Ry = np.array(
        [[np.cos(b), 0, np.sin(b)], [0, 1, 0], [-np.sin(b), 0, np.cos(b)]]
    )
    Rtilt = (Rx @ Ry).astype(np.float32)
    K = np.array([[529.5, 0, 365.0], [0, 529.5, 265.0], [0, 0, 1]], np.float32)
    return Rtilt, K


@pytest.mark.skipif(not reference_available(), reason="reference repo absent")
class TestCalibrationParity:
    def test_project_to_image_matches_reference(self):
        from utils.image_util import SUNRGBD_Calibration_cuda

        rng = np.random.default_rng(0)
        Rtilt, K = random_calib(rng)
        pts = rng.uniform(-2, 4, size=(50, 3)).astype(np.float32)
        pts[:, 1] = np.abs(pts[:, 1]) + 1.0  # in front of the camera

        ref_calib = SUNRGBD_Calibration_cuda(torch.from_numpy(Rtilt), torch.from_numpy(K))
        ref_uv, ref_d = ref_calib.project_upright_depth_to_image(
            torch.from_numpy(pts.copy())
        )
        ours = SunrgbdCalibration(jnp.asarray(Rtilt), jnp.asarray(K))
        uv, d = ours.project_upright_depth_to_image(jnp.asarray(pts))
        np.testing.assert_allclose(np.asarray(uv), ref_uv.numpy(), rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(d), ref_d.numpy(), rtol=1e-4, atol=1e-4)

    def test_image_round_trip(self):
        rng = np.random.default_rng(1)
        Rtilt, K = random_calib(rng)
        calib = SunrgbdCalibration(jnp.asarray(Rtilt), jnp.asarray(K))
        pts = rng.uniform(-2, 4, size=(30, 3)).astype(np.float32)
        pts[:, 1] = np.abs(pts[:, 1]) + 1.0
        uv, depth = calib.project_upright_depth_to_image(jnp.asarray(pts))
        back = calib.project_image_to_upright_depth(
            jnp.concatenate([uv, depth[:, None]], axis=-1)
        )
        np.testing.assert_allclose(np.asarray(back), pts, atol=1e-3)

    def test_box_projection_shapes_and_clamp(self):
        rng = np.random.default_rng(2)
        Rtilt, K = random_calib(rng)
        calib = SunrgbdCalibration(
            jnp.asarray(Rtilt[None]), jnp.asarray(K[None])
        )
        centers = jnp.asarray(rng.uniform(-1, 1, size=(1, 5, 3)).astype(np.float32))
        centers = centers.at[..., 1].add(3.0)
        sizes = jnp.asarray(rng.uniform(0.4, 1.5, size=(1, 5, 3)).astype(np.float32))
        angles = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(1, 5)).astype(np.float32))
        hw = jnp.asarray([[530, 730]])
        boxes = project_boxes_to_image(calib, centers, sizes, angles, hw)
        b = np.asarray(boxes)
        assert b.shape == (1, 5, 4)
        assert (b[..., 0] >= 0).all() and (b[..., 2] <= 730).all()
        assert (b[..., 1] >= 0).all() and (b[..., 3] <= 530).all()
        assert (b[..., 2] >= b[..., 0]).all() and (b[..., 3] >= b[..., 1]).all()


class TestRoIAlign:
    def test_constant_feature(self):
        feat = jnp.full((1, 16, 16, 3), 7.0)
        boxes = jnp.asarray([[2.0, 2.0, 10.0, 10.0]])
        out = roi_align(feat, boxes, jnp.asarray([0]), 1.0, 4)
        np.testing.assert_allclose(np.asarray(out), 7.0, atol=1e-5)

    def test_linear_ramp_bilinear_exact(self):
        # f(x, y) = x: averaging bilinear samples of a linear function gives
        # the analytic bin-center mean
        H = W = 32
        xs = np.arange(W, dtype=np.float32)
        feat = jnp.asarray(np.tile(xs[None, :, None], (H, 1, 1))[None])
        box = [4.0, 4.0, 20.0, 20.0]
        out = roi_align(feat, jnp.asarray([box]), jnp.asarray([0]), 1.0, 4)
        out = np.asarray(out)[0, :, :, 0]
        bin_w = (box[2] - box[0]) / 4
        expected_cols = box[0] - 0.5 + (np.arange(4) + 0.5) * bin_w
        for j in range(4):
            np.testing.assert_allclose(out[:, j], expected_cols[j], atol=1e-4)

    def test_batch_index_routing(self):
        feat = jnp.stack([jnp.zeros((8, 8, 1)), jnp.ones((8, 8, 1))])
        boxes = jnp.asarray([[1.0, 1.0, 6.0, 6.0], [1.0, 1.0, 6.0, 6.0]])
        out = roi_align(feat, boxes, jnp.asarray([0, 1]), 1.0, 2)
        assert float(np.asarray(out)[0].max()) == 0.0
        assert float(np.asarray(out)[1].min()) == 1.0


class TestTeacherTower:
    def test_region_features_shape(self):
        from ov3det.models.regionclip import RegionCLIPTeacher

        teacher = RegionCLIPTeacher(width=16, layers=(1, 1, 1, 1), embed_dim=64,
                                    pooler_resolution=6, image_resolution=64)
        rng = np.random.default_rng(3)
        images = jnp.asarray(rng.uniform(0, 255, size=(2, 64, 64, 3)).astype(np.float32))
        boxes = jnp.asarray(
            np.stack([[[4, 4, 40, 40], [10, 10, 30, 50]]] * 2).astype(np.float32)
        )
        variables = jax.jit(lambda: teacher.init(jax.random.PRNGKey(0), images, boxes))()
        out = jax.jit(teacher.apply)(variables, images, boxes)
        assert out.shape == (2, 2, 64)
        assert np.isfinite(np.asarray(out)).all()

    def test_cast_teacher_params_exact(self):
        """Pre-casting the frozen weights to bf16 is numerically identical
        to flax's per-apply promote_dtype cast (same rounding, hoisted)."""
        from ov3det.models.regionclip import RegionCLIPTeacher, cast_teacher_params

        teacher = RegionCLIPTeacher(width=16, layers=(1, 1, 1, 1), embed_dim=64,
                                    compute_dtype="bfloat16",
                                    pooler_resolution=6, image_resolution=64,
                                    roi_chunk_regions=8)
        rng = np.random.default_rng(7)
        images = jnp.asarray(rng.uniform(0, 255, (2, 64, 96, 3)).astype(np.float32))
        xy = rng.uniform(5, 30, (2, 4, 2)).astype(np.float32)
        wh = rng.uniform(8, 40, (2, 4, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
        v = teacher.init(jax.random.PRNGKey(0), images, boxes)
        vc = cast_teacher_params(v, "bfloat16")
        a = np.asarray(teacher.apply(v, images, boxes))
        b = np.asarray(teacher.apply(vc, images, boxes))
        np.testing.assert_array_equal(a, b)
        # BN stats and c_proj stay f32; conv/dense kernels go bf16
        import flax

        flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(vc))
        for path, leaf in flat.items():
            name = "/".join(path)
            if "bn" in name or "c_proj" in name:
                assert leaf.dtype == jnp.float32, name
            elif path[-1] == "kernel":
                assert leaf.dtype == jnp.bfloat16, name
        # float32 mode is a no-op
        assert cast_teacher_params(v, "float32") is v


class TestTeacherInTraining:
    def test_train_step_with_2d_alignment(self):
        """Full open-vocab path: projected boxes -> teacher features ->
        distillation loss, inside one jitted train step."""
        import jax.numpy as jnp
        from ov3det.config import (DecoderConfig, EncoderConfig, LossConfig,
                                   MatcherConfig, ModelConfig, OptimConfig,
                                   TrainConfig)
        from ov3det.datasets import make_batch
        from ov3det.engine import build_training
        from ov3det.models import Model3DETR
        from ov3det.models.regionclip import RegionCLIPTeacher, make_teacher_fn

        NCLS, Q = 4, 16
        cfg = TrainConfig(
            model=ModelConfig(
                encoder=EncoderConfig(num_layers=1, dim=32, ffn_dim=32,
                                      masking_radius=(0.16,)),
                decoder=DecoderConfig(num_layers=2, dim=32, ffn_dim=32),
                preenc_npoints=64, num_queries=Q, preenc_mlp=(16, 32, 32),
                num_semcls=NCLS, num_angle_bin=12, clip_embed_dim=32,
                mlp_dropout=0.0,
            ),
            loss=LossConfig(
                matcher=MatcherConfig(cost_class=1, cost_center=5),
                alignment_2d_weight=1.0,
            ),
            optim=OptimConfig(),
            max_epoch=2,
        )
        rng = np.random.default_rng(0)
        batch = make_batch(rng, batch_size=2, num_points=256, num_semcls=NCLS,
                           num_angle_bin=12, num_boxes=3)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        H, W = 64, 96
        batch["image"] = jnp.asarray(
            rng.uniform(0, 255, size=(2, H, W, 3)).astype(np.float32))
        batch["image_height"] = jnp.asarray([H, H])
        batch["image_width"] = jnp.asarray([W, W])
        Rtilt, K = random_calib(rng)
        batch["calib_Rtilt"] = jnp.asarray(np.stack([Rtilt, Rtilt]))
        batch["calib_K"] = jnp.asarray(np.stack([K, K]).astype(np.float32))

        teacher = RegionCLIPTeacher(width=16, layers=(1, 1, 1, 1), embed_dim=32,
                                    pooler_resolution=6, image_resolution=64)
        t_vars = jax.jit(lambda: teacher.init(
            jax.random.PRNGKey(0), batch["image"], jnp.zeros((2, 1, 4))))()
        teacher_fn = make_teacher_fn(teacher)

        model = Model3DETR(cfg.model)
        inputs = {k: batch[k] for k in
                  ("point_clouds", "point_cloud_dims_min", "point_cloud_dims_max")}
        state, train_step, _, _ = build_training(
            cfg, model, inputs, 10, jax.random.PRNGKey(0), teacher_fn=teacher_fn,
            teacher_vars=t_vars)
        state, metrics = train_step(state, batch, jax.random.PRNGKey(1))
        assert "loss_2dalignment" in metrics
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["loss_2dalignment"]) > 0

    def test_per_layer_teacher_features(self):
        """teacher_per_layer parity mode: one teacher run per decoder layer."""
        import jax.numpy as jnp
        from ov3det.models.regionclip import RegionCLIPTeacher, make_teacher_fn

        rng = np.random.default_rng(1)
        teacher = RegionCLIPTeacher(width=16, layers=(1, 1, 1, 1), embed_dim=16,
                                    pooler_resolution=4, image_resolution=64)
        B, Q, L, H, W = 2, 4, 3, 64, 64
        image = jnp.asarray(rng.uniform(0, 255, size=(B, H, W, 3)).astype(np.float32))
        t_vars = jax.jit(lambda: teacher.init(
            jax.random.PRNGKey(0), image, jnp.zeros((B, 1, 4))))()
        Rtilt, K = random_calib(rng)
        batch = {
            "image": image,
            "image_height": jnp.asarray([H] * B),
            "image_width": jnp.asarray([W] * B),
            "calib_Rtilt": jnp.asarray(np.stack([Rtilt] * B)),
            "calib_K": jnp.asarray(np.stack([K] * B).astype(np.float32)),
        }
        outputs = {
            "center_unnormalized": jnp.asarray(
                rng.uniform(-1, 1, size=(L, B, Q, 3)).astype(np.float32)
            ).at[..., 1].add(3.0),
            "size_unnormalized": jnp.asarray(
                rng.uniform(0.3, 1.0, size=(L, B, Q, 3)).astype(np.float32)),
            "angle_continuous": jnp.asarray(
                rng.uniform(-1, 1, size=(L, B, Q)).astype(np.float32)),
        }
        fn_last = make_teacher_fn(teacher, per_layer=False)
        fn_all = make_teacher_fn(teacher, per_layer=True)
        f_last = jax.jit(fn_last)(t_vars, batch, outputs)
        f_all = jax.jit(fn_all)(t_vars, batch, outputs)
        assert f_last.shape == (B, Q, 16)
        assert f_all.shape == (L, B, Q, 16)
        np.testing.assert_allclose(
            np.asarray(f_all[-1]), np.asarray(f_last), atol=1e-5
        )
