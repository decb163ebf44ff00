"""RegionCLIP teacher tower golden verification vs a torch oracle.

The reference's region features come from detectron2's CLIPFastRCNN
(reference models/model_regionclip.py:15-22): ModifiedResNet RN-x4 visual
tower, RoIAlign(aligned=True) on res4, res5 + AttentionPool2d head.  Here a
live torch ModifiedResNet (tests/ref_oracle.py, public-CLIP architecture
and checkpoint key layout) with random weights is saved, converted through
convert_torch_checkpoint, and every stage — backbone, RoIAlign, RoI head,
and the end-to-end teacher — is matched numerically.

A scaled-down tower (width 16, one block per stage) keeps the CPU runtime
small; the converter code paths are identical to RN50x4.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.ref_oracle import CLIPModifiedResNet, roi_align_oracle

from ov3det.models.clip_resnet import CLIPResNetBackbone, CLIPResNetRes5Head
from ov3det.models.regionclip import (
    _PIXEL_MEAN,
    _PIXEL_STD,
    RegionCLIPTeacher,
    convert_torch_checkpoint,
)
from ov3det.ops.roi_align import roi_align

WIDTH = 16
LAYERS = (1, 1, 1, 1)
EMBED = 32
POOLER = 6  # -> 3x3 after the stride-2 res5, matching image_resolution 96
IMAGE_RES = 96


@pytest.fixture(scope="module")
def tower(tmp_path_factory):
    torch.manual_seed(5)
    net = CLIPModifiedResNet(
        layers=LAYERS, output_dim=EMBED, width=WIDTH, image_resolution=IMAGE_RES
    )
    # move BN running stats off init so the converted stats matter
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.6, 1.6)
    net.eval()
    path = tmp_path_factory.mktemp("ckpt") / "regionclip_tiny.pth"
    sd = {f"backbone.visual.{k}": v for k, v in net.state_dict().items()}
    torch.save({"model": sd}, path)
    variables = convert_torch_checkpoint(str(path), layers=LAYERS)
    return net, variables


class TestBackboneParity:
    def test_res4_features_match(self, tower):
        net, variables = tower
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 64, 96, 3)).astype(np.float32)
        with torch.no_grad():
            want = net.forward_res4(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        got = CLIPResNetBackbone(WIDTH, LAYERS).apply(
            {"params": variables["params"]["backbone"]}, jnp.asarray(x)
        )
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().transpose(0, 2, 3, 1), atol=1e-4
        )


class TestRoIAlignParity:
    def test_matches_torchvision_spec_oracle(self):
        rng = np.random.default_rng(1)
        feats = rng.normal(size=(2, 8, 10, 5)).astype(np.float32)
        # boxes in input-image pixels at scale 1/4 -> feature coords in range
        boxes = np.array(
            [
                [2.0, 3.0, 30.0, 25.0],
                [0.0, 0.0, 40.0, 32.0],  # full image
                [11.3, 7.7, 19.2, 28.4],  # fractional
                [5.0, 5.0, 6.5, 6.5],  # tiny box
            ],
            np.float32,
        )
        batch_idx = np.array([0, 1, 0, 1], np.int32)
        got = roi_align(
            jnp.asarray(feats), jnp.asarray(boxes), jnp.asarray(batch_idx),
            spatial_scale=0.25, output_size=4,
        )
        want = roi_align_oracle(feats, boxes, batch_idx, 0.25, 4)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestRoIAlignBatchedParity:
    def test_matches_generic_path(self):
        """roi_align_batched (the OOM-safe (B, Q) layout the teacher uses)
        must be numerically identical to the oracle-verified generic path."""
        from ov3det.ops.roi_align import roi_align_batched

        rng = np.random.default_rng(9)
        B, Q = 3, 7
        feats = rng.normal(size=(B, 12, 16, 5)).astype(np.float32)
        x1 = rng.uniform(0, 50, size=(B, Q)).astype(np.float32)
        y1 = rng.uniform(0, 35, size=(B, Q)).astype(np.float32)
        boxes = np.stack(
            [x1, y1, x1 + rng.uniform(2, 14, (B, Q)), y1 + rng.uniform(2, 12, (B, Q))],
            axis=-1,
        ).astype(np.float32)
        got = roi_align_batched(
            jnp.asarray(feats), jnp.asarray(boxes), spatial_scale=0.25, output_size=4
        )
        want = roi_align(
            jnp.asarray(feats),
            jnp.asarray(boxes.reshape(B * Q, 4)),
            jnp.asarray(np.repeat(np.arange(B), Q).astype(np.int32)),
            spatial_scale=0.25,
            output_size=4,
        )
        np.testing.assert_allclose(
            np.asarray(got).reshape(B * Q, 4, 4, 5), np.asarray(want), atol=1e-5
        )


class TestRoIHeadParity:
    def test_res5_attnpool_match(self, tower):
        net, variables = tower
        rng = np.random.default_rng(2)
        pooled = rng.normal(size=(3, POOLER, POOLER, WIDTH * 16)).astype(np.float32)
        with torch.no_grad():
            want = net.forward_res5(torch.from_numpy(pooled.transpose(0, 3, 1, 2)))
        got = CLIPResNetRes5Head(WIDTH, LAYERS[3], EMBED, IMAGE_RES).apply(
            {"params": variables["params"]["roi_head"]}, jnp.asarray(pooled)
        )
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)


class TestTeacherEndToEnd:
    def test_region_features_match_torch_pipeline(self, tower):
        net, variables = tower
        rng = np.random.default_rng(3)
        B, Q = 2, 5
        images = rng.uniform(0, 255, size=(B, 64, 96, 3)).astype(np.float32)
        x1 = rng.uniform(0, 60, size=(B, Q)).astype(np.float32)
        y1 = rng.uniform(0, 40, size=(B, Q)).astype(np.float32)
        boxes = np.stack(
            [x1, y1, x1 + rng.uniform(4, 30, (B, Q)), y1 + rng.uniform(4, 20, (B, Q))],
            axis=-1,
        ).astype(np.float32)

        teacher = RegionCLIPTeacher(
            width=WIDTH, layers=LAYERS, embed_dim=EMBED,
            pooler_resolution=POOLER, pooler_scale=1.0 / 16.0,
            image_resolution=IMAGE_RES,
        )
        got = teacher.apply(variables, jnp.asarray(images), jnp.asarray(boxes))

        norm = (images - _PIXEL_MEAN) / _PIXEL_STD
        with torch.no_grad():
            res4 = net.forward_res4(torch.from_numpy(norm.transpose(0, 3, 1, 2)))
        pooled = roi_align_oracle(
            res4.numpy().transpose(0, 2, 3, 1),
            boxes.reshape(B * Q, 4),
            np.repeat(np.arange(B), Q),
            1.0 / 16.0,
            POOLER,
        )
        with torch.no_grad():
            want = net.forward_res5(torch.from_numpy(pooled.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(got).reshape(B * Q, EMBED), want.numpy(), atol=3e-4
        )

    def test_yuv420_teacher_fidelity(self, tower):
        """Region features computed from a yuv420-roundtripped canvas
        (datasets/loader.py transfer codec, the benched OV configuration)
        must track the plain-RGB features: cosine >= 0.995 on
        chroma-smooth content (what camera JPEGs actually carry — the
        SUN RGB-D sources are 4:2:0, so this codec's loss never exceeds
        the files' own)."""
        from scipy.ndimage import zoom as _zoom

        from ov3det.datasets.loader import pack_batch, unpack_batch

        _, variables = tower
        rng = np.random.default_rng(7)
        B, Q, H, W = 2, 5, 64, 96
        low = rng.uniform(30, 225, size=(B, H // 8, W // 8, 3))
        smooth = np.stack([_zoom(low[b], (8, 8, 1), order=1) for b in range(B)])
        luma = rng.uniform(-30, 30, size=(B, H, W, 1))
        img = np.clip(smooth + luma, 0, 255).astype(np.uint8)
        buf, metas = pack_batch({"image": img}, quantize=("image",))
        img_yuv = np.asarray(unpack_batch(buf, metas)["image"])

        x1 = rng.uniform(0, 60, size=(B, Q)).astype(np.float32)
        y1 = rng.uniform(0, 40, size=(B, Q)).astype(np.float32)
        boxes = np.stack(
            [x1, y1, x1 + rng.uniform(8, 30, (B, Q)),
             y1 + rng.uniform(8, 20, (B, Q))], axis=-1,
        ).astype(np.float32)
        teacher = RegionCLIPTeacher(
            width=WIDTH, layers=LAYERS, embed_dim=EMBED,
            pooler_resolution=POOLER, pooler_scale=1.0 / 16.0,
            image_resolution=IMAGE_RES,
        )
        f_rgb = np.asarray(teacher.apply(
            variables, jnp.asarray(img, jnp.float32), jnp.asarray(boxes)
        )).reshape(B * Q, EMBED)
        f_yuv = np.asarray(teacher.apply(
            variables, jnp.asarray(img_yuv, jnp.float32), jnp.asarray(boxes)
        )).reshape(B * Q, EMBED)
        cos = np.sum(f_rgb * f_yuv, -1) / (
            np.linalg.norm(f_rgb, axis=-1) * np.linalg.norm(f_yuv, axis=-1)
        )
        assert cos.min() >= 0.995, cos.min()

    def test_pad_content_invariance_for_interior_boxes(self, tower):
        """The SUN RGB-D loader ships images on a zero-padded fixed canvas
        (datasets/sunrgbd.py); region features of boxes farther from the
        canvas pad than the res4 receptive field must not depend on what the
        pad contains."""
        net, variables = tower
        del net
        rng = np.random.default_rng(4)
        true_h, true_w, H, W = 160, 192, 224, 256
        img = rng.uniform(0, 255, size=(1, true_h, true_w, 3)).astype(np.float32)
        zero_canvas = np.zeros((1, H, W, 3), np.float32)
        zero_canvas[:, :true_h, :true_w] = img
        junk_canvas = rng.uniform(0, 255, size=(1, H, W, 3)).astype(np.float32)
        junk_canvas[:, :true_h, :true_w] = img
        boxes = np.array([[[8.0, 8.0, 96.0, 100.0]]], np.float32)  # >=60px margin

        teacher = RegionCLIPTeacher(
            width=WIDTH, layers=LAYERS, embed_dim=EMBED,
            pooler_resolution=POOLER, pooler_scale=1.0 / 16.0,
            image_resolution=IMAGE_RES,
        )
        f_zero = teacher.apply(variables, jnp.asarray(zero_canvas), jnp.asarray(boxes))
        f_junk = teacher.apply(variables, jnp.asarray(junk_canvas), jnp.asarray(boxes))
        np.testing.assert_allclose(np.asarray(f_zero), np.asarray(f_junk), atol=1e-5)


class TestBfloat16Teacher:
    def test_bf16_trunk_tracks_f32(self, tower):
        """compute_dtype="bfloat16" (the TPU-fast frozen-teacher config) must
        stay directionally faithful to f32 — the distillation loss is a
        cosine alignment, so cosine similarity is the right metric."""
        _, variables = tower
        rng = np.random.default_rng(6)
        images = rng.uniform(0, 255, size=(1, 64, 96, 3)).astype(np.float32)
        boxes = np.array([[[4.0, 4.0, 60.0, 40.0], [10.0, 8.0, 30.0, 30.0]]], np.float32)
        kw = dict(width=WIDTH, layers=LAYERS, embed_dim=EMBED,
                  pooler_resolution=POOLER, pooler_scale=1.0 / 16.0,
                  image_resolution=IMAGE_RES)
        f32 = RegionCLIPTeacher(**kw).apply(
            variables, jnp.asarray(images), jnp.asarray(boxes))
        bf16 = RegionCLIPTeacher(compute_dtype="bfloat16", **kw).apply(
            variables, jnp.asarray(images), jnp.asarray(boxes))
        a = np.asarray(f32).reshape(2, -1)
        b = np.asarray(bf16).reshape(2, -1).astype(np.float32)
        cos = (a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-8)
        assert (cos > 0.99).all(), cos


class TestFullWidthTeacher:
    """Parity at TRUE RN50x4 channel widths (width 80: 1280-ch res4,
    2560-ch res5/attnpool).  The tiny-tower tests above verify the
    converter paths; this one verifies the numerics where bf16
    accumulation error is largest — the 2560-wide dot products of the RoI
    head.  One block per stage and a small canvas keep CPU runtime sane
    (channel width, not depth/spatial, is what accumulation error scales
    with)."""

    @pytest.fixture(scope="class")
    def wide_tower(self, tmp_path_factory):
        torch.manual_seed(17)
        net = CLIPModifiedResNet(
            layers=(1, 1, 1, 1), output_dim=640, width=80, image_resolution=96
        )
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.6)
        net.eval()
        path = tmp_path_factory.mktemp("ckpt") / "regionclip_w80.pth"
        sd = {f"backbone.visual.{k}": v for k, v in net.state_dict().items()}
        torch.save({"model": sd}, path)
        variables = convert_torch_checkpoint(str(path), layers=(1, 1, 1, 1))
        return net, variables

    def _region_features(self, net, images, boxes, pooler):
        B, Q = boxes.shape[:2]
        norm = (images - _PIXEL_MEAN) / _PIXEL_STD
        with torch.no_grad():
            res4 = net.forward_res4(torch.from_numpy(norm.transpose(0, 3, 1, 2)))
        pooled = roi_align_oracle(
            res4.numpy().transpose(0, 2, 3, 1),
            boxes.reshape(B * Q, 4),
            np.repeat(np.arange(B), Q),
            1.0 / 16.0,
            pooler,
        )
        with torch.no_grad():
            return net.forward_res5(
                torch.from_numpy(pooled.transpose(0, 3, 1, 2))
            ).numpy()

    def test_f32_and_bf16_match_torch_at_width_80(self, wide_tower):
        net, variables = wide_tower
        rng = np.random.default_rng(18)
        B, Q = 1, 4
        images = rng.uniform(0, 255, size=(B, 64, 96, 3)).astype(np.float32)
        x1 = rng.uniform(0, 50, size=(B, Q)).astype(np.float32)
        y1 = rng.uniform(0, 30, size=(B, Q)).astype(np.float32)
        boxes = np.stack(
            [x1, y1, x1 + rng.uniform(8, 40, (B, Q)),
             y1 + rng.uniform(8, 30, (B, Q))], axis=-1).astype(np.float32)
        want = self._region_features(net, images, boxes, pooler=6)

        kw = dict(width=80, layers=(1, 1, 1, 1), embed_dim=640,
                  pooler_resolution=6, pooler_scale=1.0 / 16.0,
                  image_resolution=96)
        f32 = np.asarray(RegionCLIPTeacher(**kw).apply(
            variables, jnp.asarray(images), jnp.asarray(boxes)
        )).reshape(B * Q, 640)
        np.testing.assert_allclose(f32, want, atol=2e-3)

        bf16 = np.asarray(RegionCLIPTeacher(compute_dtype="bfloat16", **kw).apply(
            variables, jnp.asarray(images), jnp.asarray(boxes)
        )).reshape(B * Q, 640).astype(np.float32)
        cos = (bf16 * want).sum(-1) / (
            np.linalg.norm(bf16, axis=-1) * np.linalg.norm(want, axis=-1) + 1e-8
        )
        # the distillation loss consumes cosine alignment; bf16 at full
        # width must stay directionally faithful to the torch oracle
        assert (cos > 0.995).all(), cos


class TestInt8Teacher:
    """W8A8 frozen-trunk quantization fidelity (the round-4 OV speed lever).

    The int8 path replaces the reference teacher's f32 CUDA convs
    (reference criterion.py:363-399 via models/model_regionclip.py:15-22)
    with static-weight int8 MXU convs; the distillation loss consumes
    cosine alignment, so the gate is cosine(int8, f32) of the region
    features — checked both on the tiny converter tower and at TRUE RN50x4
    channel width (80), where quantization error accumulates most."""

    def test_quantized_params_structure_and_cosine_tiny(self, tower):
        from ov3det.models.regionclip import quantize_teacher_params

        _, variables = tower
        kw0 = dict(width=WIDTH, layers=LAYERS, embed_dim=EMBED,
                   pooler_resolution=POOLER, pooler_scale=1.0 / 16.0,
                   image_resolution=IMAGE_RES)
        # calibration uses the DEFAULT synthetic batch (different images
        # than the eval inputs below — a_scale must generalize)
        qvars = quantize_teacher_params(
            variables, "int8",
            teacher=RegionCLIPTeacher(compute_dtype="int8", **kw0))
        # every trunk conv except stem/conv1 must now carry kernel_q+scale,
        # a calibrated a_scale, and the FOLDED frozen-BN constants (the bias
        # plus the BN weight composed into scale); the BN subtree is gone
        stem = qvars["params"]["backbone"]["stem"]
        assert set(stem["conv1"]) == {"kernel"}          # excluded (image input)
        assert "bn1" in stem                             # follows the plain conv1
        assert set(stem["conv2"]) == {"kernel_q", "scale", "a_scale", "bias"}
        assert "bn2" not in stem and "bn3" not in stem   # folded away
        assert stem["conv2"]["kernel_q"].dtype == jnp.int8
        assert stem["conv2"]["scale"].dtype == jnp.float32
        assert float(stem["conv2"]["a_scale"]) > 0.0  # calibrated, not init
        blk = qvars["params"]["backbone"]["layer2"]["block0"]
        assert set(blk["downsample_conv"]) == {"kernel_q", "scale", "a_scale", "bias"}
        assert "downsample_bn" not in blk and "bn1" not in blk
        # attnpool projections untouched (kernel+bias Dense)
        attn = qvars["params"]["roi_head"]["attnpool"]
        assert "kernel" in attn["q_proj"] and "bias" in attn["q_proj"]

        rng = np.random.default_rng(7)
        images = rng.uniform(0, 255, size=(1, 64, 96, 3)).astype(np.float32)
        boxes = np.array(
            [[[4.0, 4.0, 60.0, 40.0], [10.0, 8.0, 30.0, 30.0]]], np.float32)
        kw = dict(width=WIDTH, layers=LAYERS, embed_dim=EMBED,
                  pooler_resolution=POOLER, pooler_scale=1.0 / 16.0,
                  image_resolution=IMAGE_RES)
        f32 = np.asarray(RegionCLIPTeacher(**kw).apply(
            variables, jnp.asarray(images), jnp.asarray(boxes))).reshape(2, -1)
        i8 = np.asarray(RegionCLIPTeacher(compute_dtype="int8", **kw).apply(
            qvars, jnp.asarray(images), jnp.asarray(boxes))
        ).reshape(2, -1).astype(np.float32)
        cos = (f32 * i8).sum(-1) / (
            np.linalg.norm(f32, axis=-1) * np.linalg.norm(i8, axis=-1) + 1e-8)
        assert (cos > 0.99).all(), cos

    def test_int8_tracks_torch_oracle_at_width_80(self):
        """VERDICT round-3 gate: cosine(int8 teacher, f32 oracle) >= 0.99 at
        width 80 — the real RN50x4 channel widths (1280-ch res4, 2560-ch
        res5) where per-tensor activation scales are under the most
        pressure."""
        from ov3det.models.regionclip import quantize_teacher_params

        # build the width-80 tower directly (the class-scoped fixture lives
        # on TestFullWidthTeacher; rebuilding keeps the tests independent)
        torch.manual_seed(17)
        net = CLIPModifiedResNet(
            layers=(1, 1, 1, 1), output_dim=640, width=80, image_resolution=96
        )
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.6)
        net.eval()
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "regionclip_w80.pth")
            sd = {f"backbone.visual.{k}": v for k, v in net.state_dict().items()}
            torch.save({"model": sd}, path)
            variables = convert_torch_checkpoint(str(path), layers=(1, 1, 1, 1))

        rng = np.random.default_rng(18)
        B, Q = 1, 4
        images = rng.uniform(0, 255, size=(B, 64, 96, 3)).astype(np.float32)
        x1 = rng.uniform(0, 50, size=(B, Q)).astype(np.float32)
        y1 = rng.uniform(0, 30, size=(B, Q)).astype(np.float32)
        boxes = np.stack(
            [x1, y1, x1 + rng.uniform(8, 40, (B, Q)),
             y1 + rng.uniform(8, 30, (B, Q))], axis=-1).astype(np.float32)

        kw = dict(width=80, layers=(1, 1, 1, 1), embed_dim=640,
                  pooler_resolution=6, pooler_scale=1.0 / 16.0,
                  image_resolution=96)
        f32 = np.asarray(RegionCLIPTeacher(**kw).apply(
            variables, jnp.asarray(images), jnp.asarray(boxes)
        )).reshape(B * Q, 640)
        qvars = quantize_teacher_params(
            variables, "int8",
            teacher=RegionCLIPTeacher(compute_dtype="int8", **kw))
        i8 = np.asarray(RegionCLIPTeacher(compute_dtype="int8", **kw).apply(
            qvars, jnp.asarray(images), jnp.asarray(boxes)
        )).reshape(B * Q, 640).astype(np.float32)
        cos = (f32 * i8).sum(-1) / (
            np.linalg.norm(f32, axis=-1) * np.linalg.norm(i8, axis=-1) + 1e-8
        )
        assert (cos > 0.99).all(), cos

    @pytest.mark.slow
    def test_int8_tracks_f32_at_production_depth(self):
        """VERDICT round-4 gate: int8 fidelity at the PRODUCTION geometry —
        width 80 AND layers (4,6,10,6) (26 bottlenecks; the width-80 tests
        above run 4).  Per-tensor activation-scale error compounds with
        depth, so this is the configuration the benched teacher actually
        runs (reference models/model_regionclip.py:15-22 = RN50x4).

        Calibration and evaluation use DIFFERENT smooth low-frequency
        images (the activation distribution 4:2:0 camera JPEGs drive — the
        default calibration batch is the same generator); the oracle is
        the f32 JAX tower, itself torch-parity-tested at width 80 above
        (depth only repeats converter-identical blocks)."""
        from ov3det.models.regionclip import (
            _smooth_calibration_images,
            quantize_teacher_params,
        )

        kw = dict(width=80, layers=(4, 6, 10, 6), embed_dim=640,
                  pooler_resolution=6, pooler_scale=1.0 / 16.0,
                  image_resolution=96)
        f32_teacher = RegionCLIPTeacher(**kw)
        variables = jax.jit(
            lambda: f32_teacher.init(
                jax.random.PRNGKey(23),
                jnp.zeros((1, 64, 96, 3), jnp.float32),
                jnp.zeros((1, 1, 4)),
            )
        )()

        rng = np.random.default_rng(24)
        B, Q = 1, 6
        images = _smooth_calibration_images(rng, B, 64, 96)  # eval content
        x1 = rng.uniform(0, 50, size=(B, Q)).astype(np.float32)
        y1 = rng.uniform(0, 30, size=(B, Q)).astype(np.float32)
        boxes = np.stack(
            [x1, y1, x1 + rng.uniform(8, 40, (B, Q)),
             y1 + rng.uniform(8, 30, (B, Q))], axis=-1).astype(np.float32)

        f32 = np.asarray(f32_teacher.apply(
            variables, jnp.asarray(images), jnp.asarray(boxes)
        )).reshape(B * Q, 640)
        # default calib batch: the same smooth generator, DIFFERENT seed
        # (rng(0) inside quantize_teacher_params) and different boxes
        qvars = quantize_teacher_params(
            variables, "int8",
            teacher=RegionCLIPTeacher(compute_dtype="int8", **kw))
        i8 = np.asarray(RegionCLIPTeacher(compute_dtype="int8", **kw).apply(
            qvars, jnp.asarray(images), jnp.asarray(boxes)
        )).reshape(B * Q, 640).astype(np.float32)
        cos = (f32 * i8).sum(-1) / (
            np.linalg.norm(f32, axis=-1) * np.linalg.norm(i8, axis=-1) + 1e-8
        )
        assert (cos > 0.99).all(), cos
