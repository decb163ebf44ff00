"""Golden parity tests: ov3det.geometry vs the reference torch/numpy code.

The reference repo is imported read-only from /root/reference purely as a
test oracle; nothing from it ships in ov3det.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from tests.conftest import add_reference_to_path, reference_available

from ov3det.geometry import (
    angle_to_bin,
    bin_to_angle,
    box3d_iou_corners,
    box_corners_from_param,
    corners_from_upright_depth_param,
    flip_axis_to_camera,
    flip_axis_to_depth,
    generalized_box3d_iou,
    nms_2d,
    nms_3d,
    nms_3d_class_aware,
    scale_points,
    shift_scale_points,
)

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo absent")
add_reference_to_path()

import torch  # noqa: E402
from utils.box_util import (  # noqa: E402  (reference oracle)
    box3d_iou as ref_box3d_iou,
    flip_axis_to_camera_np as ref_flip_axis_to_camera,
    generalized_box3d_iou_tensor as ref_giou,
    get_3d_box_batch_np as ref_get_3d_box_batch,
)
from utils.nms import (  # noqa: E402
    nms_2d_faster as ref_nms_2d,
    nms_3d_faster as ref_nms_3d,
    nms_3d_faster_samecls as ref_nms_3d_cls,
)
from utils.pc_util import shift_scale_points as ref_shift_scale  # noqa: E402


def random_boxes(rng, B, K, rotated=True):
    center = rng.uniform(-3, 3, size=(B, K, 3)).astype(np.float32)
    size = rng.uniform(0.2, 2.5, size=(B, K, 3)).astype(np.float32)
    angle = (
        rng.uniform(-np.pi, np.pi, size=(B, K)).astype(np.float32)
        if rotated
        else np.zeros((B, K), np.float32)
    )
    return center, size, angle


def corners_np(center, size, angle):
    """Reference-oracle corner computation (dataset codec)."""
    return ref_get_3d_box_batch(size, angle, ref_flip_axis_to_camera(center)).astype(
        np.float32
    )


class TestFrames:
    def test_flip_round_trip(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(4, 7, 3)).astype(np.float32)
        cam = flip_axis_to_camera(jnp.asarray(pts))
        np.testing.assert_allclose(np.asarray(cam), ref_flip_axis_to_camera(pts), atol=1e-6)
        back = flip_axis_to_depth(cam)
        np.testing.assert_allclose(np.asarray(back), pts, atol=1e-6)

    def test_shift_scale_points(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-5, 5, size=(3, 11, 3)).astype(np.float32)
        mn = pts.min(axis=1)
        mx = pts.max(axis=1)
        ours = shift_scale_points(jnp.asarray(pts), (jnp.asarray(mn), jnp.asarray(mx)))
        ref = ref_shift_scale(
            torch.from_numpy(pts.copy()), [torch.from_numpy(mn), torch.from_numpy(mx)]
        )
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)

    def test_scale_points(self):
        rng = np.random.default_rng(2)
        pts = rng.normal(size=(2, 5, 3)).astype(np.float32)
        f = rng.uniform(0.5, 2.0, size=(2, 3)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(scale_points(jnp.asarray(pts), jnp.asarray(f))),
            pts * f[:, None, :],
            atol=1e-6,
        )


class TestCorners:
    def test_corner_codec_matches_reference(self):
        rng = np.random.default_rng(3)
        center, size, angle = random_boxes(rng, 4, 9)
        ours = corners_from_upright_depth_param(
            jnp.asarray(center), jnp.asarray(size), jnp.asarray(angle)
        )
        np.testing.assert_allclose(
            np.asarray(ours), corners_np(center, size, angle), atol=1e-4
        )

    def test_camera_frame_codec(self):
        rng = np.random.default_rng(4)
        center, size, angle = random_boxes(rng, 2, 6)
        cam_center = ref_flip_axis_to_camera(center)
        ours = box_corners_from_param(
            jnp.asarray(size), jnp.asarray(angle), jnp.asarray(cam_center)
        )
        np.testing.assert_allclose(
            np.asarray(ours), ref_get_3d_box_batch(size, angle, cam_center), atol=1e-4
        )


class TestAngleBins:
    @pytest.mark.parametrize("num_bins", [12, 1])
    def test_round_trip(self, num_bins):
        rng = np.random.default_rng(5)
        angles = rng.uniform(0, 2 * np.pi, size=(64,)).astype(np.float32)
        cls, res = angle_to_bin(jnp.asarray(angles), num_bins)
        rec = bin_to_angle(cls, res, num_bins, to_label_format=False)
        np.testing.assert_allclose(
            np.mod(np.asarray(rec), 2 * np.pi), np.mod(angles, 2 * np.pi), atol=1e-4
        )

    def test_matches_reference_codec(self):
        # Scalar oracle re-derived from the documented VoteNet codec
        # (reference datasets/sunrgbd.py:102-120): bin centers at k*(2pi/N),
        # residual = angle - center after a half-bin shift.
        def oracle(angle, num_bins):
            per = 2 * np.pi / num_bins
            a = angle % (2 * np.pi)
            shifted = (a + per / 2) % (2 * np.pi)
            cls = int(shifted / per)
            return cls, shifted - (cls * per + per / 2)

        rng = np.random.default_rng(6)
        angles = rng.uniform(0, 2 * np.pi - 1e-3, size=(128,)).astype(np.float64)
        cls, res = angle_to_bin(jnp.asarray(angles.astype(np.float32)), 12)
        for i, a in enumerate(angles):
            rc, rr = oracle(a, 12)
            assert int(cls[i]) == rc, (a, int(cls[i]), rc)
            assert abs(float(res[i]) - rr) < 1e-4


class TestGIoU:
    @pytest.mark.parametrize("rotated", [False, True])
    def test_matches_reference(self, rotated):
        rng = np.random.default_rng(7)
        B, K1, K2 = 2, 8, 5
        c1 = corners_np(*random_boxes(rng, B, K1, rotated))
        c2 = corners_np(*random_boxes(rng, B, K2, rotated))
        nums_k2 = np.array([5, 3], dtype=np.int64)
        ref = ref_giou(
            torch.from_numpy(c1),
            torch.from_numpy(c2),
            torch.from_numpy(nums_k2),
            rotated_boxes=rotated,
        ).numpy()
        ours = generalized_box3d_iou(
            jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(nums_k2), rotated_boxes=rotated
        )
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3)

    def test_identical_boxes_give_iou_one(self):
        # Exactly identical rotated boxes are a known degenerate case of the
        # strict-inequality Sutherland–Hodgman clip (the reference behaves the
        # same way), so test identity on the axis-aligned path and
        # near-identity on a jittered rotated pair.
        rng = np.random.default_rng(8)
        c = corners_np(*random_boxes(rng, 1, 4, rotated=False))
        g = generalized_box3d_iou(jnp.asarray(c), jnp.asarray(c), None, rotated_boxes=False)
        np.testing.assert_allclose(np.diagonal(np.asarray(g)[0]), 1.0, atol=1e-3)

        # A clearly-overlapping rotated pair (well-conditioned clip): a small
        # rotation of a unit cube about its center keeps IoU near 1.
        center, size, _ = random_boxes(rng, 1, 4, rotated=False)
        c1 = corners_np(center, size, np.zeros((1, 4), np.float32))
        c2 = corners_np(center, size, np.full((1, 4), 0.02, np.float32))
        g = generalized_box3d_iou(jnp.asarray(c1), jnp.asarray(c2), None)
        assert (np.diagonal(np.asarray(g)[0]) > 0.8).all()

    def test_gradients_flow(self):
        import jax

        rng = np.random.default_rng(9)
        c1 = corners_np(*random_boxes(rng, 1, 3))
        c2 = corners_np(*random_boxes(rng, 1, 2))

        def loss(x):
            return jnp.sum(generalized_box3d_iou(x, jnp.asarray(c2), None))

        grad = jax.grad(loss)(jnp.asarray(c1))
        assert np.isfinite(np.asarray(grad)).all()
        assert np.abs(np.asarray(grad)).sum() > 0

    def test_rect_intersection_shared_face_exact(self):
        """Property test for the Green's-theorem rectangle clipper on
        boundary-collinear configurations (shared faces, touching,
        containment with a flush edge) — the same-direction double count
        must be dedup'd exactly, not just capped at min(area): a
        side-by-side pair with flush tops+bottoms used to report 3.0
        instead of 2.0 (cap does not bind at min(area)=4)."""
        from ov3det.geometry.iou import (
            _quad_intersection_area_batched,
            _rect_intersection_area_batched,
        )

        def aarect(x1, y1, x2, y2):
            return np.array(
                [[x1, y1], [x2, y1], [x2, y2], [x1, y2]], np.float32
            )

        cases = [
            # (rect1, rect2, exact intersection area)
            (aarect(0, 0, 2, 2), aarect(1, 0, 3, 2), 2.0),  # flush top+bottom
            (aarect(0, 0, 4, 4), aarect(1, 0, 3, 2), 4.0),  # contained, shared bottom
            (aarect(0, 0, 4, 4), aarect(1, 2, 3, 4), 4.0),  # contained, shared top
            (aarect(0, 0, 2, 2), aarect(0, 0, 2, 2), 4.0),  # identical
            (aarect(0, 0, 2, 2), aarect(2, 0, 5, 2), 0.0),  # touching edge
            (aarect(0, 0, 2, 2), aarect(2, 2, 4, 4), 0.0),  # touching corner
            (aarect(0, 0, 2, 2), aarect(0, 0, 1, 1), 1.0),  # shared corner, contained
            (aarect(0, 0, 3, 1), aarect(1, 0, 2, 1), 1.0),  # full-height strip inside
        ]
        r1 = np.stack([c[0] for c in cases])
        r2 = np.stack([c[1] for c in cases])
        want = np.array([c[2] for c in cases], np.float32)
        got = np.asarray(_rect_intersection_area_batched(jnp.asarray(r1), jnp.asarray(r2)))
        np.testing.assert_allclose(got, want, atol=1e-4)
        # symmetric in the arguments
        got_T = np.asarray(_rect_intersection_area_batched(jnp.asarray(r2), jnp.asarray(r1)))
        np.testing.assert_allclose(got_T, want, atol=1e-4)

        # rotated shared-face pairs: rect2 = rect1 shifted ALONG its own
        # edge direction (keeps two boundary lines collinear), at random
        # angles; exact area is analytic (overlap of the shifted extents)
        rng = np.random.default_rng(11)
        N = 64
        ang = rng.uniform(0, 2 * np.pi, N).astype(np.float32)
        w = rng.uniform(0.5, 3.0, N).astype(np.float32)
        h = rng.uniform(0.5, 3.0, N).astype(np.float32)
        shift = rng.uniform(-1.2, 1.2, N).astype(np.float32) * w
        ca, sa = np.cos(ang), np.sin(ang)
        R = np.stack([np.stack([ca, -sa], -1), np.stack([sa, ca], -1)], -2)
        base = np.stack(
            [np.stack([-w / 2, -h / 2], -1), np.stack([w / 2, -h / 2], -1),
             np.stack([w / 2, h / 2], -1), np.stack([-w / 2, h / 2], -1)], 1
        )
        r1r = np.einsum("nij,nkj->nki", R, base).astype(np.float32)
        off = np.einsum("nij,nj->ni", R, np.stack([shift, np.zeros(N, np.float32)], -1))
        r2r = (r1r + off[:, None, :]).astype(np.float32)
        want_r = np.maximum(w - np.abs(shift), 0.0) * h
        got_r = np.asarray(_rect_intersection_area_batched(jnp.asarray(r1r), jnp.asarray(r2r)))
        np.testing.assert_allclose(got_r, want_r, rtol=1e-3, atol=1e-3)

        # generic (non-collinear) random pairs must still agree with the
        # retained Sutherland-Hodgman path
        g1 = np.einsum("nij,nkj->nki", R, base) + rng.uniform(-1, 1, (N, 1, 2))
        ang2 = rng.uniform(0, 2 * np.pi, N).astype(np.float32)
        ca2, sa2 = np.cos(ang2), np.sin(ang2)
        R2 = np.stack([np.stack([ca2, -sa2], -1), np.stack([sa2, ca2], -1)], -2)
        g2 = np.einsum("nij,nkj->nki", R2, base) + rng.uniform(-1, 1, (N, 1, 2))
        g1 = g1.astype(np.float32)
        g2 = g2.astype(np.float32)
        got_g = np.asarray(_rect_intersection_area_batched(jnp.asarray(g1), jnp.asarray(g2)))
        want_g = np.asarray(_quad_intersection_area_batched(jnp.asarray(g1), jnp.asarray(g2)))
        np.testing.assert_allclose(got_g, want_g, rtol=1e-3, atol=1e-3)

    def test_pairwise_exact_iou(self):
        rng = np.random.default_rng(10)
        c1 = corners_np(*random_boxes(rng, 1, 6))[0]
        c2 = corners_np(*random_boxes(rng, 1, 6))[0]
        for i in range(6):
            ref_iou, _ = ref_box3d_iou(c1[i], c2[i])
            ours = float(box3d_iou_corners(jnp.asarray(c1[i]), jnp.asarray(c2[i])))
            assert abs(ours - ref_iou) < 2e-3, (i, ours, ref_iou)


class TestNMS:
    def _random_aabbs(self, rng, K, dims):
        mn = rng.uniform(-3, 3, size=(K, dims)).astype(np.float32)
        ext = rng.uniform(0.3, 2.0, size=(K, dims)).astype(np.float32)
        scores = rng.uniform(0.01, 1.0, size=(K,)).astype(np.float32)
        return np.concatenate([mn, mn + ext], axis=1), scores

    @pytest.mark.parametrize("threshold", [0.25, 0.5])
    def test_nms_3d(self, threshold):
        rng = np.random.default_rng(11)
        boxes, scores = self._random_aabbs(rng, 40, 3)
        ref_pick = ref_nms_3d(np.concatenate([boxes, scores[:, None]], 1), threshold)
        keep = np.asarray(nms_3d(jnp.asarray(boxes), jnp.asarray(scores), threshold))
        assert set(np.where(keep)[0]) == set(ref_pick)

    def test_nms_3d_class_aware(self):
        rng = np.random.default_rng(12)
        boxes, scores = self._random_aabbs(rng, 40, 3)
        classes = rng.integers(0, 4, size=(40,))
        arr = np.concatenate(
            [boxes, scores[:, None], classes[:, None].astype(np.float32)], 1
        )
        ref_pick = ref_nms_3d_cls(arr, 0.25)
        keep = np.asarray(
            nms_3d_class_aware(
                jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes), 0.25
            )
        )
        assert set(np.where(keep)[0]) == set(ref_pick)

    def test_nms_2d(self):
        rng = np.random.default_rng(13)
        boxes, scores = self._random_aabbs(rng, 30, 2)
        ref_pick = ref_nms_2d(np.concatenate([boxes, scores[:, None]], 1), 0.3)
        keep = np.asarray(nms_2d(jnp.asarray(boxes), jnp.asarray(scores), 0.3))
        assert set(np.where(keep)[0]) == set(ref_pick)


class TestNumpyCorners:
    def test_np_codec_matches_jnp(self):
        """Host-side loader codec (geometry/boxes_np.py) == device codec."""
        import jax.numpy as jnp

        from ov3det.geometry import corners_from_upright_depth_param
        from ov3det.geometry.boxes_np import corners_from_upright_depth_param_np

        rng = np.random.default_rng(0)
        c = rng.normal(size=(5, 7, 3)).astype(np.float32)
        s = rng.uniform(0.2, 2, size=(5, 7, 3)).astype(np.float32)
        a = rng.uniform(-np.pi, np.pi, size=(5, 7)).astype(np.float32)
        want = np.asarray(
            corners_from_upright_depth_param(jnp.asarray(c), jnp.asarray(s), jnp.asarray(a))
        )
        got = corners_from_upright_depth_param_np(c, s, a)
        np.testing.assert_allclose(got, want, atol=1e-5)
