"""Eval stack parity vs the reference (VOC AP, NMS-parse, APCalculator)."""
import sys
import types

import numpy as np
import pytest
import jax.numpy as jnp

from tests.conftest import add_reference_to_path, reference_available

from ov3det.eval import APCalculator, eval_det, points_in_box_counts, voc_ap
from ov3det.geometry.iou_np import box3d_iou_batch_np
from ov3det.geometry import corners_from_upright_depth_param

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo absent")
add_reference_to_path()

import torch  # noqa: E402
from utils.box_util import box3d_iou as ref_box3d_iou, extract_pc_in_box3d  # noqa: E402
from utils.eval_det import eval_det as ref_eval_det, get_iou_obb, voc_ap as ref_voc_ap  # noqa: E402
from utils.ap_calculator import APCalculator as RefAPCalculator  # noqa: E402


def random_corners(rng, K, rotated=True):
    center = rng.uniform(-3, 3, size=(1, K, 3)).astype(np.float32)
    size = rng.uniform(0.3, 2.0, size=(1, K, 3)).astype(np.float32)
    angle = (
        rng.uniform(-np.pi, np.pi, size=(1, K)).astype(np.float32)
        if rotated
        else np.zeros((1, K), np.float32)
    )
    return np.asarray(
        corners_from_upright_depth_param(
            jnp.asarray(center), jnp.asarray(size), jnp.asarray(angle)
        )
    )[0].astype(np.float32)


class TestNumpyIoU:
    def test_matches_reference_pairwise(self):
        rng = np.random.default_rng(0)
        c1 = random_corners(rng, 6)
        c2 = random_corners(rng, 5)
        ours = box3d_iou_batch_np(c1.astype(np.float64), c2.astype(np.float64))
        for i in range(6):
            for j in range(5):
                ref, _ = ref_box3d_iou(c1[i], c2[j])
                assert abs(ours[i, j] - ref) < 2e-3, (i, j, ours[i, j], ref)


class TestVocAP:
    def test_matches_reference(self):
        rng = np.random.default_rng(1)
        for _ in range(5):
            n = int(rng.integers(3, 30))
            rec = np.sort(rng.uniform(0, 1, n))
            prec = rng.uniform(0, 1, n)
            assert abs(voc_ap(rec, prec) - ref_voc_ap(rec, prec)) < 1e-9
            assert abs(voc_ap(rec, prec, True) - ref_voc_ap(rec, prec, True)) < 1e-9


class TestEvalDet:
    def _random_detset(self, seed, n_scans=6, n_cls=4):
        rng = np.random.default_rng(seed)
        pred_all, gt_all = {}, {}
        for s in range(n_scans):
            n_gt = int(rng.integers(1, 6))
            gts = random_corners(rng, n_gt)
            gt_all[s] = [(int(rng.integers(0, n_cls)), gts[j]) for j in range(n_gt)]
            n_det = int(rng.integers(0, 10))
            if n_det:
                dets = random_corners(rng, n_det)
                # half the detections are jittered copies of GT boxes
                for j in range(n_det // 2):
                    g = gt_all[s][j % n_gt][1]
                    dets[j] = g + rng.normal(scale=0.02, size=(8, 3)).astype(np.float32)
                pred_all[s] = [
                    (int(rng.integers(0, n_cls)), dets[j], float(rng.uniform(0.1, 1)))
                    for j in range(n_det)
                ]
            else:
                pred_all[s] = []
        return pred_all, gt_all

    @pytest.mark.parametrize("thresh", [0.25, 0.5])
    def test_matches_reference(self, thresh):
        pred_all, gt_all = self._random_detset(2)
        _, _, ap_ref = ref_eval_det(pred_all, gt_all, ovthresh=thresh, get_iou_func=get_iou_obb)
        _, _, ap_ours = eval_det(pred_all, gt_all, ovthresh=thresh)
        for cls in ap_ref:
            r = float(ap_ref[cls]) if not isinstance(ap_ref[cls], int) else ap_ref[cls]
            o = float(ap_ours[cls]) if not isinstance(ap_ours[cls], int) else ap_ours[cls]
            assert abs(o - r) < 1e-6, (cls, o, r)


class TestPointsInBox:
    def test_matches_delaunay(self):
        rng = np.random.default_rng(3)
        corners = random_corners(rng, 4)  # camera frame
        pts_depth = rng.uniform(-4, 4, size=(600, 3)).astype(np.float32)
        counts = np.asarray(
            points_in_box_counts(jnp.asarray(pts_depth[None]), jnp.asarray(corners[None]))
        )[0]
        from utils.ap_calculator import flip_axis_to_depth

        for k in range(4):
            box_depth = flip_axis_to_depth(corners[k])
            pc_in, _ = extract_pc_in_box3d(pts_depth, box_depth)
            assert abs(int(counts[k]) - len(pc_in)) <= 2, (k, counts[k], len(pc_in))


class TestAPCalculatorParity:
    def test_full_pipeline_matches_reference(self):
        rng = np.random.default_rng(4)
        B, K, C, N = 2, 24, 5, 800

        corners = np.stack([random_corners(rng, K) for _ in range(B)])
        logits = rng.normal(size=(B, K, C + 1)).astype(np.float32)
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        sem_probs = probs[..., :-1]
        obj = (1 - probs[..., -1]).astype(np.float32)
        pts = rng.uniform(-4, 4, size=(B, N, 3)).astype(np.float32)

        n_gt = 6
        gt_corners = np.stack([random_corners(rng, n_gt) for _ in range(B)])
        gt_labels = rng.integers(0, C, size=(B, n_gt))
        gt_present = np.ones((B, n_gt), np.float32)

        class _DC:
            num_semcls = C

        ref_calc = RefAPCalculator(
            dataset_config=_DC(), ap_iou_thresh=[0.25, 0.5], exact_eval=True
        )
        ref_calc.step(
            predicted_box_corners=torch.from_numpy(corners),
            sem_cls_probs=torch.from_numpy(sem_probs),
            objectness_probs=torch.from_numpy(obj),
            point_cloud=torch.from_numpy(pts),
            gt_box_corners=torch.from_numpy(gt_corners),
            gt_box_sem_cls_labels=torch.from_numpy(gt_labels),
            gt_box_present=torch.from_numpy(gt_present),
        )
        ref_metrics = ref_calc.compute_metrics()

        ours = APCalculator(dataset_config=_DC(), ap_iou_thresh=[0.25, 0.5], exact_eval=True)
        ours.step(
            predicted_box_corners=jnp.asarray(corners),
            sem_cls_probs=jnp.asarray(sem_probs),
            objectness_probs=jnp.asarray(obj),
            point_cloud=jnp.asarray(pts),
            gt_box_corners=gt_corners,
            gt_box_sem_cls_labels=gt_labels,
            gt_box_present=gt_present,
        )
        our_metrics = ours.compute_metrics()

        for t in (0.25, 0.5):
            assert abs(our_metrics[t]["mAP"] - ref_metrics[t]["mAP"]) < 2e-3, (
                t,
                our_metrics[t]["mAP"],
                ref_metrics[t]["mAP"],
            )
            assert abs(our_metrics[t]["AR"] - ref_metrics[t]["AR"]) < 2e-3


class TestNativeIoU:
    def test_native_matches_numpy(self):
        from ov3det.native import box3d_iou_batch_native, native_available

        if not native_available():
            pytest.skip("no C++ toolchain")
        rng = np.random.default_rng(7)
        c1 = random_corners(rng, 12).astype(np.float32)
        c2 = random_corners(rng, 9).astype(np.float32)
        want = box3d_iou_batch_np(
            c1.astype(np.float64), c2.astype(np.float64), allow_native=False
        )
        got = box3d_iou_batch_native(c1, c2)
        np.testing.assert_allclose(got, want, atol=2e-4)
