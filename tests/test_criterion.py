"""Golden parity: ov3det criterion vs the reference Matcher + SetCriterion.

The reference criterion module needs detectron2/torchvision only for the
RegionCLIP branch; those imports are stubbed and only the matcher and the
geometric/classification losses are exercised (the same functions used in
training: reference criterion.py:18-92, 143-337).
"""
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.conftest import add_reference_to_path, reference_available

from ov3det.config import LossConfig, MatcherConfig
from ov3det.geometry import corners_from_upright_depth_param
from ov3det.losses import set_criterion
from ov3det.losses.criterion import compute_assignments

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo absent")
add_reference_to_path()

# stub modules the reference criterion imports but never uses here
from tests.conftest import stub_module  # noqa: E402

stub_module("detectron2.structures", Boxes=object, Instances=object)
stub_module("detectron2.modeling.meta_arch", CLIPFastRCNN=object)
stub_module("detectron2.config", get_cfg=lambda: None)
stub_module("detectron2.checkpoint", DetectionCheckpointer=object)
stub_module(
    "torchvision.transforms",
    InterpolationMode=object,
    Compose=object,
    Resize=object,
    CenterCrop=object,
    ToTensor=object,
    Normalize=object,
)
stub_module("imageio", imread=None)
stub_module("third_party.pointnet2.pointnet2_modules", PointnetSAModuleVotes=object)
stub_module("third_party.pointnet2.pointnet2_utils", furthest_point_sample=None)

import torch  # noqa: E402
from criterion import Matcher as RefMatcher, SetCriterion as RefSetCriterion  # noqa: E402

L, B, Q, G, NCLS, NBINS = 1, 2, 16, 12, 10, 12


def build_fixture(seed=0):
    rng = np.random.default_rng(seed)
    nactual = np.array([8, 5], np.int64)

    def boxes(K):
        center = rng.uniform(-2, 2, size=(B, K, 3)).astype(np.float32)
        size = rng.uniform(0.3, 1.5, size=(B, K, 3)).astype(np.float32)
        angle = rng.uniform(-np.pi, np.pi, size=(B, K)).astype(np.float32)
        corners = np.asarray(
            corners_from_upright_depth_param(
                jnp.asarray(center), jnp.asarray(size), jnp.asarray(angle)
            )
        ).astype(np.float32)
        return center, size, angle, corners

    p_center, p_size, p_angle, p_corners = boxes(Q)
    g_center, g_size, g_angle, g_corners = boxes(G)
    present = (np.arange(G)[None, :] < nactual[:, None]).astype(np.float32)

    logits = rng.normal(size=(B, Q, NCLS + 1)).astype(np.float32)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)

    outputs = {
        "sem_cls_logits": logits,
        "sem_cls_prob": probs[..., :-1],
        "objectness_prob": 1 - probs[..., -1],
        "center_normalized": rng.uniform(0, 1, size=(B, Q, 3)).astype(np.float32),
        "size_normalized": rng.uniform(0, 1, size=(B, Q, 3)).astype(np.float32),
        "angle_logits": rng.normal(size=(B, Q, NBINS)).astype(np.float32),
        "angle_residual_normalized": rng.normal(size=(B, Q, NBINS)).astype(np.float32),
        "box_corners": p_corners,
        "visual_embeds": rng.normal(size=(B, Q, 32)).astype(np.float32),
    }
    outputs["angle_residual"] = outputs["angle_residual_normalized"] * (np.pi / NBINS)
    targets = {
        "gt_box_corners": g_corners,
        "gt_box_centers_normalized": rng.uniform(0, 1, size=(B, G, 3)).astype(np.float32)
        * present[..., None],
        "gt_box_sem_cls_label": (
            rng.integers(0, NCLS, size=(B, G)) * present
        ).astype(np.int64),
        "gt_box_present": present,
        "gt_box_sizes_normalized": rng.uniform(0.05, 0.8, size=(B, G, 3)).astype(
            np.float32
        )
        * present[..., None],
        "gt_angle_class_label": (rng.integers(0, NBINS, size=(B, G)) * present).astype(
            np.int64
        ),
        "gt_angle_residual_label": (
            rng.uniform(-np.pi / NBINS, np.pi / NBINS, size=(B, G)) * present
        ).astype(np.float32),
        "gt_box_angles": g_angle * present,
    }
    return outputs, targets, nactual


def ref_assignments_and_losses(outputs, targets, nactual, cfg: LossConfig):
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in targets.items()}
    o = {k: torch.from_numpy(np.asarray(v)) for k, v in outputs.items()}
    from utils.box_util import generalized_box3d_iou_tensor

    gious = generalized_box3d_iou_tensor(
        o["box_corners"], t["gt_box_corners"], torch.from_numpy(nactual), True
    )
    o["gious"] = gious
    o["center_dist"] = torch.cdist(
        o["center_normalized"], t["gt_box_centers_normalized"], p=1
    )
    t["nactual_gt"] = torch.from_numpy(nactual)
    t["num_boxes"] = float(max(nactual.sum(), 1))
    t["num_boxes_replica"] = int(nactual.sum())

    m = cfg.matcher
    matcher = RefMatcher(
        cost_class=m.cost_class,
        cost_objectness=m.cost_objectness,
        cost_giou=m.cost_giou,
        cost_center=m.cost_center,
    )
    assignments = matcher(o, t)

    crit = RefSetCriterion.__new__(RefSetCriterion)
    torch.nn.Module.__init__(crit)

    class _DC:
        num_semcls = NCLS
        num_angle_bin = NBINS

    crit.dataset_config = _DC()
    w = torch.ones(NCLS + 1)
    w[-1] = cfg.no_object_weight
    crit.register_buffer("semcls_percls_weights", w)
    crit.loss_weight_dict = {}

    ref_losses = {}
    ref_losses.update(crit.loss_sem_cls(o, t, assignments))
    ref_losses.update(crit.loss_angle(o, t, assignments))
    ref_losses.update(crit.loss_center(o, t, assignments))
    ref_losses.update(crit.loss_giou(o, t, assignments))
    ref_losses.update(crit.loss_size(o, t, assignments))
    ref_losses.update(crit.loss_cardinality(o, t, assignments))
    return assignments, {k: float(v) for k, v in ref_losses.items()}


CFG = LossConfig(
    matcher=MatcherConfig(cost_class=2.0, cost_objectness=0.0, cost_center=5.0, cost_giou=2.0),
    giou_compute_dtype="float32",  # exact parity vs the reference oracle
    matcher_giou="rotated",  # reference-parity matcher cost
    giou_weight=1.0,
    sem_cls_weight=1.0,
    no_object_weight=0.2,
    angle_cls_weight=0.1,
    angle_reg_weight=0.5,
    center_weight=5.0,
    size_weight=1.0,
)


class TestCriterionParity:
    def setup_method(self):
        self.outputs, self.targets, self.nactual = build_fixture()
        self.ref_assign, self.ref_losses = ref_assignments_and_losses(
            self.outputs, self.targets, self.nactual, CFG
        )
        stacked = {
            k: jnp.asarray(v)[None] for k, v in self.outputs.items()
        }  # leading layer axis L=1
        self.stacked = stacked
        self.jt = {k: jnp.asarray(v) for k, v in self.targets.items()}

    def test_matching_matches_reference(self):
        t = dict(self.jt, nactual_gt=jnp.asarray(self.nactual.astype(np.int32)))
        assign = compute_assignments(self.stacked, t, CFG, rotated_boxes=True)
        ours_mask = np.asarray(assign["proposal_matched_mask"])[0]
        ours_inds = np.asarray(assign["per_prop_gt_inds"])[0]
        ref_mask = self.ref_assign["proposal_matched_mask"].numpy()
        ref_inds = self.ref_assign["per_prop_gt_inds"].numpy()
        np.testing.assert_array_equal(ours_mask, ref_mask)
        np.testing.assert_array_equal(ours_inds * ours_mask, ref_inds * ref_mask)

    def test_losses_match_reference(self):
        total, loss_dict = jax.jit(
            lambda o, t: set_criterion(o, t, CFG, NBINS, NCLS)
        )(self.stacked, self.jt)
        # final-layer entries are the bare names; weights applied like the
        # reference (criterion.py:415-419)
        weights = {
            "loss_sem_cls": CFG.sem_cls_weight,
            "loss_angle_cls": CFG.angle_cls_weight,
            "loss_angle_reg": CFG.angle_reg_weight,
            "loss_center": CFG.center_weight,
            "loss_size": CFG.size_weight,
            "loss_giou": CFG.giou_weight,
        }
        for name, w in weights.items():
            ref = self.ref_losses[name] * w
            ours = float(loss_dict[name])
            assert abs(ours - ref) < 5e-3 * max(1.0, abs(ref)), (name, ours, ref)
        assert abs(
            float(loss_dict["loss_cardinality"]) - self.ref_losses["loss_cardinality"]
        ) < 1e-4
        want_total = sum(self.ref_losses[k] * w for k, w in weights.items())
        assert abs(float(total) - want_total) < 5e-3 * max(1.0, abs(want_total))

    def test_gradients_flow_through_losses(self):
        def f(corners):
            out = dict(self.stacked, box_corners=corners)
            total, _ = set_criterion(out, self.jt, CFG, NBINS, NCLS)
            return total

        g = jax.grad(f)(self.stacked["box_corners"])
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_zero_gt_batch(self):
        targets = dict(self.jt, gt_box_present=jnp.zeros_like(self.jt["gt_box_present"]))
        total, loss_dict = set_criterion(self.stacked, targets, CFG, NBINS, NCLS)
        assert np.isfinite(float(total))
        assert float(loss_dict["loss_center"]) == 0.0
        assert float(loss_dict["loss_giou"]) == 0.0
