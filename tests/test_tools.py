"""Pseudo-label tool parity tests vs the reference 3DOVDet_tools code."""
import importlib.util
import json
import os

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, reference_available

from ov3det.tools import (
    LabelFormatter,
    PRCalculator,
    assign_box_label_from_gt,
    box_3d_iou,
    cs2vv,
    distribute_boxes,
    gss_nms,
    vv2cs,
)
from ov3det.tools.projection_np import ProjectionHelper

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo absent")


def load_ref_module(rel_path, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REFERENCE_ROOT, rel_path)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ref_box3d = load_ref_module("3DOVDet_tools/utils/box_3d_utils.py", "ref_box3d")


class TestBox3dUtils:
    def test_iou_matches(self):
        rng = np.random.default_rng(0)
        mn = rng.uniform(-2, 2, size=(10, 3))
        boxes = np.concatenate([mn, mn + rng.uniform(0.2, 2, size=(10, 3))], 1)
        q = boxes[0]
        np.testing.assert_allclose(
            box_3d_iou(q, boxes), ref_box3d.box_3d_iou(q, boxes.copy()), atol=1e-9
        )
        # center-size layout
        cs = vv2cs(boxes.copy())
        np.testing.assert_allclose(
            box_3d_iou(cs[0], cs, typ="cs"),
            ref_box3d.box_3d_iou(cs[0].copy(), cs.copy(), typ="cs"),
            atol=1e-9,
        )

    def test_vv_cs_roundtrip(self):
        rng = np.random.default_rng(1)
        mn = rng.uniform(-2, 2, size=(6, 3))
        boxes = np.concatenate(
            [mn, mn + rng.uniform(0.2, 2, size=(6, 3)), rng.uniform(size=(6, 2))], 1
        )
        np.testing.assert_allclose(cs2vv(vv2cs(boxes.copy())), boxes, atol=1e-9)
        # parity with the reference's in-place versions
        np.testing.assert_allclose(vv2cs(boxes.copy()), ref_box3d.vv2cs(boxes.copy()), atol=1e-9)

    @pytest.mark.parametrize("kwargs", [
        {"class_wise": True},
        {"class_wise": False},
        {"use_size_score": True, "class_wise": True, "size_typ": "Volume"},
    ])
    def test_gss_nms_matches(self, kwargs):
        rng = np.random.default_rng(2)
        K = 30
        mn = rng.uniform(-2, 2, size=(K, 3))
        rows = np.concatenate(
            [
                mn,
                mn + rng.uniform(0.3, 1.5, size=(K, 3)),
                rng.uniform(0.1, 1, size=(K, 1)),
                rng.integers(0, 3, size=(K, 1)).astype(float),
                rng.uniform(0.1, 2, size=(K, 2)),
            ],
            1,
        )
        ours = gss_nms(rows.copy(), 0.3, **kwargs)
        ref = ref_box3d.nms_3d_faster(rows.copy(), 0.3, **kwargs)
        np.testing.assert_allclose(np.sort(ours[:, 0]), np.sort(ref[:, 0]), atol=1e-9)


class TestProjectionHelper:
    def _setup(self):
        proj = ProjectionHelper(0.1, 10.0, (240, 320))
        intr = np.array(
            [[577.87, 0, 319.5, 0], [0, 577.87, 239.5, 0], [0, 0, 1, 0], [0, 0, 0, 1]]
        )
        return proj, proj.resize_intrinsic(intr)

    def test_frustum_contains_projected_points(self):
        proj, intr = self._setup()
        pose = np.eye(4)  # camera at origin looking +z
        box2d = np.array([80.0, 60.0, 120.0, 100.0, 0.9, 3.0])  # xywh in 320x240
        cc = proj.compute_frustum_corners(pose, box2d, intr)
        normals = proj.compute_frustum_normals(cc)
        # points straight ahead inside the frustum's central cone
        rng = np.random.default_rng(3)
        depths = rng.uniform(0.5, 5.0, 64)
        u = rng.uniform(box2d[0] + 10, box2d[0] + box2d[2] - 10, 64)
        v = rng.uniform(box2d[1] + 10, box2d[1] + box2d[3] - 10, 64)
        pts_in = proj.depth2xyz(u, v, depths, intr)
        mask = proj.points_in_frustum(cc, normals, pts_in)
        assert mask.mean() > 0.95
        # points far outside the box's cone must be excluded
        u_out = rng.uniform(0, box2d[0] - 40, 64)
        pts_out = proj.depth2xyz(u_out, v, depths, intr)
        mask_out = proj.points_in_frustum(cc, normals, pts_out)
        assert mask_out.mean() < 0.05

    def test_compute_frustum_box_lifts_aabb(self):
        proj, intr = self._setup()
        pose = np.eye(4)
        rng = np.random.default_rng(4)
        # scene: one labeled cluster in front of the camera
        cluster = rng.normal(scale=0.2, size=(200, 3)) + np.array([0.0, 0.0, 2.0])
        bg = rng.uniform(-4, 4, size=(300, 3)) + np.array([0, 0, 6.0])
        points = np.concatenate([cluster, bg])
        labels = np.concatenate([np.full(200, 5), np.full(300, 2)])
        # 2D box covering the cluster's projection (center of image)
        box2d = np.array([100.0, 80.0, 120.0, 90.0, 0.8, 5.0])
        lifted = proj.compute_frustum_box(
            points, None, pose, [box2d], labels, np.eye(4), intr, view="multi"
        )
        assert lifted.shape[0] == 1
        mn, mx = lifted[0, :3], lifted[0, 3:6]
        assert (mx - mn < 1.8).all()  # tight around the cluster
        assert abs((mn[2] + mx[2]) / 2 - 2.0) < 0.5


class TestLabelFormatterAndTools:
    def test_label_formatter_pipeline(self, tmp_path):
        rng = np.random.default_rng(5)
        # scene: background points + a dense class-3 cluster inside the box
        bg = rng.uniform(-2, 2, size=(450, 3)).astype(np.float32)
        cluster = rng.uniform(0.2, 0.8, size=(50, 3)).astype(np.float32)
        pts = np.concatenate([bg, cluster])
        sem = rng.integers(0, 18, size=(500, 1)).astype(np.float32)
        inside = np.all(np.abs(pts - 0.5) < 0.4, -1)
        sem[inside] = 3.0
        label_dir = tmp_path / "labels"
        label_dir.mkdir()
        np.save(label_dir / "scene0000_00.npy", np.concatenate([pts, sem], 1))

        fmt = LabelFormatter(str(tmp_path / "out"), str(label_dir), ["scene0000_00"])
        Q = 4
        outputs = {
            "sem_cls_prob": np.zeros((1, Q, 18), np.float32),
            "objectness_prob": np.full((1, Q), 0.95, np.float32),
            "center_unnormalized": np.tile(
                np.array([0.5, 0.5, 0.5], np.float32)[None, None], (1, Q, 1)
            ),
            "size_unnormalized": np.full((1, Q, 3), 0.8, np.float32),
        }
        outputs["sem_cls_prob"][..., 3] = 0.9
        batch = {"scan_idx": np.array([0])}
        fmt.step(outputs, batch)
        n = fmt.process(topk=10, th_s=0.5, th_o=0.5, processes=0)
        assert n == Q  # all boxes agree with the modal label
        saved = np.load(tmp_path / "out" / "scene0000_00_bbox.npy")
        assert saved.shape == (Q, 7)
        assert (saved[:, 6] == 3).all()

    def test_assign_box_label_from_gt(self):
        rng = np.random.default_rng(6)
        pts = rng.uniform(-1, 1, size=(400, 3))
        sem = np.where(pts[:, 0] > 0, 7, 2)
        props = np.array([[0.5, 0, 0, 0.8, 1.5, 1.5], [-0.5, 0, 0, 0.8, 1.5, 1.5]])
        out = assign_box_label_from_gt(props, pts, sem)
        assert out.shape == (2, 8)
        assert out[0, 6] == 7 and out[1, 6] == 2

    def test_distribute_boxes(self, tmp_path):
        preds = [
            {
                "image_id": 17,
                "instances": [
                    {"score": 0.9, "category_id": 2, "bbox": [1, 2, 3, 4]},
                    {"score": 0.5, "category_id": 2, "bbox": [1, 2, 3, 4]},  # below thresh
                    {"score": 0.9, "category_id": 30, "bbox": [1, 2, 3, 4]},  # bg
                ],
            }
        ]
        n = distribute_boxes(preds, str(tmp_path), score_thresh=0.7)
        assert n == 1
        arr = np.load(tmp_path / "17.npy")
        assert arr.shape == (1, 6)
        np.testing.assert_allclose(arr[0], [1, 2, 3, 4, 0.9, 2])

    def test_pr_calculator(self):
        calc = PRCalculator(ap_iou_thresh=0.25)
        gt = [[(0, np.array([0, 0, 0, 1, 1, 1.0]))]]
        preds_good = [[(0, np.array([0.05, 0, 0, 1.05, 1, 1.0]), 0.9)]]
        calc.step(preds_good, gt)
        m = calc.compute_metrics()
        assert m["AR"] == 1.0 and m["mPrecision"] == 1.0


class TestImageUtils:
    def test_resize_crop_nearest(self):
        from ov3det.datasets.image_utils import resize_crop_image

        # checkerboard 480x640 -> (328, 256): nearest keeps binary values
        img = np.indices((480, 640)).sum(0) % 2
        img = (img * 255).astype(np.uint8)
        out = resize_crop_image(img, (328, 256))
        assert out.shape == (256, 328)
        assert set(np.unique(out)) <= {0, 255}

    def test_load_scene_frames_padding(self, tmp_path):
        from PIL import Image
        from ov3det.datasets.image_utils import load_scene_frames

        scene = tmp_path / "scene0000_00"
        for sub in ("color", "depth", "pose"):
            (scene / sub).mkdir(parents=True)
        for fid in (0, 20):
            Image.fromarray(
                np.random.randint(0, 255, (480, 640, 3), np.uint8)
            ).save(scene / "color" / f"{fid}.jpg")
            Image.fromarray(
                np.random.randint(0, 4000, (480, 640)).astype(np.int32), mode="I"
            ).save(scene / "depth" / f"{fid}.png")
            np.savetxt(scene / "pose" / f"{fid}.txt", np.eye(4))
        images, depths, poses, mask = load_scene_frames(
            str(tmp_path), "scene0000_00", max_frames=4
        )
        assert images.shape == (4, 3, 256, 328)
        assert depths.shape == (4, 32, 41)
        assert poses.shape == (4, 4, 4)
        np.testing.assert_array_equal(mask, [1, 1, 0, 0])


class TestLiftSunrgbd:
    def test_lift_scene_backprojects_box(self, tmp_path):
        """A 2D box over a uniform-depth, label-matched region lifts to the
        AABB of its back-projected pixels (reference sunrgbd/lift_boxes.py
        :38-61 flow)."""
        from PIL import Image

        from ov3det.tools.lift_boxes import LiftConfig, lift_scene_sunrgbd

        H = W = 64
        # identity Rtilt; K with f=32, c=32 (both written column-major)
        calib = tmp_path / "calib"
        calib.mkdir()
        (calib / "000001.txt").write_text(
            "1 0 0 0 1 0 0 0 1\n32 0 0 0 32 0 32 32 1\n"
        )
        depth_mm = np.full((H, W), 2000, np.uint16)  # 2 m everywhere
        ddir = tmp_path / "depth"
        ddir.mkdir()
        Image.fromarray(depth_mm).save(ddir / "000001.png")
        cls = 3
        sem = np.full((H, W), 7, np.int64)
        sem[10:31, 10:31] = cls  # label-matched region == the 2D box
        ldir = tmp_path / "label"
        ldir.mkdir()
        np.save(ldir / "000001.npy", sem)
        b2d = tmp_path / "boxes2d"
        b2d.mkdir()
        np.save(b2d / "000001.npy",
                np.array([[10, 10, 20, 20, 0.9, cls]], np.float64))
        out_dir = tmp_path / "out"

        n = lift_scene_sunrgbd(
            "000001",
            calib_path_fmt=str(calib / "{}.txt"),
            depth_path_fmt=str(ddir / "{}.png"),
            label_path_fmt=str(ldir / "{}.npy"),
            boxes2d_dir=str(b2d),
            out_dir=str(out_dir),
            cfg=LiftConfig(use_gss=False),
        )
        assert n == 1
        box = np.load(out_dir / "000001_bbox.npy")[0]
        # pixels u,v in [10,30], depth 2: x=(u-32)*2/32, cam y=(v-32)*2/32,
        # depth coords (x, z=2, -y) -> AABB center/size
        lo, hi = (10 - 32) * 2 / 32, (30 - 32) * 2 / 32
        np.testing.assert_allclose(box[0], (lo + hi) / 2, atol=1e-6)  # cx
        np.testing.assert_allclose(box[1], 2.0, atol=1e-6)  # cy (depth)
        np.testing.assert_allclose(box[2], -(lo + hi) / 2, atol=1e-6)  # cz=-y
        np.testing.assert_allclose(box[3], hi - lo, atol=1e-6)  # dx
        np.testing.assert_allclose(box[4], 0.0, atol=1e-6)  # flat in depth
        assert box[6] == cls and box[7] == pytest.approx(0.9)

    def test_border_boxes_dropped(self, tmp_path):
        from ov3det.tools.projection_np import get_edge_mask_2d

        boxes = np.array([
            [0, 10, 20, 20, 0.9, 1],     # touches left edge
            [10, 10, 54, 20, 0.9, 1],    # x+w == W
            [10, 10, 20, 20, 0.9, 1],    # interior
        ], np.float64)
        kept = get_edge_mask_2d(boxes, (64, 64))
        assert kept.shape[0] == 1 and kept[0, 0] == 10


class TestFormatTools:
    def test_adjust_format_to_nyu40(self, tmp_path):
        from ov3det.tools.format_tools import NYU40IDS, adjust_format_to_nyu40

        ind = tmp_path / "in"
        outd = tmp_path / "out"
        ind.mkdir()
        boxes = np.array([[0, 0, 0, 1, 1, 1, 0, 0.9],
                          [1, 1, 1, 2, 2, 2, 17, 0.8]])
        np.save(ind / "scene0000_00_bbox.npy", boxes)
        np.save(ind / "scene0001_00_bbox.npy", np.zeros((0, 8)))
        adjust_format_to_nyu40(str(ind), str(outd),
                               ["scene0000_00", "scene0001_00"])
        out = np.load(outd / "scene0000_00_bbox.npy")
        assert out.shape == (2, 7)  # score column dropped
        assert out[0, 6] == NYU40IDS[0] and out[1, 6] == NYU40IDS[17]
        assert np.load(outd / "scene0001_00_bbox.npy").shape == (0, 7)

    def test_label_agreement_matches_reference_formula(self):
        """Oracle for assess_pseudo_label.py:28-48: map GT nyu40 ids and
        pseudo >=18 ids to IGNORE, then count equal pixels over ALL pixels."""
        from ov3det.tools.format_tools import assess_pseudo_labels, label_agreement
        from ov3det.tools.projection_np import NYU40IDS

        rng = np.random.default_rng(0)
        # GT frames: raw nyu40 ids (incl. unlabeled ids not in the 18-class set)
        gt = rng.choice(np.concatenate([NYU40IDS, [0, 1, 2, 40]]), size=(3, 16, 16))
        # pseudo frames: 0..17 plus junk ids >= 18
        ps = rng.integers(0, 22, size=(3, 16, 16))

        count, total = label_agreement(ps, gt)
        assert total == ps.size
        # independent re-derivation of the reference's mapping
        nyu2cls = {int(n): i for i, n in enumerate(NYU40IDS)}
        gt_m = np.vectorize(lambda v: nyu2cls.get(int(v), -100))(gt)
        ps_m = np.where(ps >= 18, -100, ps)
        assert count == int(np.sum(gt_m == ps_m))

        # perfect agreement saturates at 1.0
        perfect = np.where(gt_m >= 0, gt_m, 100)  # pseudo junk where GT ignored
        c2, t2 = label_agreement(perfect, gt)
        assert c2 == t2

        rep = assess_pseudo_labels([(ps, gt), (perfect, gt)])
        assert rep["total"] == 2 * ps.size
        assert rep["count"] == count + c2
        assert rep["per_scene"][1] == 1.0
        assert 0.0 <= rep["correctness"] <= 1.0

    def test_generate_categories_matches_reference_schema(self):
        from ov3det.tools.format_tools import generate_categories

        cats = generate_categories(["chair", "sofa"])
        assert cats[0]["id"] == 1 and cats[1]["name"] == "sofa"
        assert cats[0]["synset"] == "chair.n.01"
        assert set(cats[0]) == {
            "id", "name", "frequency", "synset", "synonyms", "def",
            "instance_count", "image_count",
        }


class TestClipLoss:
    def test_symmetric_infonce(self):
        """reference utils/ulip_losses.py:14-53 semantics: symmetric CE over
        pc<->text logits with scale 1/0.07; perfect alignment on orthogonal
        embeddings -> acc 100 and loss ~0."""
        import jax.numpy as jnp

        from ov3det.losses.clip_loss import clip_contrastive_loss

        B, D = 4, 8
        embeds = np.eye(B, D).astype(np.float32)
        loss, metrics = clip_contrastive_loss(
            jnp.asarray(embeds), jnp.asarray(embeds)
        )
        assert float(metrics["clip_acc"]) == 100.0
        assert float(loss) < 1e-4

        rng = np.random.default_rng(0)
        pc = rng.normal(size=(B, D)).astype(np.float32)
        tx = rng.normal(size=(B, D)).astype(np.float32)
        loss, _ = clip_contrastive_loss(jnp.asarray(pc), jnp.asarray(tx))
        # numpy oracle of the reference formula
        pcn = pc / np.linalg.norm(pc, axis=-1, keepdims=True)
        txn = tx / np.linalg.norm(tx, axis=-1, keepdims=True)
        logits = (1 / 0.07) * pcn @ txn.T
        def ce(lg):
            lse = np.log(np.exp(lg - lg.max(-1, keepdims=True)).sum(-1)) + lg.max(-1)
            return np.mean(lse - np.diag(lg))
        expected = 0.5 * (ce(logits) + ce(logits.T))
        np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


class TestClipText:
    def _tokenizer(self, tmp_path):
        import gzip

        from ov3det.models.clip_text import SimpleBPETokenizer

        merges = "#version\nh e\nl l\nhe ll\nhell o</w>\no</w> !\n"
        path = tmp_path / "bpe.txt.gz"
        with gzip.open(path, "wt", encoding="utf-8") as f:
            f.write(merges)
        return SimpleBPETokenizer(str(path), context_length=12)

    def test_bpe_greedy_merges(self, tmp_path):
        tok = self._tokenizer(tmp_path)
        # "hello" -> h+e, l+l, he+ll, hell+o</w> by ascending merge rank
        ids = tok.encode("hello")
        assert len(ids) == 1 and ids[0] == tok.encoder["hello</w>"]
        # unmergeable word falls back to byte-level pieces (+ </w> on last)
        ids = tok.encode("hi")
        assert ids == [tok.encoder["h"], tok.encoder["i</w>"]]

    def test_call_frames_and_pads(self, tmp_path):
        tok = self._tokenizer(tmp_path)
        arr = tok(["hello", "hello hello"])
        assert arr.shape == (2, 12)
        sot, eot = tok.encoder["<|startoftext|>"], tok.encoder["<|endoftext|>"]
        assert arr[0, 0] == sot and arr[0, 2] == eot and arr[0, 3:].sum() == 0
        assert list(arr[1, :4]) == [sot, tok.encoder["hello</w>"],
                                    tok.encoder["hello</w>"], eot]

    def test_extract_class_embeddings(self, tmp_path):
        import jax

        from ov3det.models.clip_text import (
            CLIPTextEncoder,
            extract_class_embeddings,
            tokenize_prompts,
        )

        tok = self._tokenizer(tmp_path)
        enc = CLIPTextEncoder(vocab_size=1000, context_length=12, width=32,
                              heads=2, layers=2, embed_dim=16)
        prompts = tokenize_prompts(
            ["hello", "hi", "hello"], tok, templates=["a {}.", "the {}."]
        )
        assert prompts.shape == (3, 2, 12)
        variables = enc.init(jax.random.PRNGKey(0), prompts[0] % 1000)
        emb = extract_class_embeddings(enc, variables, prompts % 1000)
        assert emb.shape == (3, 16)
        np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, rtol=1e-5)
        # identical class names -> identical ensembled embeddings
        np.testing.assert_allclose(emb[0], emb[2], atol=1e-6)
        assert not np.allclose(emb[0], emb[1], atol=1e-3)


class TestVisualize:
    def test_ply_roundtrip(self, tmp_path):
        from ov3det.utils.visualize import (
            boxes_cs_to_corners,
            write_scene_with_boxes,
        )

        rng = np.random.default_rng(0)
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        cols = rng.uniform(size=(50, 3)).astype(np.float32)
        boxes = np.array([[0, 0, 0, 2, 4, 6, 3, 0.9]])
        corners = boxes_cs_to_corners(boxes)
        assert corners.shape == (1, 8, 3)
        np.testing.assert_allclose(corners.min(1), [[-1, -2, -3]])
        np.testing.assert_allclose(corners.max(1), [[1, 2, 3]])

        write_scene_with_boxes(pts, corners, str(tmp_path / "scene"), cols)
        pc = (tmp_path / "scene_pc.ply").read_text().splitlines()
        assert pc[0] == "ply" and "element vertex 50" in pc
        body = pc[pc.index("end_header") + 1:]
        assert len(body) == 50 and len(body[0].split()) == 6  # xyz + rgb
        np.testing.assert_allclose(
            [float(v) for v in body[0].split()[:3]], pts[0], atol=1e-4
        )
        bx = (tmp_path / "scene_boxes.ply").read_text().splitlines()
        assert "element vertex 8" in bx and "element edge 12" in bx
        assert bx[-1] == "3 7"  # last edge of the canonical box wiring


class TestLiftScannet:
    """Scene-level e2e of the ScanNet frustum-lifting pipeline
    (reference 3DOVDet_tools/scannet/lift_boxes.py:53-188): planted labeled
    clusters -> frustum + label mask -> AABB -> class NMS -> (GSS snap)."""

    F, CX, CY = 400.0, 320.0, 240.0  # 640x480 intrinsics; halved to 320x240

    def _make_scene(self, tmp_path, gss_boxes=None):
        from PIL import Image

        scan = "scene0000_00"
        frames = tmp_path / "frames" / scan
        for sub in ("color", "depth", "pose"):
            (frames / sub).mkdir(parents=True)
        np.savetxt(
            tmp_path / "frames" / scan / "intrinsic_depth.txt",
            np.array([[self.F, 0, self.CX, 0], [0, self.F, self.CY, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]]),
        )
        rng = np.random.default_rng(0)
        # object A: label 5 cluster at z~2 on the optical axis
        a = rng.uniform([-0.2, -0.2, 1.9], [0.2, 0.2, 2.1], (200, 3))
        # object B: label 7 cluster offset in x (still in view)
        b = rng.uniform([0.7, -0.15, 2.4], [1.0, 0.15, 2.6], (150, 3))
        # decoys: label 5 far off-axis (outside any frustum), label 3 inside
        # object A's frustum (wrong label)
        decoy_far = rng.uniform([5.0, 5.0, 2.0], [5.5, 5.5, 2.5], (50, 3))
        decoy_lbl = rng.uniform([-0.1, -0.1, 1.95], [0.1, 0.1, 2.05], (50, 3))
        pts = np.concatenate([a, b, decoy_far, decoy_lbl])
        labels = np.concatenate(
            [np.full(200, 5.0), np.full(150, 7.0), np.full(50, 5.0),
             np.full(50, 3.0)]
        )
        det = tmp_path / "det"
        det.mkdir()
        np.save(det / f"{scan}_vert.npy", pts.astype(np.float32))
        # pseudo-label layout: (N, 4) xyz + class id
        np.save(tmp_path / f"{scan}_sem.npy",
                np.concatenate([pts, labels[:, None]], 1))

        def box2d(cluster):
            # project the cluster through the RESIZED intrinsics (f/2)
            u = cluster[:, 0] * (self.F / 2) / cluster[:, 2] + self.CX / 2
            v = cluster[:, 1] * (self.F / 2) / cluster[:, 2] + self.CY / 2
            x, y = np.floor(u.min()) - 3, np.floor(v.min()) - 3
            w = np.ceil(u.max()) - x + 3
            h = np.ceil(v.max()) - y + 3
            return [x, y, w, h]

        b2d = tmp_path / "boxes2d" / scan / "color"
        b2d.mkdir(parents=True)
        # frame 0: both objects, high scores; frame 1: same view, lower
        # scores -> per-class NMS must dedupe to the frame-0 boxes
        np.save(b2d / "0.npy",
                np.array([box2d(a) + [0.9, 5], box2d(b) + [0.8, 7]]))
        np.save(b2d / "1.npy",
                np.array([box2d(a) + [0.6, 5], box2d(b) + [0.5, 7]]))
        for fid in (0, 1):
            (frames / "color" / f"{fid}.jpg").touch()
            Image.fromarray(
                np.full((240, 320), 2000, np.int32), mode="I"
            ).save(frames / "depth" / f"{fid}.png")
            np.savetxt(frames / "pose" / f"{fid}.txt", np.eye(4))
        if gss_boxes is not None:
            np.save(tmp_path / f"{scan}_gss.npy", gss_boxes)
        return scan, a, b

    def _lift(self, tmp_path, scan, use_gss=False):
        from ov3det.tools.lift_boxes import LiftConfig, lift_scene_scannet

        return lift_scene_scannet(
            scan,
            detection_data_dir=str(tmp_path / "det") + "/",
            frames_dir=str(tmp_path / "frames"),
            label_path_fmt=str(tmp_path / "{}_sem.npy"),
            boxes2d_dir=str(tmp_path / "boxes2d"),
            out_dir=str(tmp_path / "out"),
            gss_path_fmt=str(tmp_path / "{}_gss.npy") if use_gss else None,
            cfg=LiftConfig(use_gss=use_gss, image_dims=(240, 320)),
            pseudo_labels=True,
        )

    def test_lifted_boxes_match_planted_clusters(self, tmp_path):
        scan, a, b = self._make_scene(tmp_path)
        n = self._lift(tmp_path, scan)
        assert n == 2
        out = np.load(tmp_path / "out" / f"{scan}_bbox.npy")
        out = out[np.argsort(out[:, 6])]  # sort by label: 5 then 7
        for row, cluster, lbl, score in ((out[0], a, 5, 0.9), (out[1], b, 7, 0.8)):
            lo, hi = cluster.min(0), cluster.max(0)
            np.testing.assert_allclose(row[:3], (lo + hi) / 2, atol=1e-5)
            np.testing.assert_allclose(row[3:6], hi - lo, atol=1e-5)
            assert row[6] == lbl and row[7] == pytest.approx(score)

    def test_gss_snap_transfers_label_and_geometry(self, tmp_path):
        # proposal 0 overlaps object A (IoU >= 0.3): the output box must BE
        # the proposal's geometry carrying A's label+score; proposal 1
        # overlaps nothing and must be dropped
        gss = np.array([
            [0.0, 0.0, 2.0, 0.5, 0.5, 0.3],   # cs: near object A's AABB
            [-3.0, -3.0, 8.0, 0.4, 0.4, 0.4],  # unmatched
        ])
        scan, a, b = self._make_scene(tmp_path, gss_boxes=gss)
        n = self._lift(tmp_path, scan, use_gss=True)
        out = np.load(tmp_path / "out" / f"{scan}_bbox.npy")
        snapped = out[out[:, 6] == 5]
        assert snapped.shape[0] == 1
        np.testing.assert_allclose(snapped[0, :6], gss[0], atol=1e-6)
        assert snapped[0, 7] == pytest.approx(0.9)


class TestScannetIO:
    """Raw-ScanNet readers (reference 3DOVDet_tools/utils/io_utils.py:1-139)."""

    def _write_binary_ply(self, path, xyz, rgb=None, extra_face=True):
        """Hand-rolled binary_little_endian PLY in ScanNet's vertex layout."""
        import struct

        n = xyz.shape[0]
        props = (b"property float x\nproperty float y\nproperty float z\n")
        if rgb is not None:
            props += (b"property uchar red\nproperty uchar green\n"
                      b"property uchar blue\nproperty float quality\n")
        header = (
            b"ply\nformat binary_little_endian 1.0\ncomment made by test\n"
            + b"element vertex %d\n" % n + props
            + (b"element face 1\nproperty list uchar int vertex_indices\n"
               if extra_face else b"")
            + b"end_header\n"
        )
        with open(path, "wb") as f:
            f.write(header)
            for i in range(n):
                f.write(struct.pack("<fff", *xyz[i]))
                if rgb is not None:
                    f.write(struct.pack("<BBBf", *rgb[i].astype(np.uint8), 0.5))
            if extra_face:
                f.write(struct.pack("<Biii", 3, 0, 1, 2))

    def test_read_binary_ply_with_rgb_and_trailing_face(self, tmp_path):
        from ov3det.tools.scannet_io import (read_ply_vertices,
                                             read_ply_vertices_rgb)

        rng = np.random.default_rng(0)
        xyz = rng.uniform(-2, 2, size=(17, 3)).astype(np.float32)
        rgb = rng.integers(0, 256, size=(17, 3)).astype(np.float32)
        p = tmp_path / "scene_vh_clean_2.ply"
        self._write_binary_ply(p, xyz, rgb)
        np.testing.assert_allclose(read_ply_vertices(str(p)), xyz, rtol=1e-6)
        got_xyz, got_rgb = read_ply_vertices_rgb(str(p))
        np.testing.assert_allclose(got_xyz, xyz, rtol=1e-6)
        np.testing.assert_allclose(got_rgb, rgb)

    def test_read_ascii_ply_roundtrips_own_writer(self, tmp_path):
        from ov3det.tools.scannet_io import read_ply_vertices_rgb
        from ov3det.utils.visualize import write_ply

        rng = np.random.default_rng(1)
        xyz = rng.uniform(-1, 1, size=(9, 3)).astype(np.float32)
        rgb = rng.integers(0, 256, size=(9, 3)).astype(np.float64)
        p = tmp_path / "pc.ply"
        write_ply(xyz, str(p), colors=rgb)
        got_xyz, got_rgb = read_ply_vertices_rgb(str(p))
        np.testing.assert_allclose(got_xyz, xyz, atol=1e-4)  # %.4f writer
        np.testing.assert_allclose(got_rgb, rgb)

    def test_label_mapping_aggregation_segs_alignment(self, tmp_path):
        from ov3det.tools.scannet_io import (read_aggregation,
                                             read_axis_alignment,
                                             read_label_mapping,
                                             read_segmentation)

        tsv = tmp_path / "labels.tsv"
        tsv.write_text("raw_category\tnyu40id\tnyu40class\n"
                       "chair\t5\tchair\n" "sofa bed\t6\tsofa\n")
        m = read_label_mapping(str(tsv))
        assert m == {"chair": 5, "sofa bed": 6}

        # numeric source column -> int keys (reference represents_int branch)
        tsv2 = tmp_path / "ids.tsv"
        tsv2.write_text("id\tnyu40id\n" "3\t5\n" "9\t6\n")
        assert read_label_mapping(str(tsv2), label_from="id") == {3: 5, 9: 6}

        agg = tmp_path / "scene.aggregation.json"
        agg.write_text(json.dumps({"segGroups": [
            {"objectId": 0, "label": "chair", "segments": [4, 7]},
            {"objectId": 1, "label": "chair", "segments": [9]},
            {"objectId": 2, "label": "table", "segments": [2]},
        ]}))
        obj2segs, lab2segs = read_aggregation(str(agg))
        assert obj2segs == {1: [4, 7], 2: [9], 3: [2]}  # 1-indexed
        assert lab2segs == {"chair": [4, 7, 9], "table": [2]}

        segs = tmp_path / "scene.segs.json"
        seg_indices = [7, 4, 7, 2, 4, 4]
        segs.write_text(json.dumps({"segIndices": seg_indices}))
        seg2verts, nverts = read_segmentation(str(segs))
        assert nverts == 6
        assert seg2verts == {2: [3], 4: [1, 4, 5], 7: [0, 2]}

        meta = tmp_path / "scene.txt"
        mat = np.arange(16, dtype=np.float64) / 3.0
        meta.write_text("colorWidth = 1296\naxisAlignment = "
                        + " ".join(str(float(v)) for v in mat)
                        + "\nnumPorts = 2\n")
        np.testing.assert_allclose(read_axis_alignment(str(meta)),
                                   mat.reshape(4, 4))


class TestSegMetrics:
    """tools/seg_metrics.py vs an independent per-class brute-force oracle
    with the reference's exact eps/ignore/average semantics (reference
    3DOVDet_tools/utils/image_segmentation_metrics.py)."""

    @staticmethod
    def _oracle_matrix(gt, pred_ids, C):
        m = np.zeros((3, C))
        for i in range(C):
            p = (pred_ids == i).astype(np.float64).reshape(-1)
            g = (gt == i).astype(np.float64).reshape(-1)
            tp = (p * g).sum()
            m[:, i] = tp, p.sum() - tp, g.sum() - tp
        return m

    def test_multiclass_matches_oracle(self):
        from ov3det.tools import SegmentationMetrics
        from ov3det.tools.seg_metrics import confusion_counts

        rng = np.random.default_rng(0)
        N, C, H, W = 2, 5, 13, 17
        gt = rng.integers(0, C, (N, H, W))
        logits = rng.normal(size=(N, C, H, W)).astype(np.float32)
        pred_ids = np.argmax(logits, axis=1)

        want = self._oracle_matrix(gt, pred_ids, C)
        np.testing.assert_array_equal(confusion_counts(gt, pred_ids, C), want)

        eps = 1e-5
        m = want[:, 1:]  # ignore_background drops class 0 AFTER counting
        exp_acc = (m[0].sum() + eps) / (m[0].sum() + m[1].sum())
        exp_dice = np.mean((2 * m[0] + eps) / (2 * m[0] + m[1] + m[2] + eps))
        exp_p = np.mean((m[0] + eps) / (m[0] + m[1] + eps))
        exp_r = np.mean((m[0] + eps) / (m[0] + m[2] + eps))

        for act in ("0-1", "softmax", None):  # same argmax decision
            acc, dice, prec, rec = SegmentationMetrics(activation=act)(gt, logits)
            np.testing.assert_allclose(
                [acc, dice, prec, rec], [exp_acc, exp_dice, exp_p, exp_r],
                rtol=1e-12,
            )
        # class-id input path + per-class (average=False) output
        _, dice_vec, _, _ = SegmentationMetrics(average=False)(gt, pred_ids)
        np.testing.assert_allclose(
            dice_vec, (2 * m[0] + eps) / (2 * m[0] + m[1] + m[2] + eps)
        )
        # keep background: perfect prediction drives every metric to ~1
        acc, dice, prec, rec = SegmentationMetrics(ignore_background=False)(
            gt, gt
        )
        assert min(acc, dice, prec, rec) > 0.999

    def test_binary_matches_formulas(self):
        from ov3det.tools import BinaryMetrics

        rng = np.random.default_rng(1)
        N, H, W = 3, 9, 11
        t = rng.integers(0, 2, (N, H, W)).astype(np.float64)
        logits = rng.normal(size=(N, 1, H, W))
        p = (1.0 / (1.0 + np.exp(-logits[:, 0])) > 0.5).astype(np.float64)
        tp = (p * t).sum(); fp = (p * (1 - t)).sum()
        fn = ((1 - p) * t).sum(); tn = ((1 - p) * (1 - t)).sum()
        eps = 1e-5
        want = (
            (tp + tn + eps) / (tp + tn + fp + fn + eps),
            (2 * tp + eps) / (2 * tp + fp + fn + eps),
            (tp + eps) / (tp + fp + eps),
            (tn + eps) / (tn + fp + eps),
            (tp + eps) / (tp + fn + eps),
        )
        got = BinaryMetrics()(t, logits)
        np.testing.assert_allclose(got, want, rtol=1e-12)
        with pytest.raises(ValueError):
            BinaryMetrics()(t, np.zeros((N, 2, H, W)))
