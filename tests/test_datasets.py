"""On-disk loader tests: fake SUN RGB-D / ScanNet dataset trees.

Exercises the file parsing, open-vocabulary filtering, pseudo-box concat,
augmentation, and padded-dict construction end-to-end (the synthetic
dataset covers only the schema, not the disk formats).
"""
import os

import numpy as np
import pytest

from ov3det.datasets.dataset_configs import ScannetDatasetConfig, SunrgbdDatasetConfig
from ov3det.datasets.scannet import ScannetDetectionDataset
from ov3det.datasets.sunrgbd import SunrgbdDetectionDataset


@pytest.fixture
def sunrgbd_tree(tmp_path):
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        d = tmp_path / f"sunrgbd_pc_bbox_50k_v1_{split}"
        d.mkdir()
        for i in range(3):
            name = f"{i:06d}"
            pc = rng.uniform(-3, 3, size=(3000, 6)).astype(np.float32)
            pc[:, 3:] = rng.uniform(0, 1, size=(3000, 3))
            np.savez(d / f"{name}_pc.npz", pc=pc)
            # boxes: half sizes, heading, class — mix of base (0-9) and
            # support (10-19) classes
            K = 5
            boxes = np.zeros((K, 8), np.float32)
            boxes[:, 0:3] = rng.uniform(-2, 2, size=(K, 3))
            boxes[:, 3:6] = rng.uniform(0.2, 0.8, size=(K, 3))
            boxes[:, 6] = rng.uniform(-np.pi, np.pi, size=K)
            boxes[:, 7] = [2, 5, 11, 14, 16]
            np.save(d / f"{name}_bbox.npy", boxes)
    # pseudo boxes
    pdir = tmp_path / "pseudo"
    pdir.mkdir()
    for i in range(3):
        pb = np.zeros((2, 8), np.float32)
        pb[:, 3:6] = 0.3
        pb[:, 7] = 18
        np.save(pdir / f"{i:06d}_bbox.npy", pb)
    return tmp_path


class TestSunrgbdLoader:
    def test_train_filters_to_support_classes(self, sunrgbd_tree):
        cfg = SunrgbdDatasetConfig()
        ds = SunrgbdDetectionDataset(
            cfg, "train", root_dir=str(sunrgbd_tree / "sunrgbd_pc_bbox_50k_v1"),
            num_points=1024, augment=False,
        )
        assert len(ds) == 3
        item = ds[0]
        # only support classes (>= 10) survive the open-vocab filter
        n = int(item["gt_box_present"].sum())
        labels = item["gt_box_sem_cls_label"][:n]
        assert n == 3 and (labels >= 10).all()
        assert item["point_clouds"].shape == (1024, 3)
        assert item["gt_box_corners"].shape == (64, 8, 3)

    def test_val_keeps_all_classes(self, sunrgbd_tree):
        cfg = SunrgbdDatasetConfig()
        ds = SunrgbdDetectionDataset(
            cfg, "val", root_dir=str(sunrgbd_tree / "sunrgbd_pc_bbox_50k_v1"),
            num_points=1024,
        )
        item = ds[1]
        assert int(item["gt_box_present"].sum()) == 5

    def test_pseudo_boxes_concat(self, sunrgbd_tree):
        cfg = SunrgbdDatasetConfig()
        ds = SunrgbdDetectionDataset(
            cfg, "train", root_dir=str(sunrgbd_tree / "sunrgbd_pc_bbox_50k_v1"),
            pseudo_box_dir=str(sunrgbd_tree / "pseudo"),
            num_points=1024, use_pbox=True,
        )
        item = ds[0]
        assert int(item["gt_box_present"].sum()) == 5  # 3 support + 2 pseudo

    def test_augmented_sample_valid(self, sunrgbd_tree):
        cfg = SunrgbdDatasetConfig()
        ds = SunrgbdDetectionDataset(
            cfg, "train", root_dir=str(sunrgbd_tree / "sunrgbd_pc_bbox_50k_v1"),
            num_points=1024, augment=True, use_color=True,
            random_cuboid_min_points=100,
        )
        item = ds[2]
        assert item["point_clouds"].shape == (1024, 6)
        assert np.isfinite(item["point_clouds"]).all()
        assert np.isfinite(item["gt_box_corners"]).all()
        n = int(item["gt_box_present"].sum())
        assert 1 <= n <= 3
        # angle re-encoding keeps angles in (-pi, pi]
        ang = item["gt_box_angles"][:n]
        assert (ang > -np.pi - 1e-5).all() and (ang <= np.pi + 1e-5).all()


@pytest.fixture
def scannet_tree(tmp_path):
    rng = np.random.default_rng(1)
    data = tmp_path / "scannet_train_detection_data"
    meta = tmp_path / "meta_data"
    data.mkdir()
    meta.mkdir()
    names = [f"scene{i:04d}_00" for i in range(3)]
    for name in names:
        verts = rng.uniform(-3, 3, size=(4000, 6)).astype(np.float32)
        verts[:, 3:] = rng.uniform(0, 255, size=(4000, 3))
        np.save(data / f"{name}_vert.npy", verts)
        nyu = ScannetDatasetConfig().nyu40ids
        K = 4
        boxes = np.zeros((K, 7), np.float32)
        boxes[:, 0:3] = rng.uniform(-2, 2, size=(K, 3))
        boxes[:, 3:6] = rng.uniform(0.3, 1.2, size=(K, 3))
        boxes[:, 6] = rng.choice(nyu, size=K)
        np.save(data / f"{name}_bbox.npy", boxes)
    (meta / "scannetv2_train.txt").write_text("\n".join(names[:2]))
    (meta / "scannetv2_val.txt").write_text(names[2])
    return tmp_path


class TestScannetLoader:
    def test_split_files_and_class_mapping(self, scannet_tree):
        cfg = ScannetDatasetConfig()
        ds = ScannetDetectionDataset(
            cfg, "train",
            root_dir=str(scannet_tree / "scannet_train_detection_data"),
            meta_data_dir=str(scannet_tree / "meta_data"),
            num_points=2048,
        )
        assert len(ds) == 2
        item = ds[0]
        n = int(item["gt_box_present"].sum())
        assert n == 4
        assert (item["gt_box_sem_cls_label"][:n] < 18).all()
        assert item["gt_box_angles"].sum() == 0  # axis-aligned

    def test_augment_and_color(self, scannet_tree):
        cfg = ScannetDatasetConfig()
        ds = ScannetDetectionDataset(
            cfg, "val",
            root_dir=str(scannet_tree / "scannet_train_detection_data"),
            meta_data_dir=str(scannet_tree / "meta_data"),
            num_points=2048, use_color=True, augment=True,
        )
        item = ds[0]
        assert item["point_clouds"].shape == (2048, 6)
        assert np.isfinite(item["point_clouds"]).all()
        # colors normalized to ~[-0.5, 0.6]
        assert np.abs(item["point_clouds"][:, 3:]).max() < 1.0

    def test_use_image_via_registry(self, scannet_tree):
        """--use_image on ScanNet must flow CLI -> DataConfig -> registry ->
        dataset (reference datasets/scannet.py:276-285 loads frames from a
        hardcoded root; here frames_dir is config) and yield fixed-shape
        images/depths/poses/frame_mask fields."""
        from PIL import Image

        from ov3det.config import DataConfig
        from ov3det.datasets.registry import build_dataset

        frames = scannet_tree / "frames_square"
        rng = np.random.default_rng(3)
        for name in ("scene0000_00", "scene0001_00"):
            for sub in ("color", "depth", "pose"):
                (frames / name / sub).mkdir(parents=True)
            for fid in range(2):
                img = rng.integers(0, 256, size=(48, 64, 3)).astype(np.uint8)
                Image.fromarray(img).save(frames / name / "color" / f"{fid}.jpg")
                depth = rng.integers(0, 5000, size=(48, 64)).astype(np.int32)
                Image.fromarray(depth, mode="I").save(
                    frames / name / "depth" / f"{fid}.png"
                )
                pose = np.eye(4) + rng.normal(0, 0.01, (4, 4))
                np.savetxt(frames / name / "pose" / f"{fid}.txt", pose)

        cfg = DataConfig(
            dataset_name="scannet",
            root_dir=str(scannet_tree / "scannet_train_detection_data"),
            meta_data_dir=str(scannet_tree / "meta_data"),
            num_points=2048,
            use_image=True,
            frames_dir=str(frames),
            max_frames=4,
        )
        datasets, _ = build_dataset(cfg, splits=("train",))
        item = datasets["train"][0]
        assert item["images"].shape == (4, 3, 256, 328)
        assert item["depths"].shape == (4, 32, 41)
        assert item["poses"].shape == (4, 4, 4)
        np.testing.assert_array_equal(item["frame_mask"], [1, 1, 0, 0])
        assert np.isfinite(item["images"]).all()
        # padded frames are zero, padded poses identity
        assert item["images"][2:].sum() == 0
        np.testing.assert_array_equal(item["poses"][2], np.eye(4))
