"""Synthetic scene generator in the exact training-batch schema.

Produces dicts with the same keys/shapes/dtypes as the real dataset
__getitem__ (reference datasets/sunrgbd.py:435-462, scannet.py:388-417), so
the train/eval stack is testable end-to-end without SUN RGB-D / ScanNet on
disk.  Scenes contain a floor slab plus points concentrated inside the GT
boxes, so a detector can actually learn from them (loss decreases).
"""
from __future__ import annotations

import numpy as np

from ov3det.geometry.boxes_np import corners_from_upright_depth_param_np


def _angle_to_bin_np(angle: np.ndarray, num_bins: int):
    two_pi = 2 * np.pi
    per = two_pi / num_bins
    a = np.mod(angle, two_pi)
    shifted = np.mod(a + per / 2, two_pi)
    cls = np.floor(shifted / per).astype(np.int64)
    residual = shifted - (cls * per + per / 2)
    return cls, residual.astype(np.float32)


def _bin_to_angle_np(cls, residual, num_bins):
    per = 2 * np.pi / num_bins
    angle = cls * per + residual
    return np.where(angle > np.pi, angle - 2 * np.pi, angle).astype(np.float32)


def make_scene(
    rng: np.random.Generator,
    num_points: int = 2048,
    max_num_obj: int = 64,
    num_semcls: int = 18,
    num_angle_bin: int = 1,
    num_boxes: int | None = None,
    use_color: bool = False,
    scan_idx: int = 0,
) -> dict:
    K = int(num_boxes) if num_boxes is not None else int(rng.integers(1, 9))
    centers = rng.uniform(-2.5, 2.5, size=(K, 3)).astype(np.float32)
    centers[:, 2] = rng.uniform(0.2, 1.5, size=K)
    # classes are LEARNABLE from geometry: class k has a characteristic size
    # (so the classifier head can be trained on synthetic data end-to-end)
    labels = rng.integers(0, num_semcls, size=K).astype(np.int64)
    base = 0.3 + 1.3 * (labels.astype(np.float32) + 0.5) / num_semcls
    sizes = (
        base[:, None] * rng.uniform(0.85, 1.15, size=(K, 3))
    ).astype(np.float32)
    if num_angle_bin > 1:
        raw = rng.uniform(0, 2 * np.pi, size=K).astype(np.float32)
        acls, ares = _angle_to_bin_np(raw, num_angle_bin)
        angles = _bin_to_angle_np(acls, ares, num_angle_bin)
    else:
        angles = np.zeros(K, np.float32)
        acls = np.zeros(K, np.int64)
        ares = np.zeros(K, np.float32)

    # points: 70% inside boxes (uniform in the unrotated box then rotated),
    # 30% floor/background
    n_obj = int(num_points * 0.7)
    per_box = np.full(K, n_obj // K)
    per_box[: n_obj - per_box.sum()] += 1
    pts = []
    for k in range(K):
        local = (rng.uniform(-0.5, 0.5, size=(per_box[k], 3)) * sizes[k]).astype(
            np.float32
        )
        c, s = np.cos(-angles[k]), np.sin(-angles[k])
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        pts.append(local @ rot.T + centers[k])
    n_bg = num_points - n_obj
    bg = rng.uniform(-3.5, 3.5, size=(n_bg, 3)).astype(np.float32)
    bg[:, 2] = rng.uniform(0.0, 0.05, size=n_bg)
    point_cloud = np.concatenate(pts + [bg], axis=0)
    # permutation-gather, NOT rng.shuffle(axis=0): Generator.shuffle on a
    # 2-D array does per-row swaps (~60 ms at 20k points — it was the whole
    # loader bottleneck); the gather is ~40x faster
    point_cloud = point_cloud[rng.permutation(point_cloud.shape[0])]
    if use_color:
        color = rng.uniform(0, 1, size=(num_points, 3)).astype(np.float32) - 0.5
        point_cloud = np.concatenate([point_cloud, color], axis=1)

    pc_min = point_cloud[:, :3].min(axis=0)
    pc_max = point_cloud[:, :3].max(axis=0)
    extent = pc_max - pc_min

    def pad(arr, shape, dtype):
        out = np.zeros(shape, dtype)
        out[: arr.shape[0]] = arr
        return out

    centers_norm = (centers - pc_min) / extent
    corners = corners_from_upright_depth_param_np(
        centers[None], sizes[None], angles[None]
    )[0].astype(np.float32)

    present = np.zeros(max_num_obj, np.float32)
    present[:K] = 1.0
    return {
        "point_clouds": point_cloud.astype(np.float32),
        "gt_box_corners": pad(corners, (max_num_obj, 8, 3), np.float32),
        "gt_box_centers": pad(centers, (max_num_obj, 3), np.float32),
        "gt_box_centers_normalized": pad(
            centers_norm * present[:K, None], (max_num_obj, 3), np.float32
        ),
        "gt_box_sem_cls_label": pad(labels, (max_num_obj,), np.int64),
        "gt_box_present": present,
        "scan_idx": np.int64(scan_idx),
        "gt_box_sizes": pad(sizes, (max_num_obj, 3), np.float32),
        "gt_box_sizes_normalized": pad(sizes / extent, (max_num_obj, 3), np.float32),
        "gt_box_angles": pad(angles, (max_num_obj,), np.float32),
        "gt_angle_class_label": pad(acls, (max_num_obj,), np.int64),
        "gt_angle_residual_label": pad(ares, (max_num_obj,), np.float32),
        "point_cloud_dims_min": pc_min.astype(np.float32),
        "point_cloud_dims_max": pc_max.astype(np.float32),
    }


def make_batch(
    rng: np.random.Generator,
    batch_size: int = 2,
    **scene_kwargs,
) -> dict:
    scenes = [make_scene(rng, scan_idx=i, **scene_kwargs) for i in range(batch_size)]
    return {k: np.stack([s[k] for s in scenes]) for k in scenes[0]}


class SyntheticDataset:
    """Iterable synthetic dataset with the real datasets' interface."""

    def __init__(self, size: int = 64, seed: int = 0, **scene_kwargs):
        self.size = size
        self.seed = seed
        self.scene_kwargs = scene_kwargs
        self.scan_names = [f"synthetic{i:04d}" for i in range(size)]

    def __len__(self):
        return self.size

    def __getitem__(self, idx: int) -> dict:
        rng = np.random.default_rng(self.seed * 100003 + idx)
        return make_scene(rng, scan_idx=idx, **self.scene_kwargs)


class SyntheticOVDataset(SyntheticDataset):
    """Synthetic SUN RGB-D-like scenes + image/calibration fields, matching
    the open-vocab training batch schema (reference datasets/sunrgbd.py:
    275-285): a fixed 530x730 uint8 canvas (image synthesis stands in for
    jpg decode + canvas padding, so host cost and H2D volume are realistic)
    plus per-sample Rtilt/K calibration."""

    IMG_H, IMG_W = 530, 730  # SUN RGB-D max canvas (reference sunrgbd.py:47)

    _RTILT = np.array(
        [[0.999, 0.02, -0.04], [-0.02, 0.999, 0.01], [0.04, -0.01, 0.999]],
        np.float32,
    )
    _K = np.array([[529.5, 0, 365.0], [0, 529.5, 265.0], [0, 0, 1]], np.float32)

    def __getitem__(self, idx: int) -> dict:
        d = super().__getitem__(idx)
        rng = np.random.default_rng(self.seed * 7919 + idx)
        # uint8 end-to-end: 4x less H2D than a float canvas; the teacher
        # normalizes (and so promotes) on device
        d["image"] = rng.integers(
            0, 256, size=(self.IMG_H, self.IMG_W, 3)
        ).astype(np.uint8)
        d["image_height"] = np.int32(self.IMG_H)
        d["image_width"] = np.int32(self.IMG_W)
        d["calib_Rtilt"] = self._RTILT
        d["calib_K"] = self._K
        return d
