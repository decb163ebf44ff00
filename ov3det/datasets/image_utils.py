"""Image/depth/pose loading utilities for multi-frame ScanNet data.

Counterpart of reference utils/image_util.py:17-99 (image_processor):
aspect-preserving NEAREST resize + center crop, ImageNet-style
normalization with the reference's ScanNet statistics, depth maps in
meters, 4x4 camera poses.  Used by the 2D-feature transfer path and the
pseudo-label lifting tools.
"""
from __future__ import annotations

import math
import os
from typing import Optional

import numpy as np

# normalization constants from the reference (utils/image_util.py:41)
SCANNET_IMAGE_MEAN = np.array([0.496342, 0.466664, 0.440796], np.float32)
SCANNET_IMAGE_STD = np.array([0.277856, 0.28623, 0.291129], np.float32)


def resize_crop_image(image: np.ndarray, new_dims: tuple[int, int]) -> np.ndarray:
    """Aspect-preserving NEAREST resize to height, then center-crop width.

    new_dims: (width, height) like the reference (utils/image_util.py:24-33).
    """
    from PIL import Image

    w, h = image.shape[1], image.shape[0]
    new_w, new_h = new_dims
    if (w, h) == (new_w, new_h):
        return image
    resize_width = int(math.floor(new_h * float(w) / float(h)))
    img = Image.fromarray(image).resize((resize_width, new_h), Image.NEAREST)
    # center crop to target width
    left = (resize_width - new_w) // 2
    img = img.crop((left, 0, left + new_w, new_h))
    return np.array(img)


def load_image(path: str, dims: tuple[int, int]) -> np.ndarray:
    """RGB image -> (3, H, W) float32, normalized."""
    from PIL import Image

    img = np.array(Image.open(path).convert("RGB"))
    img = resize_crop_image(img, dims)
    img = img.astype(np.float32) / 255.0
    img = (img - SCANNET_IMAGE_MEAN) / SCANNET_IMAGE_STD
    return img.transpose(2, 0, 1)


def load_depth(path: str, dims: tuple[int, int]) -> np.ndarray:
    """16-bit depth PNG -> (H, W) float32 meters."""
    from PIL import Image

    depth = np.array(Image.open(path))
    depth = resize_crop_image(depth, dims)
    return depth.astype(np.float32) / 1000.0


def load_pose(path: str) -> np.ndarray:
    lines = open(path).read().splitlines()
    return np.array([[float(v) for v in ln.split(" ")] for ln in lines[:4]],
                    np.float32)


def load_scene_frames(
    frames_dir: str,
    scan_name: str,
    image_dims: tuple[int, int] = (328, 256),
    depth_dims: tuple[int, int] = (41, 32),
    max_frames: Optional[int] = None,
):
    """Load all frames of one scene (reference datasets/scannet.py:276-285).

    Returns (images (F,3,H,W), depths (F,h,w), poses (F,4,4)); when
    max_frames is given, pads/truncates to a FIXED frame count (the
    reference leaves F ragged, which cannot batch) plus a validity mask.
    """
    frame_dir = os.path.join(frames_dir, scan_name, "color")
    frame_list = sorted(x.split(".")[0] for x in os.listdir(frame_dir))
    if max_frames is not None:
        frame_list = frame_list[:max_frames]
    images, depths, poses = [], [], []
    for fid in frame_list:
        images.append(load_image(
            os.path.join(frames_dir, scan_name, "color", f"{fid}.jpg"), image_dims))
        depths.append(load_depth(
            os.path.join(frames_dir, scan_name, "depth", f"{fid}.png"), depth_dims))
        poses.append(load_pose(
            os.path.join(frames_dir, scan_name, "pose", f"{fid}.txt")))
    F = len(frame_list)
    images = np.stack(images) if F else np.zeros((0, 3, image_dims[1], image_dims[0]), np.float32)
    depths = np.stack(depths) if F else np.zeros((0, depth_dims[1], depth_dims[0]), np.float32)
    poses = np.stack(poses) if F else np.zeros((0, 4, 4), np.float32)
    if max_frames is None:
        return images, depths, poses, np.ones(F, np.float32)
    pad = max_frames - F
    mask = np.concatenate([np.ones(F, np.float32), np.zeros(pad, np.float32)])
    if pad > 0:
        images = np.concatenate([images, np.zeros((pad,) + images.shape[1:], np.float32)])
        depths = np.concatenate([depths, np.zeros((pad,) + depths.shape[1:], np.float32)])
        poses = np.concatenate([poses, np.tile(np.eye(4, dtype=np.float32)[None], (pad, 1, 1))])
    return images, depths, poses, mask
