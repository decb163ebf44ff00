"""SUN RGB-D camera calibration and 3D->2D box projection (batched jnp).

Counterpart of reference utils/image_util.py:117-298
(SUNRGBD_Calibration[_cuda], project_box_3d_cuda): five coordinate systems
(camera / depth / upright depth / upright camera / image); Rtilt maps depth
to upright-depth, K projects camera coords to pixels.  All ops are batched
and jit-compatible so the teacher's box projection runs inside the training
step.

Note: the reference's `project_box_3d[_cuda]` returns the 2D AABB with the
u/v components swapped relative to its own image-clamp convention
(utils/image_util.py:113-115 vs criterion.py:389-391) — here boxes are
consistently (x1, y1, x2, y2) = (u_min, v_min, u_max, v_max) pixels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def flip_axis_to_camera(pc):
    return jnp.stack([pc[..., 0], -pc[..., 2], pc[..., 1]], axis=-1)


def flip_axis_to_depth(pc):
    return jnp.stack([pc[..., 0], pc[..., 2], -pc[..., 1]], axis=-1)


class SunrgbdCalibration:
    """Batched calibration; Rtilt: (..., 3, 3), K: (..., 3, 3)."""

    def __init__(self, Rtilt: jnp.ndarray, K: jnp.ndarray):
        self.Rtilt = jnp.asarray(Rtilt, jnp.float32)
        self.K = jnp.asarray(K, jnp.float32)

    def project_upright_depth_to_camera(self, pc):
        """pc: (..., N, 3) upright-depth -> camera coords."""
        pc2 = jnp.einsum(
            "...ji,...nj->...ni", self.Rtilt, pc, precision=_HI
        )  # Rtilt^T @ pc
        return flip_axis_to_camera(pc2)

    def project_upright_depth_to_image(self, pc):
        """pc: (..., N, 3) -> (uv (..., N, 2), depth (..., N))."""
        cam = self.project_upright_depth_to_camera(pc)
        uvw = jnp.einsum("...ni,...ji->...nj", cam, self.K, precision=_HI)
        uv = uvw[..., :2] / jnp.clip(uvw[..., 2:3], 1e-6)
        return uv, cam[..., 2]

    def project_image_to_camera(self, uv_depth):
        """uv_depth: (..., N, 3) [u, v, depth] -> camera coords."""
        f_u = self.K[..., 0, 0][..., None]
        f_v = self.K[..., 1, 1][..., None]
        c_u = self.K[..., 0, 2][..., None]
        c_v = self.K[..., 1, 2][..., None]
        x = (uv_depth[..., 0] - c_u) * uv_depth[..., 2] / f_u
        y = (uv_depth[..., 1] - c_v) * uv_depth[..., 2] / f_v
        return jnp.stack([x, y, uv_depth[..., 2]], axis=-1)

    def project_image_to_upright_depth(self, uv_depth):
        cam = self.project_image_to_camera(uv_depth)
        depth = flip_axis_to_depth(cam)
        return jnp.einsum("...ij,...nj->...ni", self.Rtilt, depth, precision=_HI)


def box_corners_upright_depth(center, half_size, heading):
    """Raw-box corners in upright depth coords (reference
    utils/image_util.py:102-111, rotz(-heading) over half-size extents)."""
    import numpy as np

    sx = half_size[..., 0:1] * np.array([-1, 1, 1, -1, -1, 1, 1, -1], np.float32)
    sy = half_size[..., 1:2] * np.array([1, 1, -1, -1, 1, 1, -1, -1], np.float32)
    sz = half_size[..., 2:3] * np.array([1, 1, 1, 1, -1, -1, -1, -1], np.float32)
    local = jnp.stack([sx, sy, sz], axis=-1)  # (..., 8, 3)
    c, s = jnp.cos(-heading), jnp.sin(-heading)
    zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
    R = jnp.stack([c, -s, zeros, s, c, zeros, zeros, zeros, ones], axis=-1).reshape(
        heading.shape + (3, 3)
    )
    rotated = jnp.einsum("...kj,...ij->...ki", local, R, precision=_HI)
    return rotated + center[..., None, :]


def project_boxes_to_image(
    calib: SunrgbdCalibration,
    centers: jnp.ndarray,  # (B, Q, 3) upright depth; FULL sizes below
    sizes: jnp.ndarray,  # (B, Q, 3)
    angles: jnp.ndarray,  # (B, Q)
    image_hw: jnp.ndarray | None = None,  # (B, 2) [h, w] for clamping
) -> jnp.ndarray:
    """Predicted 3D boxes -> clamped image-plane AABBs (B, Q, 4) [x1,y1,x2,y2].

    The criterion feeds the model's unnormalized sizes, which are FULL
    extents; the reference passes them into a half-size corner formula
    (criterion.py:368,385 -> image_util.py:104-111), effectively projecting
    double-size boxes — we use half of `sizes` to project the true box.
    """
    corners = box_corners_upright_depth(centers, sizes * 0.5, angles)  # (B, Q, 8, 3)
    B, Q = corners.shape[:2]
    flat = corners.reshape(B, Q * 8, 3)
    uv, _ = calib.project_upright_depth_to_image(flat)
    uv = uv.reshape(B, Q, 8, 2)
    mn = jnp.min(uv, axis=2)
    mx = jnp.max(uv, axis=2)
    boxes = jnp.concatenate([mn, mx], axis=-1)  # (B, Q, 4) x1,y1,x2,y2
    if image_hw is not None:
        h = image_hw[..., 0][:, None]
        w = image_hw[..., 1][:, None]
        boxes = jnp.stack(
            [
                jnp.clip(boxes[..., 0], 0, w),
                jnp.clip(boxes[..., 1], 0, h),
                jnp.clip(boxes[..., 2], 0, w),
                jnp.clip(boxes[..., 3], 0, h),
            ],
            axis=-1,
        )
    return boxes
