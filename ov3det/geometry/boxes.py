"""Box parametrization / corner codecs and coordinate-frame transforms.

Pure-jnp, shape-static, differentiable where meaningful. These replicate the
*conventions* of the reference (VoteNet/3DETR lineage) so that AP evaluation
is bit-comparable:

  * Point clouds live in "upright depth" coords: X right, Y forward, Z up.
  * Box corners are produced in "camera" coords: X right, Y DOWN, Z forward
    (up is -Y).  See reference utils/box_util.py:255-262 (flip_axis_to_camera)
    and utils/box_util.py:355-381 (get_3d_box_batch).
  * Corner ordering: index 0-3 are the top face (+h/2), 4-7 the bottom face,
    with BEV footprint order (+l,+w), (+l,-w), (-l,-w), (-l,+w) before the
    heading rotation about the camera Y axis.

Everything works on arbitrary leading batch dims.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Geometry must be exact: tiny 8x3 rotations would otherwise run at the TPU
# default (bfloat16) matmul precision and corrupt corner coordinates.
_HI = jax.lax.Precision.HIGHEST

# BEV footprint sign pattern for the 8 corners, top face first.
# x holds length (l), y holds height (h), z holds width (w):
# reference utils/box_util.py:368-376.
_CORNER_SIGNS_X = np.array([1, 1, -1, -1, 1, 1, -1, -1], dtype=np.float32)
_CORNER_SIGNS_Y = np.array([1, 1, 1, 1, -1, -1, -1, -1], dtype=np.float32)
_CORNER_SIGNS_Z = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.float32)


def flip_axis_to_camera(xyz: jnp.ndarray) -> jnp.ndarray:
    """Upright-depth (X right, Y fwd, Z up) -> camera (X right, Y down, Z fwd).

    cam (X,Y,Z) = depth (X, -Z, Y). Reference utils/box_util.py:255-262.
    """
    return jnp.stack([xyz[..., 0], -xyz[..., 2], xyz[..., 1]], axis=-1)


def flip_axis_to_depth(xyz: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`flip_axis_to_camera`. Reference utils/ap_calculator.py:23-27."""
    return jnp.stack([xyz[..., 0], xyz[..., 2], -xyz[..., 1]], axis=-1)


def rotz_batch(t: jnp.ndarray) -> jnp.ndarray:
    """Batched rotation about +Z. t: (...,) -> (..., 3, 3). Reference utils/pc_util.py:125-129."""
    c, s = jnp.cos(t), jnp.sin(t)
    zeros = jnp.zeros_like(t)
    ones = jnp.ones_like(t)
    rows = jnp.stack(
        [c, -s, zeros, s, c, zeros, zeros, zeros, ones], axis=-1
    )
    return rows.reshape(t.shape + (3, 3))


def roty_batch(t: jnp.ndarray) -> jnp.ndarray:
    """Batched rotation about +Y. t: (...,) -> (..., 3, 3). Reference utils/box_util.py:220-234."""
    c, s = jnp.cos(t), jnp.sin(t)
    zeros = jnp.zeros_like(t)
    ones = jnp.ones_like(t)
    rows = jnp.stack(
        [c, zeros, s, zeros, ones, zeros, -s, zeros, c], axis=-1
    )
    return rows.reshape(t.shape + (3, 3))


def box_corners_from_param(
    box_size: jnp.ndarray, angle: jnp.ndarray, center: jnp.ndarray
) -> jnp.ndarray:
    """Camera-frame box (l, w, h) + heading + center -> (..., 8, 3) corners.

    Matches reference get_3d_box_batch (utils/box_util.py:355-381): local
    corners are rotated by roty(angle) and shifted by the camera-frame center.
    All inputs share leading dims; size is (..., 3), angle (...,), center (..., 3).
    """
    half = box_size * 0.5
    sx = half[..., 0:1] * _CORNER_SIGNS_X  # length along cam X
    sy = half[..., 2:3] * _CORNER_SIGNS_Y  # height along cam Y
    sz = half[..., 1:2] * _CORNER_SIGNS_Z  # width along cam Z
    local = jnp.stack([sx, sy, sz], axis=-1)  # (..., 8, 3)
    R = roty_batch(angle)  # (..., 3, 3)
    # corners @ R^T, batched over leading dims.
    rotated = jnp.einsum("...kj,...ij->...ki", local, R, precision=_HI)
    return rotated + center[..., None, :]


def corners_from_upright_depth_param(
    center_depth: jnp.ndarray, size: jnp.ndarray, angle: jnp.ndarray
) -> jnp.ndarray:
    """Dataset codec: upright-depth center + (l,w,h) + heading -> camera corners.

    This is `box_parametrization_to_corners` of both dataset configs
    (reference datasets/sunrgbd.py:145-148, datasets/scannet.py:138-141):
    the center is flipped to camera coords first, then corners are built in
    the camera frame with a roty heading rotation.
    """
    return box_corners_from_param(size, angle, flip_axis_to_camera(center_depth))


def gt_corners_upright_depth(
    center: jnp.ndarray, half_size: jnp.ndarray, heading: jnp.ndarray
) -> jnp.ndarray:
    """Upright-depth-frame corners of a raw GT box (half-size parametrized).

    Mirrors `my_compute_box_3d` (reference datasets/sunrgbd.py:155-165):
    rotation by rotz(-heading) applied to (+-l, +-w, +-h) half extents.
    Returns (..., 8, 3) in depth coords (used for the axis-aligned GT AABB).
    """
    sx = half_size[..., 0:1] * np.array([-1, 1, 1, -1, -1, 1, 1, -1], np.float32)
    sy = half_size[..., 1:2] * np.array([1, 1, -1, -1, 1, 1, -1, -1], np.float32)
    sz = half_size[..., 2:3] * np.array([1, 1, 1, 1, -1, -1, -1, -1], np.float32)
    local = jnp.stack([sx, sy, sz], axis=-1)
    R = rotz_batch(-heading)
    rotated = jnp.einsum("...kj,...ij->...ki", local, R, precision=_HI)
    return rotated + center[..., None, :]


def shift_scale_points(
    xyz: jnp.ndarray,
    src_range: tuple[jnp.ndarray, jnp.ndarray],
    dst_range: tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """Affine-map points from src AABB range into dst range (default unit box).

    xyz: (B, N, 3); src_range/dst_range: pair of (B, 3) min/max.
    Reference utils/pc_util.py:38-66.
    """
    src_min, src_max = src_range
    if dst_range is None:
        dst_min = jnp.zeros_like(src_min)
        dst_max = jnp.ones_like(src_max)
    else:
        dst_min, dst_max = dst_range
    src_diff = (src_max - src_min)[:, None, :]
    dst_diff = (dst_max - dst_min)[:, None, :]
    return (xyz - src_min[:, None, :]) * dst_diff / src_diff + dst_min[:, None, :]


def scale_points(xyz: jnp.ndarray, mult_factor: jnp.ndarray) -> jnp.ndarray:
    """Per-batch anisotropic scaling; xyz (B, N, 3), factor (B, 3).

    Reference utils/pc_util.py:69-73.
    """
    return xyz * mult_factor[:, None, :]


def angle_to_bin(angle: jnp.ndarray, num_bins: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Continuous heading -> (bin id, residual).

    bin centers at k*(2pi/N); residual in [-pi/N, pi/N).
    Reference datasets/sunrgbd.py:102-120 (angle2class).
    """
    two_pi = 2.0 * np.pi
    per = two_pi / num_bins
    a = jnp.mod(angle, two_pi)
    shifted = jnp.mod(a + per / 2.0, two_pi)
    cls = jnp.floor(shifted / per).astype(jnp.int32)
    residual = shifted - (cls.astype(angle.dtype) * per + per / 2.0)
    return cls, residual


def bin_to_angle(
    cls: jnp.ndarray, residual: jnp.ndarray, num_bins: int, to_label_format: bool = True
) -> jnp.ndarray:
    """Inverse of :func:`angle_to_bin`; optionally wraps to (-pi, pi].

    Reference datasets/sunrgbd.py:122-140 (class2angle / class2angle_batch).
    """
    per = 2.0 * np.pi / num_bins
    angle = cls.astype(residual.dtype) * per + residual
    if to_label_format:
        angle = jnp.where(angle > np.pi, angle - 2.0 * np.pi, angle)
    return angle


def box_volume_from_corners(corners: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Volume from (..., 8, 3) corners via the three edge lengths at corner 0.

    Reference utils/box_util.py:443-463 (box3d_vol_tensor), clamped at eps.
    """
    a = jnp.sqrt(jnp.clip(jnp.sum((corners[..., 0, :] - corners[..., 1, :]) ** 2, -1), eps))
    b = jnp.sqrt(jnp.clip(jnp.sum((corners[..., 1, :] - corners[..., 2, :]) ** 2, -1), eps))
    c = jnp.sqrt(jnp.clip(jnp.sum((corners[..., 0, :] - corners[..., 4, :]) ** 2, -1), eps))
    return a * b * c
