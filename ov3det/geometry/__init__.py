from ov3det.geometry.boxes import (
    flip_axis_to_camera,
    flip_axis_to_depth,
    rotz_batch,
    roty_batch,
    box_corners_from_param,
    corners_from_upright_depth_param,
    shift_scale_points,
    scale_points,
    angle_to_bin,
    bin_to_angle,
    box_volume_from_corners,
)
from ov3det.geometry.iou import (
    generalized_box3d_iou,
    axis_aligned_iou_3d,
    enclosing_aabb_volume,
    rotated_bev_intersection_area,
    box3d_iou_corners,
)
from ov3det.geometry.nms import nms_3d, nms_3d_class_aware, nms_2d

__all__ = [
    "flip_axis_to_camera",
    "flip_axis_to_depth",
    "rotz_batch",
    "roty_batch",
    "box_corners_from_param",
    "corners_from_upright_depth_param",
    "shift_scale_points",
    "scale_points",
    "angle_to_bin",
    "bin_to_angle",
    "box_volume_from_corners",
    "generalized_box3d_iou",
    "axis_aligned_iou_3d",
    "enclosing_aabb_volume",
    "rotated_bev_intersection_area",
    "box3d_iou_corners",
    "nms_3d",
    "nms_3d_class_aware",
    "nms_2d",
]
