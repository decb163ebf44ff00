from ov3det.tools.box3d_np import box_3d_iou, cs2vv, gss_nms, vv2cs
from ov3det.tools.evaluate_box import PRCalculator, evaluate_pseudo_boxes
from ov3det.tools.format_tools import (
    adjust_format_to_nyu40,
    assess_pseudo_labels,
    assign_box_label_from_gt,
    distribute_boxes,
    generate_categories,
    label_agreement,
)
from ov3det.tools.label_formatter import LabelFormatter
from ov3det.tools.lift_boxes import (
    LiftConfig,
    lift_scene_scannet,
    lift_scene_sunrgbd,
    run_pool,
)
from ov3det.tools.projection_np import ProjectionHelper, SunrgbdCalibrationNp
from ov3det.tools.seg_metrics import (
    BinaryMetrics,
    SegmentationMetrics,
    confusion_counts,
)

__all__ = [
    "box_3d_iou",
    "cs2vv",
    "gss_nms",
    "vv2cs",
    "PRCalculator",
    "evaluate_pseudo_boxes",
    "adjust_format_to_nyu40",
    "assess_pseudo_labels",
    "assign_box_label_from_gt",
    "label_agreement",
    "distribute_boxes",
    "generate_categories",
    "LabelFormatter",
    "LiftConfig",
    "lift_scene_scannet",
    "lift_scene_sunrgbd",
    "run_pool",
    "ProjectionHelper",
    "SunrgbdCalibrationNp",
    "SegmentationMetrics",
    "BinaryMetrics",
    "confusion_counts",
]
