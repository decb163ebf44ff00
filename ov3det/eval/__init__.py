from ov3det.eval.ap_calculator import APCalculator, get_ap_config_dict
from ov3det.eval.parse import (
    assemble_predictions,
    parse_predictions_device,
    points_in_box_counts,
)
from ov3det.eval.voc import eval_det, eval_det_cls, voc_ap

__all__ = [
    "APCalculator",
    "get_ap_config_dict",
    "assemble_predictions",
    "parse_predictions_device",
    "points_in_box_counts",
    "eval_det",
    "eval_det_cls",
    "voc_ap",
]
