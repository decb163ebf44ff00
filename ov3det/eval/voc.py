"""VOC-style detection AP (host side, VoteNet-exact).

Counterpart of reference utils/eval_det.py: per-class greedy TP/FP matching
over confidence-sorted detections + precision-envelope AP integration.  The
semantics are identical; the per-pair python IoU calls are replaced by one
vectorized det-x-gt IoU matrix per scan (ov3det.geometry.iou_np), and the
class loop can optionally fan out over a process pool like the reference's
Pool(10) (utils/eval_det.py:253).
"""
from __future__ import annotations

from multiprocessing import Pool
from typing import Callable, Optional

import numpy as np

from ov3det.geometry.iou_np import box3d_iou_batch_np


def voc_ap(rec: np.ndarray, prec: np.ndarray, use_07_metric: bool = False) -> float:
    """Precision-envelope AP (reference utils/eval_det.py:23-54)."""
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            p = 0.0 if np.sum(rec >= t) == 0 else float(np.max(prec[rec >= t]))
            ap += p / 11.0
        return ap
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    i = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[i + 1] - mrec[i]) * mpre[i + 1]))


def eval_det_cls(pred, gt, ovthresh=0.25, use_07_metric=False):
    """Greedy matching for one class (reference utils/eval_det.py:66-155).

    pred: {scan_id: [(corners, score)]}; gt: {scan_id: [corners]}.
    """
    class_recs = {}
    npos = 0
    for img_id in gt.keys():
        bbox = np.array(gt[img_id])
        class_recs[img_id] = {"bbox": bbox, "det": [False] * len(bbox)}
        npos += len(bbox)
    for img_id in pred.keys():
        if img_id not in gt:
            class_recs[img_id] = {"bbox": np.array([]), "det": []}

    image_ids, confidence, BB = [], [], []
    for img_id in pred.keys():
        for box, score in pred[img_id]:
            image_ids.append(img_id)
            confidence.append(score)
            BB.append(box)
    confidence = np.array(confidence)
    BB = np.array(BB)

    # vectorized IoU: one matrix per scan instead of one clip per pair
    iou_cache = {}
    for img_id in pred.keys():
        gts = class_recs[img_id]["bbox"]
        dets = np.array([b for b, _ in pred[img_id]])
        if len(dets) and len(gts):
            iou_cache[img_id] = box3d_iou_batch_np(
                dets.astype(np.float64), gts.astype(np.float64)
            )
    det_rank = {}  # order of each detection within its scan's pred list

    sorted_ind = np.argsort(-confidence) if len(confidence) else []
    nd = len(image_ids)
    tp = np.zeros(nd)
    fp = np.zeros(nd)
    per_img_counter = {img: 0 for img in pred.keys()}
    det_index_in_img = []
    for img in image_ids:
        det_index_in_img.append(per_img_counter[img])
        per_img_counter[img] += 1

    for rank, d in enumerate(sorted_ind):
        img_id = image_ids[d]
        R = class_recs[img_id]
        ovmax, jmax = -np.inf, -1
        if R["bbox"].size > 0:
            ious = iou_cache[img_id][det_index_in_img[d]]
            jmax = int(np.argmax(ious))
            ovmax = float(ious[jmax])
        if ovmax > ovthresh:
            if not R["det"][jmax]:
                tp[rank] = 1.0
                R["det"][jmax] = True
            else:
                fp[rank] = 1.0
        else:
            fp[rank] = 1.0

    fp = np.cumsum(fp)
    tp = np.cumsum(tp)
    rec = tp / float(npos) if npos > 0 else np.zeros_like(tp)
    prec = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    return rec, prec, voc_ap(rec, prec, use_07_metric)


def _eval_cls_wrapper(args):
    return eval_det_cls(*args)


def eval_det(
    pred_all: dict,
    gt_all: dict,
    ovthresh: float = 0.25,
    use_07_metric: bool = False,
    processes: int = 0,
):
    """Multi-class AP (reference utils/eval_det.py:164-272).

    pred_all: {scan: [(cls, corners, score)]}; gt_all: {scan: [(cls, corners)]}.
    processes > 0 fans the class loop over a process pool.
    """
    pred, gt = {}, {}
    for img_id, dets in pred_all.items():
        for classname, bbox, score in dets:
            pred.setdefault(classname, {}).setdefault(img_id, []).append((bbox, score))
            gt.setdefault(classname, {}).setdefault(img_id, [])
    for img_id, gts in gt_all.items():
        for classname, bbox in gts:
            gt.setdefault(classname, {}).setdefault(img_id, []).append(bbox)

    rec, prec, ap = {}, {}, {}
    work = [(cls, pred[cls], gt[cls]) for cls in gt.keys() if cls in pred]
    if processes > 0 and len(work) > 1:
        with Pool(processes=min(processes, len(work))) as pool:
            results = pool.map(
                _eval_cls_wrapper,
                [(p, g, ovthresh, use_07_metric) for _, p, g in work],
            )
    else:
        results = [eval_det_cls(p, g, ovthresh, use_07_metric) for _, p, g in work]
    for (cls, _, _), (r, p, a) in zip(work, results):
        rec[cls], prec[cls], ap[cls] = r, p, a
    for cls in gt.keys():
        if cls not in pred:
            rec[cls], prec[cls], ap[cls] = 0, 0, 0
    return rec, prec, ap
