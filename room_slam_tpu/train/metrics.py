"""Evaluation metrics.

``make_metrics_step`` reproduces the reference evaluator — Hungarian-aligned
mean IoU, TP/FP at an IoU threshold over matched pairs, FN for unmatched GT,
matched-pair classification accuracy (ref: src/benchmark/train.py:234-328) —
as one jitted dispatch per batch returning sums the driver accumulates.

``average_precision_3d`` adds the mAP metric the legacy surface documents
(ref: README.md:127-132) for axis-aligned 3D boxes; host-side, eval-only.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from room_slam_tpu.data.features import featurize
from room_slam_tpu.ops import losses as loss_ops
from room_slam_tpu.ops.iou import eval_pair_iou_3d, pairwise_iou_3d


def metrics_sums(out: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray],
                 iou_thresh: float = 0.5) -> Dict[str, jnp.ndarray]:
    """Metric accumulator sums for one batch of model outputs (pure jnp;
    composable into larger jitted programs)."""
    pred_boxes = out["pred_boxes"]          # [B, Q, 6]
    pred_logits = out["pred_classes"]       # [B, Q, C]
    gt_boxes = batch["boxes"]
    gt_labels = batch["labels"]
    gt_valid = batch["valid"]
    w = batch["weight"]                     # [B]

    rows, matched = loss_ops.match(
        pred_boxes, pred_logits, gt_boxes, gt_labels, gt_valid)
    pair_w = matched & (w[:, None] > 0)

    mp_boxes = jnp.take_along_axis(pred_boxes, rows[..., None], axis=1)
    mp_labels = jnp.argmax(
        jnp.take_along_axis(pred_logits, rows[..., None], axis=1),
        axis=-1)

    ious = eval_pair_iou_3d(mp_boxes, gt_boxes)  # [B, M]
    iou_sum = jnp.sum(jnp.where(pair_w, ious, 0.0))
    iou_cnt = jnp.sum(pair_w)

    tp = jnp.sum(pair_w & (ious >= iou_thresh))
    fp = jnp.sum(pair_w & (ious < iou_thresh))
    # FN: valid GT that could not be matched (only when num_valid > Q)
    num_valid = jnp.sum(gt_valid & (w[:, None] > 0), axis=1)
    num_matched = jnp.sum(pair_w, axis=1)
    fn = jnp.sum(jnp.maximum(num_valid - num_matched, 0))

    cls_correct = jnp.sum(pair_w & (mp_labels == gt_labels))
    cls_total = jnp.sum(pair_w)

    return {
        "iou_sum": iou_sum,
        "iou_cnt": iou_cnt,
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "cls_correct": cls_correct,
        "cls_total": cls_total,
    }


def make_metrics_step(model, iou_thresh: float = 0.5) -> Callable:
    """Returns a jitted fn: (params, batch) -> dict of scalar sums."""

    @jax.jit
    def step(params, batch):
        feats, mask = featurize(batch["raw"], batch["length"])
        out = model.apply(params, feats, mask, deterministic=True)
        return metrics_sums(out, batch, iou_thresh)

    return step


def summarize_metrics(acc: Dict[str, float]) -> Dict[str, float]:
    """Fold accumulated sums into the reference's metric dict
    (ref: train.py:315-328)."""
    miou = acc["iou_sum"] / acc["iou_cnt"] if acc["iou_cnt"] > 0 else 0.0
    precision = acc["tp"] / (acc["tp"] + acc["fp"] + 1e-8)
    recall = acc["tp"] / (acc["tp"] + acc["fn"] + 1e-8)
    f1 = 2 * precision * recall / (precision + recall + 1e-8)
    cls_acc = (
        acc["cls_correct"] / acc["cls_total"] if acc["cls_total"] > 0 else 0.0
    )
    return {
        "mIoU": float(miou),
        "precision": float(precision),
        "recall": float(recall),
        "f1": float(f1),
        "cls_acc": float(cls_acc),
        "tp": int(acc["tp"]),
        "fp": int(acc["fp"]),
        "fn": int(acc["fn"]),
    }


def average_precision_3d(
    pred_boxes: np.ndarray,     # [P, 6]
    pred_labels: np.ndarray,    # [P]
    pred_scores: np.ndarray,    # [P]
    pred_image: np.ndarray,     # [P] image/sample id per prediction
    gt_boxes: np.ndarray,       # [G, 6]
    gt_labels: np.ndarray,      # [G]
    gt_image: np.ndarray,       # [G]
    num_classes: int = 4,
    iou_thresh: float = 0.5,
) -> Tuple[float, Dict[int, float]]:
    """VOC-style AP per class over axis-aligned 3D boxes; returns
    (mAP, per_class_AP). Host-side; the IoU matrices are computed on device
    in one shot per class."""
    aps: Dict[int, float] = {}
    for c in range(num_classes):
        p_sel = pred_labels == c
        g_sel = gt_labels == c
        npos = int(g_sel.sum())
        if npos == 0:
            continue
        if p_sel.sum() == 0:
            aps[c] = 0.0
            continue
        pb = pred_boxes[p_sel]
        ps = pred_scores[p_sel]
        pim = pred_image[p_sel]
        gb = gt_boxes[g_sel]
        gim = gt_image[g_sel]

        order = np.argsort(-ps)
        pb, pim = pb[order], pim[order]
        iou = np.asarray(pairwise_iou_3d(jnp.asarray(pb), jnp.asarray(gb)))
        same_img = pim[:, None] == gim[None, :]
        iou = np.where(same_img, iou, 0.0)

        taken = np.zeros(gb.shape[0], dtype=bool)
        tp = np.zeros(pb.shape[0])
        fp = np.zeros(pb.shape[0])
        for i in range(pb.shape[0]):
            # VOC assignment: best GT overall; FP if it's already taken
            # (crediting via a second-best GT would inflate AP)
            j = int(np.argmax(iou[i]))
            if iou[i, j] >= iou_thresh and not taken[j]:
                taken[j] = True
                tp[i] = 1
            else:
                fp[i] = 1
        tp_c = np.cumsum(tp)
        fp_c = np.cumsum(fp)
        recall = tp_c / npos
        precision = tp_c / np.maximum(tp_c + fp_c, 1e-9)
        # 101-point interpolation
        ap = 0.0
        for r in np.linspace(0, 1, 101):
            mask = recall >= r
            ap += precision[mask].max() if mask.any() else 0.0
        aps[c] = ap / 101
    mAP = float(np.mean(list(aps.values()))) if aps else 0.0
    return mAP, aps


def detection_prf(
    pred_boxes: np.ndarray,     # [P, 6]
    pred_labels: np.ndarray,    # [P]
    pred_scores: np.ndarray,    # [P]
    pred_image: np.ndarray,     # [P]
    gt_boxes: np.ndarray,       # [G, 6]
    gt_labels: np.ndarray,      # [G]
    gt_image: np.ndarray,       # [G]
    iou_thresh: float = 0.5,
) -> Tuple[float, float, float, int]:
    """Operating-point precision/recall/F1 of the POST-PROCESSED detection
    set (VOC greedy assignment per class, same rules as
    average_precision_3d). The matcher-aligned F1 (make_metrics_step)
    scores RAW query outputs like the reference's evaluate_metrics
    (train.py:234-328); this scores what inference actually emits after
    threshold + NMS + refinement. Returns (precision, recall, f1, tp)."""
    tp_total = 0
    npos_total = int(len(gt_boxes))
    npred_total = int(len(pred_boxes))
    for c in np.unique(gt_labels):
        p_sel = pred_labels == c
        g_sel = gt_labels == c
        if p_sel.sum() == 0:
            continue
        pb, ps, pim = (pred_boxes[p_sel], pred_scores[p_sel],
                       pred_image[p_sel])
        gb, gim = gt_boxes[g_sel], gt_image[g_sel]
        order = np.argsort(-ps)
        pb, pim = pb[order], pim[order]
        iou = np.asarray(pairwise_iou_3d(jnp.asarray(pb), jnp.asarray(gb)))
        iou = np.where(pim[:, None] == gim[None, :], iou, 0.0)
        taken = np.zeros(gb.shape[0], dtype=bool)
        for i in range(pb.shape[0]):
            j = int(np.argmax(iou[i]))
            if iou[i, j] >= iou_thresh and not taken[j]:
                taken[j] = True
                tp_total += 1
    precision = tp_total / max(npred_total, 1)
    recall = tp_total / max(npos_total, 1)
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall > 0 else 0.0)
    return precision, recall, f1, tp_total


def average_precision_rotated_2d(
    pred_boxes: np.ndarray,     # [P, 5] (cx, cy, w, h, theta)
    pred_labels: np.ndarray,
    pred_scores: np.ndarray,
    pred_image: np.ndarray,
    gt_boxes: np.ndarray,       # [G, 5]
    gt_labels: np.ndarray,
    gt_image: np.ndarray,
    num_classes: int = 4,
    iou_thresh: float = 0.5,
) -> Tuple[float, Dict[int, float]]:
    """Rotated-box 2D mAP for the legacy surface (ref: README.md:127-132).
    The rotated IoU matrix is one vmapped device dispatch per class."""
    from room_slam_tpu.ops.iou import rotated_iou_2d

    pair_iou = jax.jit(jax.vmap(jax.vmap(
        rotated_iou_2d, in_axes=(None, 0)), in_axes=(0, None)))

    aps: Dict[int, float] = {}
    for c in range(num_classes):
        p_sel = pred_labels == c
        g_sel = gt_labels == c
        npos = int(g_sel.sum())
        if npos == 0:
            continue
        if p_sel.sum() == 0:
            aps[c] = 0.0
            continue
        pb, ps, pim = pred_boxes[p_sel], pred_scores[p_sel], pred_image[p_sel]
        gb, gim = gt_boxes[g_sel], gt_image[g_sel]
        order = np.argsort(-ps)
        pb, pim = pb[order], pim[order]
        iou = np.asarray(pair_iou(jnp.asarray(pb), jnp.asarray(gb)))
        iou = np.where(pim[:, None] == gim[None, :], iou, 0.0)
        taken = np.zeros(gb.shape[0], dtype=bool)
        tp = np.zeros(pb.shape[0])
        fp = np.zeros(pb.shape[0])
        for i in range(pb.shape[0]):
            # VOC assignment (see average_precision_3d)
            j = int(np.argmax(iou[i]))
            if iou[i, j] >= iou_thresh and not taken[j]:
                taken[j] = True
                tp[i] = 1
            else:
                fp[i] = 1
        tp_c, fp_c = np.cumsum(tp), np.cumsum(fp)
        recall = tp_c / npos
        precision = tp_c / np.maximum(tp_c + fp_c, 1e-9)
        ap = 0.0
        for r in np.linspace(0, 1, 101):
            mask = recall >= r
            ap += precision[mask].max() if mask.any() else 0.0
        aps[c] = ap / 101
    mAP = float(np.mean(list(aps.values()))) if aps else 0.0
    return mAP, aps
