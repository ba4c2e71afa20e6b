"""Set-prediction criterion: Hungarian matching + fused CE / L1 / GIoU loss.

Reproduces the reference ``SetCriterion`` (src/benchmark/train.py:64-187) as
one fixed-shape, fully on-device function:

- match cost = 1.0 * (-softmax prob of the GT class) + 5.0 * L1 distance
  (train.py:17, 44-53)
- class loss: cross-entropy over matched pairs (train.py:137-158)
- box loss: mean L1 over matched pair elements + mean (1 - GIoU)
  (train.py:160-187)
- total = 2.0 * class + 5.0 * l1 + 2.0 * giou (train.py:433-437)

All means are weighted means over matched pairs with a per-sample weight so
that batch-padding samples (weight 0) contribute nothing — the fixed-shape
equivalent of the reference's concatenate-then-mean over a ragged batch.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from room_slam_tpu.ops import iou as iou_ops
from room_slam_tpu.ops.hungarian import hungarian_match, hungarian_match_fast

DEFAULT_COST_CLASS = 1.0
DEFAULT_COST_BOX = 5.0
DEFAULT_WEIGHTS = {"class_loss": 2.0, "l1_loss": 5.0, "giou_loss": 2.0}


def match_cost(
    pred_boxes: jnp.ndarray,
    pred_logits: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    cost_class: float = DEFAULT_COST_CLASS,
    cost_box: float = DEFAULT_COST_BOX,
) -> jnp.ndarray:
    """Batched match cost ``[B, Q, M]`` (ref: train.py:44-53)."""
    prob = jax.nn.softmax(pred_logits, axis=-1)  # [B, Q, C]
    safe_labels = jnp.clip(gt_labels, 0, prob.shape[-1] - 1)  # [B, M]
    # c_class[b, q, m] = -prob[b, q, labels[b, m]]
    c_class = -jnp.take_along_axis(
        prob[:, :, None, :],
        jnp.broadcast_to(
            safe_labels[:, None, :, None],
            (*prob.shape[:2], gt_labels.shape[1], 1),
        ),
        axis=-1,
    )[..., 0]
    c_box = jnp.sum(
        jnp.abs(pred_boxes[:, :, None, :] - gt_boxes[:, None, :, :]), axis=-1
    )
    return cost_class * c_class + cost_box * c_box


def match(
    pred_boxes: jnp.ndarray,
    pred_logits: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hungarian matching per batch item.

    Returns (row_for_col ``[B, M]`` int32, matched ``[B, M]`` bool).
    """
    cost = match_cost(pred_boxes, pred_logits, gt_boxes, gt_labels)
    return jax.vmap(hungarian_match_fast)(cost, gt_valid)


def _weighted_mean(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    denom = jnp.sum(w)
    return jnp.where(denom > 0, jnp.sum(x * w) / jnp.maximum(denom, 1e-12), 0.0)


def set_criterion(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    sample_weight: jnp.ndarray | None = None,
    loss_weights: Dict[str, float] = DEFAULT_WEIGHTS,
) -> Dict[str, jnp.ndarray]:
    """Full set loss. Outputs/targets follow the reference dict contract:

    outputs: pred_boxes [B, Q, 6], pred_classes [B, Q, C]
    targets: boxes [B, M, 6], labels [B, M], valid_mask [B, M]
    sample_weight: [B] float (1 = real sample, 0 = batch padding); optional.
    """
    pred_boxes = outputs["pred_boxes"]
    pred_logits = outputs["pred_classes"]
    gt_boxes = targets["boxes"]
    gt_labels = targets["labels"]
    gt_valid = targets["valid_mask"]
    B, Q, C = pred_logits.shape
    M = gt_boxes.shape[1]

    if sample_weight is None:
        sample_weight = jnp.ones((B,), dtype=pred_boxes.dtype)

    rows, matched = match(pred_boxes, pred_logits, gt_boxes, gt_labels,
                          gt_valid)
    pair_w = matched.astype(pred_boxes.dtype) * sample_weight[:, None]

    # gather matched predictions: [B, M, ...]
    mp_boxes = jnp.take_along_axis(pred_boxes, rows[..., None], axis=1)
    mp_logits = jnp.take_along_axis(pred_logits, rows[..., None], axis=1)

    # class CE over matched pairs
    safe_labels = jnp.clip(gt_labels, 0, C - 1)
    logp = jax.nn.log_softmax(mp_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    class_loss = _weighted_mean(ce, pair_w)

    # L1 over matched pair elements (mean over pairs x 6 elements ==
    # mean over pairs of per-pair element means)
    l1 = jnp.mean(jnp.abs(mp_boxes - gt_boxes), axis=-1)
    l1_loss = _weighted_mean(l1, pair_w)

    # GIoU
    _, giou = iou_ops.iou_giou_3d(mp_boxes, gt_boxes)
    giou_loss = _weighted_mean(1.0 - giou, pair_w)

    total = (
        loss_weights["class_loss"] * class_loss
        + loss_weights["l1_loss"] * l1_loss
        + loss_weights["giou_loss"] * giou_loss
    )
    out = {
        "class_loss": class_loss,
        "l1_loss": l1_loss,
        "giou_loss": giou_loss,
    }
    # optional footprint (XZ) GIoU — furniture localization error is
    # footprint-dominated; off (0.0) reproduces the reference loss exactly
    fw = loss_weights.get("footprint_loss", 0.0)
    if fw:
        _, giou2d = iou_ops.iou_giou_2d_xz(mp_boxes, gt_boxes)
        footprint_loss = _weighted_mean(1.0 - giou2d, pair_w)
        out["footprint_loss"] = footprint_loss
        total = total + fw * footprint_loss
    # optional scale-relative size loss: |log(pred_size / gt_size)| makes a
    # 2x size error cost the same for a 0.3 m shelf item as for a 4 m wall —
    # absolute L1 (the reference's only size signal, train.py:160-187)
    # under-penalizes small-furniture errors that destroy IoU. Off (0.0)
    # reproduces the reference loss exactly.
    sw = loss_weights.get("size_log_loss", 0.0)
    if sw:
        eps = 1e-3
        log_ratio = jnp.log((jnp.abs(mp_boxes[..., 3:]) + eps)
                            / (jnp.abs(gt_boxes[..., 3:]) + eps))
        size_log_loss = _weighted_mean(
            jnp.mean(jnp.abs(log_ratio), axis=-1), pair_w)
        out["size_log_loss"] = size_log_loss
        total = total + sw * size_log_loss
    # optional no-object head: BCE on the Hungarian match indicator over ALL
    # query slots (1 = this query was matched to a valid GT). Active only
    # when the model emits pred_objectness (model.objectness=True); the
    # reference has no analog — its softmax confidence saturates and cannot
    # rank detections (see models/lstm.py SimpleQueryDecoder).
    # With loss_weights['objectness_iou'] truthy, the matched slots' target
    # is the pair's 3D IoU instead of 1.0 (IoU-aware soft BCE): ranking then
    # reflects predicted LOCALIZATION quality, which is what average
    # precision orders by — a binary match bit ranks a barely-overlapping
    # box equal to a perfect one.
    # auxiliary deep supervision for contact-refinement stages: each
    # intermediate box gets the same L1+GIoU as the final one, under the
    # FINAL assignment (cheaper and more stable than re-matching per stage;
    # stage deltas are bounded so the assignment barely moves). Scaled by
    # loss_weights['aux_loss']; inactive when the model emits no aux boxes.
    aw = loss_weights.get("aux_loss", 0.0)
    if aw and "pred_aux_boxes" in outputs:
        aux = outputs["pred_aux_boxes"]  # [S, B, Q, 6]
        ma_boxes = jax.vmap(
            lambda ab: jnp.take_along_axis(ab, rows[..., None], axis=1))(aux)
        aux_l1 = jnp.abs(ma_boxes - gt_boxes[None]).mean(axis=-1)  # [S,B,M]
        _, aux_giou = iou_ops.iou_giou_3d(ma_boxes, gt_boxes[None])
        pw = jnp.broadcast_to(pair_w[None], aux_l1.shape)
        aux_loss = (_weighted_mean(aux_l1, pw) * loss_weights["l1_loss"]
                    + _weighted_mean(1.0 - aux_giou, pw)
                    * loss_weights["giou_loss"])
        out["aux_loss"] = aux_loss
        total = total + aw * aux_loss
    # optional candidate-coverage loss (round-5 lever): pull the nearest
    # UNMATCHED query toward every valid GT box, so each object attracts a
    # second, redundant candidate. Motivation: the measured zero-shot
    # frontier is candidate GENERATION — 34/56 unseen-room furniture GT
    # draw no candidate at IoU >= 0.10 while post-hoc selection is already
    # at its pooled-candidate ceiling (results/r4_B_zeroshot_diagnosis_*;
    # VERDICT round-4 item 2). One Hungarian match per GT trains exactly
    # one query per object; this term trains query REDUNDANCY, widening
    # how many queries participate in furniture detection. Matched slots
    # are excluded (the runner-up always comes from the free pool, so the
    # term never fights the main matched losses). Off (0.0) reproduces the
    # adopted loss exactly.
    cw = loss_weights.get("coverage_loss", 0.0)
    if cw:
        # [B, Q] indicator: query slot matched to any valid GT
        matched_slot = jax.vmap(
            lambda r, v: jnp.zeros((Q,), dtype=bool).at[r].max(v))(
            rows, matched)
        d = jnp.mean(jnp.abs(pred_boxes[:, :, None, :]
                             - gt_boxes[:, None, :, :]), axis=-1)  # [B,Q,M]
        d = jnp.where(matched_slot[:, :, None], jnp.inf, d)
        runner = jnp.min(d, axis=1)                                # [B, M]
        # a batch row with all queries matched (Q <= #GT) would leave inf
        runner = jnp.where(jnp.isfinite(runner), runner, 0.0)
        cov_w = pair_w
        if loss_weights.get("coverage_furniture_only", 0.0):
            # the measured blind set is furniture (34/56 vs 4/21 walls) —
            # optionally spend the redundancy budget there only
            cov_w = cov_w * (gt_labels != 0).astype(cov_w.dtype)
        coverage_loss = _weighted_mean(runner, cov_w)
        out["coverage_loss"] = coverage_loss
        total = total + cw * coverage_loss
    if "pred_objectness" in outputs:
        obj_logits = outputs["pred_objectness"]  # [B, Q]
        if loss_weights.get("objectness_iou", 0.0):
            pair_iou, _ = iou_ops.iou_giou_3d(mp_boxes, gt_boxes)
            pair_val = jax.lax.stop_gradient(
                jnp.clip(pair_iou, 0.0, 1.0)) * matched
        else:
            pair_val = matched.astype(pred_boxes.dtype)
        slot_target = jnp.zeros((B, Q), dtype=pred_boxes.dtype)
        slot_target = jax.vmap(
            lambda st, r, v: st.at[r].max(v))(
            slot_target, rows, pair_val.astype(pred_boxes.dtype))
        bce = optax_sigmoid_bce(obj_logits, slot_target)
        objectness_loss = _weighted_mean(
            bce, jnp.broadcast_to(sample_weight[:, None], bce.shape))
        out["objectness_loss"] = objectness_loss
        total = total + loss_weights.get("objectness_loss", 1.0) * \
            objectness_loss
    out["total_loss"] = total
    return out


LEGACY_WEIGHTS = {
    "class_loss": 1.0,
    "position_loss": 1.0,
    "size_loss": 1.0,
    "orientation_loss": 0.5,
    "validity_loss": 1.0,
}


def legacy_criterion(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    sample_weight: jnp.ndarray | None = None,
    loss_weights: Dict[str, float] = LEGACY_WEIGHTS,
) -> Dict[str, jnp.ndarray]:
    """Multi-task loss of the legacy surface (ref: README.md:117-125):
    CE (classes) + L1 (position, size, orientation) + BCE (validity),
    with Hungarian matching between predicted slots and GT objects.

    outputs: classes [B,N,C], positions [B,N,2], sizes [B,N,2],
             orientations [B,N,1], validity [B,N,1] (logits)
    targets: boxes [B,M,5] (x, y, w, h, theta), labels [B,M],
             valid_mask [B,M]
    """
    logits = outputs["classes"]
    pos = outputs["positions"]
    size = outputs["sizes"]
    orient = outputs["orientations"][..., 0]
    validity = outputs["validity"][..., 0]
    gt = targets["boxes"]
    gt_labels = targets["labels"]
    gt_valid = targets["valid_mask"]
    B, N, C = logits.shape

    if sample_weight is None:
        sample_weight = jnp.ones((B,), dtype=pos.dtype)

    # match on class prob + position L1 (the 2D analog of train.py:44-53)
    prob = jax.nn.softmax(logits, axis=-1)
    safe_labels = jnp.clip(gt_labels, 0, C - 1)
    c_class = -jnp.take_along_axis(
        prob[:, :, None, :],
        jnp.broadcast_to(safe_labels[:, None, :, None],
                         (B, N, gt.shape[1], 1)), axis=-1)[..., 0]
    c_pos = jnp.sum(
        jnp.abs(pos[:, :, None, :] - gt[:, None, :, :2]), axis=-1)
    cost = c_class + 5.0 * c_pos
    rows, matched = jax.vmap(hungarian_match)(cost, gt_valid)
    pair_w = matched.astype(pos.dtype) * sample_weight[:, None]

    take = lambda x: jnp.take_along_axis(x, rows[..., None], axis=1)
    m_logits = take(logits)
    m_pos = take(pos)
    m_size = take(size)
    m_orient = take(orient[..., None])[..., 0]

    logp = jax.nn.log_softmax(m_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    class_loss = _weighted_mean(ce, pair_w)
    position_loss = _weighted_mean(
        jnp.mean(jnp.abs(m_pos - gt[..., :2]), axis=-1), pair_w)
    size_loss = _weighted_mean(
        jnp.mean(jnp.abs(m_size - gt[..., 2:4]), axis=-1), pair_w)
    orientation_loss = _weighted_mean(
        jnp.abs(m_orient - gt[..., 4]), pair_w)

    # validity BCE: slot target = 1 if it received a match
    slot_target = jnp.zeros((B, N), dtype=pos.dtype)
    slot_target = jax.vmap(
        lambda st, r, m: st.at[r].max(m.astype(st.dtype)))(
        slot_target, rows, matched)
    bce = optax_sigmoid_bce(validity, slot_target)
    validity_loss = _weighted_mean(
        bce, jnp.broadcast_to(sample_weight[:, None], bce.shape))

    losses = {
        "class_loss": class_loss,
        "position_loss": position_loss,
        "size_loss": size_loss,
        "orientation_loss": orientation_loss,
        "validity_loss": validity_loss,
    }
    losses["total_loss"] = sum(
        loss_weights.get(k, 1.0) * v for k, v in losses.items())
    return losses


def optax_sigmoid_bce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable sigmoid binary cross-entropy."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
