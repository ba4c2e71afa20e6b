"""Fixed-shape masked 3D NMS and confidence post-processing.

The reference runs greedy NMS as an O(Q^2) Python loop over tensors one pair
at a time (ref: src/benchmark/inference.py:87-127). Here the pairwise IoU
matrix is computed in one shot and the greedy sweep is a ``fori_loop`` over a
precomputed score order — fully jittable, fixed output shape (a keep mask).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from room_slam_tpu.ops.iou import pairwise_iou_3d


def nms_3d_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    mask: jnp.ndarray,
    iou_threshold: float = 0.5,
) -> jnp.ndarray:
    """Greedy per-score NMS at fixed shape.

    Args:
        boxes: [Q, 6]; scores: [Q]; mask: [Q] candidates to consider.

    Returns:
        keep: [Q] bool. Matches the reference's greedy semantics
        (inference.py:103-127): highest score kept, suppress IoU >= threshold.
    """
    return nms_3d_with_counts(boxes, scores, mask, iou_threshold)[0]


def nms_3d_with_counts(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    mask: jnp.ndarray,
    iou_threshold: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS that also reports each kept box's cluster size — how many
    candidates (itself included) it suppressed.

    DETR-style query decoders emit several near-identical boxes for an
    object they are sure about; the cluster size is a consensus vote that
    stays informative even when every softmax confidence saturates at 1.0,
    so it can re-rank detections for AP (see post_process consensus)."""
    keep, counts, _ = nms_3d_fused(boxes, scores, mask, iou_threshold)
    return keep, counts


def nms_3d_fused(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    mask: jnp.ndarray,
    iou_threshold: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS returning (keep, cluster counts, fused boxes).

    ``fused[q]`` is the score-weighted mean of the boxes box q suppressed
    (itself included) — weighted box fusion. With pooled multi-view (TTA)
    or multi-checkpoint (ensemble) candidates, each object attracts a
    cluster of near-identical boxes jittered around the truth; averaging
    the cluster cancels per-view regression noise where keep-best cannot.
    Rows not kept carry their original box."""
    Q = boxes.shape[0]
    iou = pairwise_iou_3d(boxes, boxes)
    neg_inf = jnp.finfo(scores.dtype).min
    order = jnp.argsort(jnp.where(mask, scores, neg_inf))[::-1]

    def body(i, carry):
        keep, suppressed, counts, fused = carry
        idx = order[i]
        alive = (~suppressed[idx]) & mask[idx]
        keep = keep.at[idx].set(alive)
        sup = (iou[idx] >= iou_threshold) & alive & ~suppressed
        counts = counts.at[idx].set(
            jnp.where(alive, sup.sum(), 0).astype(jnp.int32))
        w = jnp.where(sup, scores, 0.0)
        mean = (w @ boxes) / jnp.maximum(w.sum(), 1e-12)
        fused = fused.at[idx].set(jnp.where(alive, mean, fused[idx]))
        return keep, suppressed | sup, counts, fused

    keep = jnp.zeros((Q,), dtype=bool)
    suppressed = ~mask
    counts = jnp.zeros((Q,), dtype=jnp.int32)
    keep, _, counts, fused = jax.lax.fori_loop(
        0, Q, body, (keep, suppressed, counts, boxes))
    return keep, counts, fused


def soft_nms_3d_fused(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    mask: jnp.ndarray,
    dup_threshold: float = 0.5,
    sigma: float = 0.25,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Soft-NMS (Gaussian rescoring) with tight-cluster fusion.

    The round-4 zero-shot diagnosis (PARITY.md "NMS destroys 13 of 33
    achievable hits"): under domain shift a lone wrong-but-confident box
    HARD-suppresses a multi-view-agreed correct one at the aggressive
    calibrated IoU (0.1), and reranking (support / physics) cannot demote
    the suppressor. Soft-NMS removes the death sentence: only
    near-identical candidates (IoU >= ``dup_threshold``) are absorbed
    into the winner's fused cluster; everything else survives with its
    score DECAYED by ``exp(-iou^2 / sigma)`` against each kept box, so a
    wrongly-placed confident box costs the correct one rank, not
    existence. Greedy over the CURRENT (decayed) scores, so the sweep
    order itself adapts — a ``while_loop`` with an argmax per step
    instead of a precomputed order, exiting early once every masked
    candidate is kept or absorbed.

    Returns (keep, cluster counts, fused boxes, rescored confidences);
    every masked candidate is eventually kept or absorbed, and the
    rescored confidence of a kept box is its score at keep time (all
    decays applied). Downstream threshold / top-K gates do the pruning
    that hard NMS used to.
    """
    Q = boxes.shape[0]
    iou = pairwise_iou_3d(boxes, boxes)
    neg_inf = jnp.finfo(scores.dtype).min

    # while_loop with an any-available early exit: each pass keeps or
    # absorbs >= 1 candidate, so pooled TTA/ensemble sets (Q in the
    # hundreds, most candidates absorbed into a few clusters) stop after
    # ~#clusters iterations instead of always paying the full O(Q^2) * Q.
    def cond(carry):
        i, cur, keep, absorbed, counts, fused = carry
        return (i < Q) & jnp.any(mask & ~keep & ~absorbed)

    def body(carry):
        i, cur, keep, absorbed, counts, fused = carry
        avail = mask & ~keep & ~absorbed
        s = jnp.where(avail, cur, neg_inf)
        idx = jnp.argmax(s)
        alive = s[idx] > neg_inf
        chosen = jnp.zeros((Q,), bool).at[idx].set(alive)
        keep = keep | chosen
        dup = (iou[idx] >= dup_threshold) & avail & alive & ~chosen
        wsel = chosen | dup
        w = jnp.where(wsel, jnp.maximum(cur, 1e-12), 0.0)
        mean = (w @ boxes) / jnp.maximum(w.sum(), 1e-12)
        fused = fused.at[idx].set(jnp.where(alive, mean, fused[idx]))
        counts = counts.at[idx].set(
            jnp.where(alive, wsel.sum(), counts[idx]).astype(jnp.int32))
        absorbed = absorbed | dup
        decay = jnp.exp(-(iou[idx] ** 2) / sigma)
        cur = jnp.where(avail & ~wsel & alive, cur * decay, cur)
        return i + 1, cur, keep, absorbed, counts, fused

    cur = scores.astype(jnp.float32)
    keep = jnp.zeros((Q,), bool)
    absorbed = jnp.zeros((Q,), bool)
    counts = jnp.zeros((Q,), jnp.int32)
    _, cur, keep, _, counts, fused = jax.lax.while_loop(
        cond, body, (jnp.int32(0), cur, keep, absorbed, counts, boxes))
    return keep, counts, fused, cur


def post_process(
    pred_boxes: jnp.ndarray,
    pred_logits: jnp.ndarray,
    confidence_threshold: float = 0.7,
    nms_threshold: float = 0.3,
    num_classes: int = 4,
    consensus: bool = False,
    objectness: jnp.ndarray | None = None,
    top_k: int | None = None,
    candidate_mask: jnp.ndarray | None = None,
    fuse: bool = False,
    return_boxes: bool = False,
    support: float | None = None,
    conf_scale: jnp.ndarray | None = None,
    soft_sigma: float | None = None,
):
    """Confidence filter + per-class NMS (ref: inference.py:130-170).

    Args:
        pred_boxes: [Q, 6]; pred_logits: [Q, C].
        consensus: rescore each kept detection by its NMS cluster size
            (fraction of queries that voted for it) times its softmax
            confidence — restores a usable ranking when the softmax
            saturates at 1.0 for every query. Keep/labels are unchanged;
            only the returned confidences (and hence downstream ranking /
            thresholding) differ.
        support: if set, support-ordered NMS — BEFORE the greedy sweep,
            each candidate's ranking confidence is multiplied by the
            fraction of same-class confidence mass that agrees with it
            (candidates whose IoU >= ``support``). With pooled multi-view
            (TTA) / multi-checkpoint candidates, a box many views agree on
            outranks a lone confident outlier, so greedy NMS keeps cluster
            centers instead of letting one wrong high-confidence box
            suppress the agreed-on one. Differs from ``consensus`` (which
            rescales AFTER NMS and cannot change what survives). The
            absolute ``confidence_threshold`` still gates on the raw
            confidence; ``support`` only reranks.
        conf_scale: optional [Q] multiplier on the ranking confidence
            (applied with ``support``, i.e. after thresholding) — e.g.
            physics rescoring ``exp(-pen_beta * penetration_depth)``
            (ops/ttopt.penetration_depth): a box the walker walked
            through is wrong no matter how confident the decoder is.
        soft_sigma: if set, the per-class sweep is SOFT-NMS
            (soft_nms_3d_fused): ``nms_threshold`` becomes the
            tight-duplicate absorb/fusion threshold (pair it with a HIGH
            value like 0.5, not the hard sweep's 0.1) and loosely
            overlapping candidates survive with Gaussian-decayed
            confidence instead of being suppressed. The emitted
            confidences are the decayed ones, so consensus / top_k /
            downstream ranking all see the rescoring.
        objectness: optional [Q] no-object logits (models trained with
            model.objectness=True). Confidence becomes
            ``softmax maxprob * sigmoid(objectness)`` — the trained ranking
            signal, applied before thresholding and NMS ordering.
        top_k: keep only the K highest-confidence detections that survive
            NMS (applied after consensus rescoring so the emitted ranking
            is the one that gates). Rank-based operating points transfer
            across domains where absolute confidence calibration does not
            (on an unseen room the objectness score deflates uniformly, so
            a threshold tuned on synthetic data keeps ~nothing while the
            top-K boxes are unchanged). A room has ~10-15 colliders; the
            reference has no analog (absolute 0.7 threshold only).
        candidate_mask: optional [Q] bool pre-filter (e.g. extent
            suppression). Applied BEFORE NMS and top_k so an implausible
            box neither suppresses a real one nor consumes a top-K slot.
        fuse: weighted box fusion — each kept detection's box becomes the
            score-weighted mean of its NMS cluster (nms_3d_fused). Only
            affects the boxes, so it requires ``return_boxes``; keep /
            labels / ranking are untouched. Intended for pooled TTA /
            ensemble candidates where the cluster jitters around the
            true box.
        return_boxes: also return the output boxes ([Q, 6]; fused when
            ``fuse`` else the input boxes) as a fourth element.

    Returns:
        (keep [Q] bool, labels [Q] int32, confidences [Q] float32)
        [+ boxes [Q, 6] when ``return_boxes``].
    """
    if fuse and not return_boxes:
        raise ValueError("fuse=True changes boxes; pass return_boxes=True")
    probs = jax.nn.softmax(pred_logits, axis=-1)
    conf = jnp.max(probs, axis=-1)
    if objectness is not None:
        conf = conf * jax.nn.sigmoid(objectness)
    labels = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    passed = conf > confidence_threshold
    if candidate_mask is not None:
        passed = passed & candidate_mask

    # ranking-only rescoring: the absolute threshold above gates on the
    # raw confidence; everything downstream (NMS order, top_k, the
    # emitted ranking) uses the rescored one
    if conf_scale is not None:
        conf = conf * conf_scale
    if support is not None:
        iou = pairwise_iou_3d(pred_boxes, pred_boxes)
        votes = ((iou >= support)
                 & (labels[None, :] == labels[:, None])
                 & passed[None, :]).astype(conf.dtype)
        mass = jnp.where(passed, conf, 0.0)
        agree = votes @ mass                              # [Q]
        total = (labels[None, :] == labels[:, None]).astype(
            conf.dtype) @ mass
        conf = conf * agree / jnp.maximum(total, 1e-12)

    if soft_sigma is None:
        def per_class(c):
            return nms_3d_fused(
                pred_boxes, conf, passed & (labels == c), nms_threshold)

        keep_per_class, counts_per_class, fused_per_class = jax.vmap(
            per_class)(jnp.arange(num_classes))  # [C, Q], [C, Q], [C, Q, 6]
    else:
        def per_class_soft(c):
            return soft_nms_3d_fused(
                pred_boxes, conf, passed & (labels == c), nms_threshold,
                soft_sigma)

        keep_per_class, counts_per_class, fused_per_class, conf_per_class = \
            jax.vmap(per_class_soft)(jnp.arange(num_classes))
        # a box can only be kept by its own class's pass; adopt that
        # pass's decayed confidence as the ranking signal
        qi = jnp.arange(labels.shape[0])
        keep_soft = jnp.any(keep_per_class, axis=0)
        conf = jnp.where(keep_soft, conf_per_class[labels, qi], conf)
    keep = jnp.any(keep_per_class, axis=0)
    out_boxes = pred_boxes
    if fuse:
        # each box was kept by (at most) its own class's NMS pass
        out_boxes = jnp.where(
            keep[:, None], fused_per_class[labels, jnp.arange(labels.shape[0])],
            pred_boxes)
    if consensus:
        counts = counts_per_class.sum(axis=0)  # one class kept each box
        conf = conf * counts / pred_boxes.shape[0]
    if top_k is not None:
        kept_conf = jnp.where(keep, conf, -jnp.inf)
        # rank of each kept det among kept (0 = best); keep rank < K
        order = jnp.argsort(-kept_conf)
        rank = jnp.zeros_like(order).at[order].set(
            jnp.arange(order.shape[0]))
        keep = keep & (rank < top_k)
    if return_boxes:
        return keep, labels, conf, out_boxes
    return keep, labels, conf
