"""Set-criterion golden parity against the reference implementation
(imported from the read-only snapshot — never copied)."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from room_slam_tpu.ops.iou import iou_giou_3d
from room_slam_tpu.ops.losses import set_criterion
from tests.conftest import REFERENCE, requires_reference, requires_torch


def _random_problem(rng, B=4, Q=30, M=50, C=4):
    pred_boxes = rng.normal(size=(B, Q, 6)).astype(np.float32)
    pred_boxes[..., 3:] = np.abs(pred_boxes[..., 3:]) + 0.1
    pred_logits = rng.normal(size=(B, Q, C)).astype(np.float32)
    gt_boxes = np.zeros((B, M, 6), np.float32)
    gt_labels = np.full((B, M), -1, np.int64)
    gt_valid = np.zeros((B, M), bool)
    for b in range(B):
        nv = int(rng.integers(1, 12))
        gt_boxes[b, :nv] = rng.normal(size=(nv, 6))
        gt_boxes[b, :nv, 3:] = np.abs(gt_boxes[b, :nv, 3:]) + 0.1
        gt_labels[b, :nv] = rng.integers(0, C, nv)
        gt_valid[b, :nv] = True
    return pred_boxes, pred_logits, gt_boxes, gt_labels, gt_valid


def test_iou_giou_matches_formula(rng):
    """IoU/GIoU vs direct numpy computation of train.py:75-107."""
    a = rng.normal(size=(64, 6)).astype(np.float32)
    b = rng.normal(size=(64, 6)).astype(np.float32)
    a[:, 3:] = np.abs(a[:, 3:]) + 0.05
    b[:, 3:] = np.abs(b[:, 3:]) + 0.05
    iou, giou = iou_giou_3d(jnp.asarray(a), jnp.asarray(b))

    amin, amax = a[:, :3] - a[:, 3:] / 2, a[:, :3] + a[:, 3:] / 2
    bmin, bmax = b[:, :3] - b[:, 3:] / 2, b[:, :3] + b[:, 3:] / 2
    inter = np.clip(np.minimum(amax, bmax) - np.maximum(amin, bmin),
                    0, None).prod(-1)
    union = a[:, 3:].prod(-1) + b[:, 3:].prod(-1) - inter
    ref_iou = inter / (union + 1e-6)
    enc = np.clip(np.maximum(amax, bmax) - np.minimum(amin, bmin),
                  0, None).prod(-1)
    ref_giou = ref_iou - (enc - union) / (enc + 1e-6)
    np.testing.assert_allclose(np.asarray(iou), ref_iou, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(giou), ref_giou, rtol=1e-5)


@requires_reference
@requires_torch
def test_golden_vs_reference_criterion(rng):
    """Run the actual reference SetCriterion on random data and require our
    fused jax loss to agree to float tolerance."""
    import torch

    sys.path.insert(0, f"{REFERENCE}/src/benchmark")
    import importlib

    ref_train = importlib.import_module("train")

    pb, pl, gb, gl, gv = _random_problem(rng)

    criterion = ref_train.SetCriterion(
        {"class_loss": 2.0, "l1_loss": 5.0, "giou_loss": 2.0})
    outputs = {
        "pred_boxes": torch.tensor(pb),
        "pred_classes": torch.tensor(pl),
    }
    targets = {
        "boxes": torch.tensor(gb),
        "labels": torch.tensor(np.where(gv, gl, 0)),
        "valid_mask": torch.tensor(gv),
    }
    ref = {k: float(v) for k, v in criterion(outputs, targets).items()}

    ours = set_criterion(
        {"pred_boxes": jnp.asarray(pb), "pred_classes": jnp.asarray(pl)},
        {"boxes": jnp.asarray(gb),
         "labels": jnp.asarray(gl.astype(np.int32)),
         "valid_mask": jnp.asarray(gv)},
    )
    for k in ("class_loss", "l1_loss", "giou_loss", "total_loss"):
        assert abs(ref[k] - float(ours[k])) < 2e-4 * max(1.0, abs(ref[k])), (
            k, ref[k], float(ours[k]))


def test_sample_weight_excludes_padding(rng):
    pb, pl, gb, gl, gv = _random_problem(rng, B=4)
    full = set_criterion(
        {"pred_boxes": jnp.asarray(pb[:2]),
         "pred_classes": jnp.asarray(pl[:2])},
        {"boxes": jnp.asarray(gb[:2]),
         "labels": jnp.asarray(gl[:2].astype(np.int32)),
         "valid_mask": jnp.asarray(gv[:2])},
    )
    # batch of 4 where the last two are padding duplicates with weight 0
    w = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    padded = set_criterion(
        {"pred_boxes": jnp.asarray(pb), "pred_classes": jnp.asarray(pl)},
        {"boxes": jnp.asarray(gb),
         "labels": jnp.asarray(gl.astype(np.int32)),
         "valid_mask": jnp.asarray(gv)},
        sample_weight=w,
    )
    for k in full:
        np.testing.assert_allclose(
            float(full[k]), float(padded[k]), rtol=1e-5)


def test_footprint_giou_and_aux_loss(rng):
    from room_slam_tpu.ops.iou import iou_giou_2d_xz

    # identical footprints -> iou 1 regardless of y
    a = jnp.asarray([0.0, 0.0, 0.0, 2.0, 1.0, 3.0])
    b = jnp.asarray([0.0, 5.0, 0.0, 2.0, 0.2, 3.0])
    iou, giou = iou_giou_2d_xz(a, b)
    assert abs(float(iou) - 1.0) < 1e-5
    # half-overlap in x only: inter 1x3, union 9 -> 1/3
    c = jnp.asarray([1.0, 0.0, 0.0, 2.0, 1.0, 3.0])
    iou2, _ = iou_giou_2d_xz(a, c)
    assert abs(float(iou2) - 1.0 / 3.0) < 1e-4

    # criterion: footprint term appears only when weighted, and total
    # grows by exactly fw * footprint_loss
    B, Q, M, C = 2, 6, 4, 4
    out = {
        "pred_boxes": jnp.asarray(
            np.abs(rng.normal(size=(B, Q, 6))).astype(np.float32) + 0.2),
        "pred_classes": jnp.asarray(
            rng.normal(size=(B, Q, C)).astype(np.float32)),
    }
    tgt = {
        "boxes": jnp.asarray(
            np.abs(rng.normal(size=(B, M, 6))).astype(np.float32) + 0.2),
        "labels": jnp.asarray(rng.integers(0, C, (B, M)).astype(np.int32)),
        "valid_mask": jnp.ones((B, M), bool),
    }
    base = set_criterion(out, tgt)
    assert "footprint_loss" not in base
    lw = {"class_loss": 2.0, "l1_loss": 5.0, "giou_loss": 2.0,
          "footprint_loss": 1.5}
    with_fp = set_criterion(out, tgt, loss_weights=lw)
    assert float(with_fp["footprint_loss"]) > 0
    np.testing.assert_allclose(
        float(with_fp["total_loss"]),
        float(base["total_loss"]) + 1.5 * float(with_fp["footprint_loss"]),
        rtol=1e-5)


def test_objectness_bce_targets_match_indicator(rng):
    """The objectness BCE target is 1 exactly for the query slots the
    Hungarian matcher paired with a valid GT; the loss only enters the
    total when the model emits pred_objectness."""
    from room_slam_tpu.ops.losses import match, set_criterion

    B, Q, M, C = 2, 6, 4, 4
    pb = rng.normal(size=(B, Q, 6)).astype(np.float32)
    pl = rng.normal(size=(B, Q, C)).astype(np.float32)
    gt_b = rng.normal(size=(B, M, 6)).astype(np.float32)
    gt_l = rng.integers(0, C, size=(B, M)).astype(np.int32)
    valid = np.array([[1, 1, 0, 0], [1, 1, 1, 1]], dtype=bool)

    outputs = {"pred_boxes": jnp.asarray(pb), "pred_classes": jnp.asarray(pl)}
    targets = {"boxes": jnp.asarray(gt_b), "labels": jnp.asarray(gt_l),
               "valid_mask": jnp.asarray(valid)}
    base = set_criterion(outputs, targets)
    assert "objectness_loss" not in base

    rows, matched = match(outputs["pred_boxes"], outputs["pred_classes"],
                          targets["boxes"], targets["labels"],
                          targets["valid_mask"])
    rows, matched = np.asarray(rows), np.asarray(matched)

    # logits that agree perfectly with the match indicator -> tiny BCE;
    # inverted logits -> large BCE
    good = np.full((B, Q), -20.0, np.float32)
    for b in range(B):
        good[b, rows[b][matched[b]]] = 20.0
    lo = set_criterion({**outputs, "pred_objectness": jnp.asarray(good)},
                       targets)
    hi = set_criterion({**outputs, "pred_objectness": jnp.asarray(-good)},
                       targets)
    assert float(lo["objectness_loss"]) < 1e-6
    assert float(hi["objectness_loss"]) > 10.0
    assert float(lo["total_loss"]) == pytest.approx(
        float(base["total_loss"]) + float(lo["objectness_loss"]), rel=1e-5)
    # weight plumbed through loss_weights
    w = set_criterion({**outputs, "pred_objectness": jnp.asarray(-good)},
                      targets,
                      loss_weights={"class_loss": 2.0, "l1_loss": 5.0,
                                    "giou_loss": 2.0,
                                    "objectness_loss": 0.0})
    assert float(w["total_loss"]) == pytest.approx(
        float(base["total_loss"]), rel=1e-5)


def test_size_log_loss_scale_relative():
    """|log(pred/gt size)|: a 2x size error costs the same for a tiny box
    as for a wall, and weight 0 (the default) reproduces the reference
    loss exactly.

    Uses its own pinned generator (not the session-scoped ``rng``
    fixture): the joint-scaling invariance below presupposes the
    Hungarian matching is unchanged by the 2x size scaling, which is
    true for this draw but not for arbitrary ones — the L1 cost term
    scales, so near-tie assignments can flip."""
    from room_slam_tpu.ops.losses import set_criterion

    rng = np.random.default_rng(7)
    B, Q, M, C = 1, 4, 2, 4
    pb = rng.normal(size=(B, Q, 6)).astype(np.float32)
    pl = rng.normal(size=(B, Q, C)).astype(np.float32)
    gt_b = rng.normal(size=(B, M, 6)).astype(np.float32)
    gt_b[..., 3:] = np.abs(gt_b[..., 3:]) + 0.1
    gt_l = rng.integers(0, C, size=(B, M)).astype(np.int32)
    valid = np.ones((B, M), bool)
    outputs = {"pred_boxes": jnp.asarray(pb), "pred_classes": jnp.asarray(pl)}
    targets = {"boxes": jnp.asarray(gt_b), "labels": jnp.asarray(gt_l),
               "valid_mask": jnp.asarray(valid)}

    base = set_criterion(outputs, targets)
    assert "size_log_loss" not in base

    lw = {"class_loss": 2.0, "l1_loss": 5.0, "giou_loss": 2.0,
          "size_log_loss": 1.0}
    with_term = set_criterion(outputs, targets, loss_weights=lw)
    assert float(with_term["size_log_loss"]) > 0
    assert float(with_term["total_loss"]) == pytest.approx(
        float(base["total_loss"]) + float(with_term["size_log_loss"]),
        rel=1e-5)

    # scale-relative: doubling every size doubles nothing — the ratio to a
    # doubled GT stays identical, so the term is invariant to joint scaling
    big_out = {"pred_boxes": jnp.asarray(pb * np.array([1, 1, 1, 2, 2, 2],
                                                       np.float32)),
               "pred_classes": jnp.asarray(pl)}
    big_tgt = {"boxes": jnp.asarray(gt_b * np.array([1, 1, 1, 2, 2, 2],
                                                    np.float32)),
               "labels": jnp.asarray(gt_l), "valid_mask": jnp.asarray(valid)}
    scaled = set_criterion(big_out, big_tgt, loss_weights=lw)
    assert float(scaled["size_log_loss"]) == pytest.approx(
        float(with_term["size_log_loss"]), rel=2e-2)


def test_objectness_iou_soft_target(rng):
    """IoU-aware objectness: a perfectly-predicted matched box drives its
    slot target to ~1 while a barely-overlapping matched box gets a low
    soft target — logits matching the match INDICATOR now incur loss."""
    from room_slam_tpu.ops.losses import match, set_criterion

    B, Q, M, C = 1, 4, 2, 4
    gt_b = np.array([[[0, 0, 0, 1, 1, 1],
                      [5, 0, 0, 1, 1, 1]]], np.float32)
    pb = np.full((B, Q, 6), 20.0, np.float32)
    pb[0, 0] = gt_b[0, 0]                       # exact match -> IoU 1
    pb[0, 1] = [5.45, 0, 0, 1, 1, 1]            # shifted -> IoU ~0.35
    pl = rng.normal(size=(B, Q, C)).astype(np.float32)
    gt_l = np.zeros((B, M), np.int32)
    valid = np.ones((B, M), bool)
    outputs = {"pred_boxes": jnp.asarray(pb), "pred_classes": jnp.asarray(pl)}
    targets = {"boxes": jnp.asarray(gt_b), "labels": jnp.asarray(gt_l),
               "valid_mask": jnp.asarray(valid)}
    lw = {"class_loss": 2.0, "l1_loss": 5.0, "giou_loss": 2.0,
          "objectness_loss": 1.0, "objectness_iou": 1.0}

    rows, matched = match(outputs["pred_boxes"], outputs["pred_classes"],
                          targets["boxes"], targets["labels"],
                          targets["valid_mask"])
    rows = np.asarray(rows)[0]
    # logits saturated at the MATCH indicator
    hard = np.full((B, Q), -20.0, np.float32)
    hard[0, rows[np.asarray(matched)[0]]] = 20.0
    out_hard_t = set_criterion(
        {**outputs, "pred_objectness": jnp.asarray(hard)}, targets,
        loss_weights={**lw, "objectness_iou": 0.0})
    out_soft_t = set_criterion(
        {**outputs, "pred_objectness": jnp.asarray(hard)}, targets,
        loss_weights=lw)
    # binary target: saturated indicator logits are near-perfect
    assert float(out_hard_t["objectness_loss"]) < 1e-6
    # IoU target: the ~0.35-IoU slot's saturated logit now costs real loss
    assert float(out_soft_t["objectness_loss"]) > 1.0


def test_coverage_loss_pulls_nearest_unmatched(rng):
    """coverage_loss (round-5 candidate-diversity lever): equals the
    nearest-UNMATCHED-query box L1 per GT; matched slots are excluded; 0
    weight reproduces the adopted loss exactly."""
    from room_slam_tpu.ops.losses import match

    pb, pl, gb, gl, gv = _random_problem(rng, B=3)
    outputs = {"pred_boxes": jnp.asarray(pb), "pred_classes": jnp.asarray(pl)}
    targets = {"boxes": jnp.asarray(gb), "labels": jnp.asarray(gl),
               "valid_mask": jnp.asarray(gv)}
    lw = {"class_loss": 2.0, "l1_loss": 5.0, "giou_loss": 2.0}

    base = set_criterion(outputs, targets, loss_weights=lw)
    cov = set_criterion(outputs, targets,
                        loss_weights={**lw, "coverage_loss": 0.7})
    # off == adopted loss; on adds exactly 0.7 * coverage_loss
    assert "coverage_loss" not in base
    np.testing.assert_allclose(
        float(cov["total_loss"]),
        float(base["total_loss"]) + 0.7 * float(cov["coverage_loss"]),
        rtol=1e-6)

    # hand-computed expectation
    rows, matched = match(outputs["pred_boxes"], outputs["pred_classes"],
                          targets["boxes"], targets["labels"],
                          targets["valid_mask"])
    rows, matched = np.asarray(rows), np.asarray(matched)
    expected, weights = [], []
    for b in range(pb.shape[0]):
        matched_slots = set(rows[b][matched[b]].tolist())
        for m in range(gb.shape[1]):
            if not gv[b, m]:
                continue
            ds = [np.abs(pb[b, q] - gb[b, m]).mean()
                  for q in range(pb.shape[1]) if q not in matched_slots]
            expected.append(min(ds))
            weights.append(1.0)
    np.testing.assert_allclose(
        float(cov["coverage_loss"]),
        np.average(expected, weights=weights), rtol=1e-5)
