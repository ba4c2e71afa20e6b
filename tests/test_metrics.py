"""Evaluator golden parity vs the reference, rotated IoU analytics, mAP."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from room_slam_tpu.ops.iou import rotated_iou_2d
from room_slam_tpu.train.metrics import (average_precision_3d,
                                         make_metrics_step,
                                         summarize_metrics)
from tests.conftest import REFERENCE, requires_reference, requires_torch


class _FixedModel:
    """Stub with the flax .apply signature returning canned outputs."""

    def __init__(self, outputs):
        self.outputs = outputs

    def apply(self, params, feats, mask, deterministic=True):
        return self.outputs


def _problem(rng, B=3, Q=30, M=50, C=4):
    pb = rng.normal(size=(B, Q, 6)).astype(np.float32)
    pb[..., 3:] = np.abs(pb[..., 3:]) + 0.2
    pl = rng.normal(size=(B, Q, C)).astype(np.float32)
    gb = np.zeros((B, M, 6), np.float32)
    gl = np.full((B, M), -1, np.int64)
    gv = np.zeros((B, M), bool)
    for b in range(B):
        nv = int(rng.integers(1, 12))
        # make some GT overlap predictions so IoU/TP are nontrivial
        src = rng.permutation(Q)[:nv]
        gb[b, :nv] = pb[b, src] + rng.normal(size=(nv, 6)) * 0.1
        gb[b, :nv, 3:] = np.abs(gb[b, :nv, 3:]) + 0.2
        gl[b, :nv] = rng.integers(0, C, nv)
        gv[b, :nv] = True
    return pb, pl, gb, gl, gv


@requires_reference
@requires_torch
def test_metrics_golden_vs_reference(rng):
    """Our vectorized evaluator must reproduce the reference's
    evaluate_metrics (train.py:234-328) on identical model outputs."""
    import torch

    sys.path.insert(0, f"{REFERENCE}/src/benchmark")
    import importlib

    ref_train = importlib.import_module("train")

    pb, pl, gb, gl, gv = _problem(rng)
    B = pb.shape[0]
    L = 8

    # reference side: fake torch model + single-batch "loader"
    class TorchStub(torch.nn.Module):
        def forward(self, traces, mask=None):
            return {"pred_boxes": torch.tensor(pb),
                    "pred_classes": torch.tensor(pl)}

    batch_t = {
        "traces": torch.zeros(B, L, 11),
        "trace_mask": torch.ones(B, L, dtype=torch.bool),
        "boxes": torch.tensor(gb),
        "labels": torch.tensor(np.where(gv, gl, -1)),
        "valid_mask": torch.tensor(gv),
    }
    ref = ref_train.evaluate_metrics(
        TorchStub(), [batch_t], torch.device("cpu"), iou_thresh=0.5)

    # our side
    model = _FixedModel({"pred_boxes": jnp.asarray(pb),
                         "pred_classes": jnp.asarray(pl)})
    step = make_metrics_step(model, iou_thresh=0.5)
    batch = {
        "raw": jnp.zeros((B, L, 4)),
        "length": jnp.full((B,), L, jnp.int32),
        "boxes": jnp.asarray(gb),
        "labels": jnp.asarray(gl.astype(np.int32)),
        "valid": jnp.asarray(gv),
        "weight": jnp.ones((B,), jnp.float32),
    }
    ours = summarize_metrics(
        {k: float(v) for k, v in step(None, batch).items()})

    assert ours["tp"] == ref["tp"]
    assert ours["fp"] == ref["fp"]
    assert ours["fn"] == ref["fn"]
    assert abs(ours["mIoU"] - ref["mIoU"]) < 1e-4
    assert abs(ours["cls_acc"] - ref["cls_acc"]) < 1e-6
    assert abs(ours["f1"] - ref["f1"]) < 1e-6


def test_rotated_iou_analytic():
    sq = jnp.asarray([0.0, 0.0, 1.0, 1.0, 0.0])
    # identical squares
    assert abs(float(rotated_iou_2d(sq, sq)) - 1.0) < 1e-5
    # disjoint
    far = jnp.asarray([5.0, 0.0, 1.0, 1.0, 0.3])
    assert float(rotated_iou_2d(sq, far)) < 1e-6
    # axis-aligned partial overlap: shift by 0.5 in x -> inter 0.5, union 1.5
    sh = jnp.asarray([0.5, 0.0, 1.0, 1.0, 0.0])
    assert abs(float(rotated_iou_2d(sq, sh)) - 0.5 / 1.5) < 1e-4
    # unit square vs itself rotated 45 deg: intersection is the regular
    # octagon with area 2*(sqrt(2)-1)
    rot = jnp.asarray([0.0, 0.0, 1.0, 1.0, np.pi / 4])
    inter = 2 * (np.sqrt(2) - 1)
    expect = inter / (2 - inter)
    assert abs(float(rotated_iou_2d(sq, rot)) - expect) < 1e-4
    # rotation by 90 deg of a square is identity
    rot90 = jnp.asarray([0.0, 0.0, 1.0, 1.0, np.pi / 2])
    assert abs(float(rotated_iou_2d(sq, rot90)) - 1.0) < 1e-4
    # rectangle vs itself rotated 180 deg is identity
    rect = jnp.asarray([1.0, 2.0, 2.0, 0.5, 0.7])
    rect180 = rect.at[4].add(np.pi)
    assert abs(float(rotated_iou_2d(rect, rect180)) - 1.0) < 1e-4


def test_map_perfect_and_wrong(rng):
    G = 12
    gt = rng.normal(size=(G, 6)).astype(np.float32)
    gt[:, 3:] = np.abs(gt[:, 3:]) + 0.5
    labels = rng.integers(0, 4, G)
    img = np.arange(G) % 3

    # perfect predictions
    mAP, aps = average_precision_3d(
        gt, labels, np.ones(G), img, gt, labels, img)
    assert abs(mAP - 1.0) < 1e-6
    # disjoint predictions
    off = gt.copy()
    off[:, :3] += 100.0
    mAP0, _ = average_precision_3d(
        off, labels, np.ones(G), img, gt, labels, img)
    assert mAP0 == 0.0


def _corners(box):
    cx, cy, w, h, th = box
    c, s = np.cos(th), np.sin(th)
    pts = np.array([[-w / 2, -h / 2], [w / 2, -h / 2],
                    [w / 2, h / 2], [-w / 2, h / 2]])
    rot = pts @ np.array([[c, s], [-s, c]])
    return rot + np.array([cx, cy])


def _clip_polygon(subject, clip):
    """Sutherland–Hodgman convex clipping — an independent numpy oracle."""
    out = list(subject)
    n = len(clip)
    for i in range(n):
        a, b = clip[i], clip[(i + 1) % n]
        edge = b - a
        inp, out = out, []
        if not inp:
            break

        def inside(p):
            return edge[0] * (p[1] - a[1]) - edge[1] * (p[0] - a[0]) >= -1e-12

        def intersect(p, q):
            d = q - p
            denom = edge[0] * d[1] - edge[1] * d[0]
            t = (edge[0] * (a[1] - p[1]) - edge[1] * (a[0] - p[0])) / denom
            return p + t * d

        for j in range(len(inp)):
            p, q = inp[j], inp[(j + 1) % len(inp)]
            if inside(q):
                if not inside(p):
                    out.append(intersect(p, q))
                out.append(q)
            elif inside(p):
                out.append(intersect(p, q))
    return np.array(out) if out else np.zeros((0, 2))


def _poly_area(pts):
    if len(pts) < 3:
        return 0.0
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def test_rotated_iou_vs_polygon_clipping_oracle(rng):
    """Cross-check rotated_iou_2d against an independent Sutherland-Hodgman
    polygon-clipping implementation on random rotated boxes (the legacy
    rotated-IoU/mAP math has no reference-code anchor — SURVEY §0.1 — so
    anchor it to computational geometry instead)."""
    for _ in range(60):
        a = np.array([rng.uniform(-2, 2), rng.uniform(-2, 2),
                      rng.uniform(0.3, 3), rng.uniform(0.3, 3),
                      rng.uniform(0, 2 * np.pi)], np.float64)
        b = np.array([rng.uniform(-2, 2), rng.uniform(-2, 2),
                      rng.uniform(0.3, 3), rng.uniform(0.3, 3),
                      rng.uniform(0, 2 * np.pi)], np.float64)
        inter = _poly_area(_clip_polygon(_corners(a), _corners(b)))
        union = a[2] * a[3] + b[2] * b[3] - inter
        expect = inter / union
        got = float(rotated_iou_2d(jnp.asarray(a, jnp.float32),
                                   jnp.asarray(b, jnp.float32)))
        assert abs(got - expect) < 2e-3, (a, b, got, expect)


def test_map_voc_assignment_no_second_best_credit():
    """A prediction whose best-overlapping GT is already taken is an FP
    (VOC semantics) — it must NOT be credited via a second-best GT."""
    size = np.array([1.0, 1.0, 1.0], np.float32)
    gt = np.stack([np.r_[0.0, 0.0, 0.0, size],
                   np.r_[0.8, 0.0, 0.0, size]]).astype(np.float32)
    preds = np.stack([
        gt[0],                                  # score .9: exact hit on A
        np.r_[0.3, 0.0, 0.0, size],             # score .8: A=.538, B=.333
        gt[1],                                  # score .7: exact hit on B
    ]).astype(np.float32)
    labels = np.zeros(3, np.int64)
    img = np.zeros(3, np.int64)
    mAP, _ = average_precision_3d(
        preds, labels, np.array([0.9, 0.8, 0.7]), img,
        gt, labels[:2], img[:2], iou_thresh=0.25)
    # tp sequence [1, 0, 1] over npos=2 -> 101-pt AP = (51 + 50*2/3) / 101
    expect = (51 + 50 * (2 / 3)) / 101
    assert abs(mAP - expect) < 1e-6, mAP


def test_legacy_model_and_criterion(rng):
    from room_slam_tpu.models.legacy_gru import RoomSlamGRU
    from room_slam_tpu.ops.losses import legacy_criterion

    model = RoomSlamGRU(hidden_size=32, max_objects=5, gru_layers=1)
    B, S = 2, 64
    x = jnp.asarray(rng.normal(size=(B, S, 2)).astype(np.float32))
    params = jax.jit(lambda k: model.init(
        {"params": k}, x, deterministic=True))(jax.random.key(0))
    out = model.apply(params, x, deterministic=True)
    assert out["classes"].shape == (B, 5, 4)
    assert out["positions"].shape == (B, 5, 2)
    assert out["sizes"].shape == (B, 5, 2)
    assert bool(jnp.all(out["sizes"] > 0))
    assert out["pred_boxes"].shape == (B, 5, 5)

    gt = np.zeros((B, 5, 5), np.float32)
    gl = np.full((B, 5), -1, np.int32)
    gv = np.zeros((B, 5), bool)
    gt[:, :2] = rng.normal(size=(B, 2, 5))
    gl[:, :2] = 1
    gv[:, :2] = True
    losses = legacy_criterion(
        out, {"boxes": jnp.asarray(gt), "labels": jnp.asarray(gl),
              "valid_mask": jnp.asarray(gv)})
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert set(losses) == {"class_loss", "position_loss", "size_loss",
                           "orientation_loss", "validity_loss", "total_loss"}


def test_detection_prf_operating_point():
    """detection_prf scores the post-processed set with VOC greedy
    assignment: duplicates of one GT count once, cross-image matches are
    forbidden, and P/R/F1 come from the raw counts."""
    import numpy as np

    from room_slam_tpu.train.metrics import detection_prf

    gt = np.array([[0, 0, 0, 2, 2, 2],
                   [10, 0, 0, 2, 2, 2]], np.float32)
    gt_labels = np.array([0, 1])
    gt_image = np.array([0, 0])
    # three predictions: exact hit on GT0, duplicate of GT0, far miss
    pred = np.array([[0, 0, 0, 2, 2, 2],
                     [0.1, 0, 0, 2, 2, 2],
                     [50, 0, 0, 2, 2, 2]], np.float32)
    labels = np.array([0, 0, 1])
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    image = np.array([0, 0, 0])

    p, r, f1, tp = detection_prf(pred, labels, scores, image,
                                 gt, gt_labels, gt_image, iou_thresh=0.5)
    assert tp == 1                     # duplicate is FP, miss is FP
    assert p == pytest.approx(1 / 3)
    assert r == pytest.approx(1 / 2)
    assert f1 == pytest.approx(2 * (1 / 3) * (1 / 2) / (1 / 3 + 1 / 2))

    # same boxes in a DIFFERENT image than the GT: nothing matches
    p2, r2, f12, tp2 = detection_prf(pred, labels, scores,
                                     np.array([1, 1, 1]),
                                     gt, gt_labels, gt_image,
                                     iou_thresh=0.5)
    assert tp2 == 0 and f12 == 0.0


def test_realbench_pooling_matches_pooled_evaluator():
    """realbench precomputes per-capture VOC TP/FP flags and merges them per
    bootstrap resample; the merge must reproduce the pooled evaluator
    (average_precision_3d / detection_prf) exactly on the identity resample."""
    import numpy as np

    from room_slam_tpu.tools.realbench import (_capture_flags, _pool_metrics,
                                               IOU_THRESHOLDS)
    from room_slam_tpu.train.metrics import (average_precision_3d,
                                             detection_prf)

    rng = np.random.default_rng(7)
    n_img, P, G = 5, 40, 18
    centers = rng.uniform(-4, 4, size=(G, 3)).astype(np.float32)
    sizes = rng.uniform(0.5, 2.0, size=(G, 3)).astype(np.float32)
    gt_boxes = np.concatenate([centers, sizes], -1)
    gt_labels = rng.integers(0, 4, size=G)
    gt_image = np.sort(rng.integers(0, n_img, size=G))
    # predictions: jittered copies of random GTs plus pure noise
    src = rng.integers(0, G, size=P)
    pred_boxes = gt_boxes[src].copy()
    pred_boxes[:, :3] += rng.normal(0, 0.4, size=(P, 3)).astype(np.float32)
    pred_labels = np.where(rng.random(P) < 0.8, gt_labels[src],
                           rng.integers(0, 4, size=P))
    pred_image = gt_image[src].copy()
    pred_image[rng.random(P) < 0.2] = rng.integers(0, n_img)
    pred_scores = rng.random(P).astype(np.float32)

    dets = {"boxes": pred_boxes, "labels": pred_labels,
            "conf": pred_scores, "img": pred_image}
    gts = {"boxes": gt_boxes, "labels": gt_labels, "img": gt_image}
    per_cap = _capture_flags(dets, gts, n_img)
    pooled = _pool_metrics(per_cap, np.arange(n_img))

    for t in IOU_THRESHOLDS:
        mAP, aps = average_precision_3d(
            pred_boxes, pred_labels, pred_scores, pred_image,
            gt_boxes, gt_labels, gt_image, iou_thresh=t)
        prec, rec, f1, tp = detection_prf(
            pred_boxes, pred_labels, pred_scores, pred_image,
            gt_boxes, gt_labels, gt_image, iou_thresh=t)
        assert pooled[f"mAP@{t}"] == pytest.approx(mAP, abs=1e-9)
        assert pooled[f"det_f1@{t}"] == pytest.approx(f1, abs=1e-9)
        assert pooled[f"tp@{t}"] == tp
    # a duplicated capture contributes twice (bootstrap semantics)
    twice = _pool_metrics(per_cap, np.array([0, 0]))
    once = _pool_metrics(per_cap, np.array([0]))
    assert twice["num_gt"] == 2 * once["num_gt"]
    assert twice["tp@0.25"] == 2 * once["tp@0.25"]
    assert twice["mAP@0.25"] == pytest.approx(once["mAP@0.25"], abs=1e-9)


def test_structural_ceiling_analysis():
    """ceiling.analyze_capture classifies GT boxes by trace-geometric
    recoverability: a walked-through box is 'contacted', a wall just beyond
    the envelope is 'plane_inferable', a far never-approached box is
    'unrecoverable'."""
    import numpy as np

    from room_slam_tpu.tools.ceiling import analyze_capture

    # square walk inside [-2, 2]^2 at y=1
    t = np.linspace(0, 2 * np.pi, 200)
    trace = np.stack([2 * np.cos(t), np.ones_like(t), 2 * np.sin(t), t],
                     axis=1).astype(np.float32)
    boxes = np.array([
        [2.0, 1.0, 0.0, 0.3, 1.0, 0.3],    # on the path -> contacted
        [2.9, 1.0, 0.0, 0.2, 2.0, 4.0],    # thin wall 0.8m beyond -> plane
        [6.0, 1.0, 6.0, 0.4, 0.4, 0.4],    # far item -> unrecoverable
    ], np.float32)
    labels = np.array([1, 0, 1])
    rows = analyze_capture(trace, boxes, labels)
    assert rows[0]["status"] == "contacted"
    assert rows[1]["status"] == "plane_inferable"
    assert rows[2]["status"] == "unrecoverable"
