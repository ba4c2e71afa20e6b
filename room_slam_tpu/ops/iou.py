"""Axis-aligned 3D IoU / GIoU and rotated 2D IoU.

- ``iou_giou_3d`` matches the reference's paired box IoU/GIoU used in the set
  loss (ref: src/benchmark/train.py:75-107).
- ``pairwise_iou_3d`` is the [N, M] variant for NMS and mAP (the reference
  computes this one pair at a time in a Python loop, inference.py:60-127).
- ``rotated_iou_2d`` supports the legacy surface's oriented boxes
  (ref: README.md:117-132) via convex polygon clipping at fixed shape.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

_EPS = 1e-6


def iou_giou_3d(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Paired IoU and GIoU of axis-aligned 3D boxes.

    Args:
        boxes1, boxes2: ``[..., 6]`` (cx, cy, cz, sx, sy, sz).

    Returns:
        (iou, giou), each ``[...]``. Matches train.py:75-107 exactly,
        including the +1e-6 denominators.
    """
    b1_min = boxes1[..., :3] - boxes1[..., 3:] / 2
    b1_max = boxes1[..., :3] + boxes1[..., 3:] / 2
    b2_min = boxes2[..., :3] - boxes2[..., 3:] / 2
    b2_max = boxes2[..., :3] + boxes2[..., 3:] / 2

    inter_min = jnp.maximum(b1_min, b2_min)
    inter_max = jnp.minimum(b1_max, b2_max)
    inter = jnp.clip(inter_max - inter_min, 0.0, None).prod(axis=-1)

    v1 = boxes1[..., 3:].prod(axis=-1)
    v2 = boxes2[..., 3:].prod(axis=-1)
    union = v1 + v2 - inter
    iou = inter / (union + _EPS)

    enc_min = jnp.minimum(b1_min, b2_min)
    enc_max = jnp.maximum(b1_max, b2_max)
    enc = jnp.clip(enc_max - enc_min, 0.0, None).prod(axis=-1)
    giou = iou - (enc - union) / (enc + _EPS)
    return iou, giou


def iou_giou_2d_xz(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Paired IoU/GIoU of the XZ FOOTPRINTS of axis-aligned 3D boxes.

    Footprint localization dominates the remaining box error for furniture
    (per-axis IoU decomposition: x/z median ~0.25-0.5 vs y ~0.65-0.8), so
    training adds this as an auxiliary objective (train.footprint_weight).
    No reference counterpart (the reference trains 3D GIoU only).
    """
    idx = jnp.array([0, 2, 3, 5])  # (cx, cz, sx, sz)
    f1 = boxes1[..., idx]
    f2 = boxes2[..., idx]
    b1_min = f1[..., :2] - f1[..., 2:] / 2
    b1_max = f1[..., :2] + f1[..., 2:] / 2
    b2_min = f2[..., :2] - f2[..., 2:] / 2
    b2_max = f2[..., :2] + f2[..., 2:] / 2
    inter = jnp.clip(
        jnp.minimum(b1_max, b2_max) - jnp.maximum(b1_min, b2_min),
        0.0, None).prod(axis=-1)
    a1 = f1[..., 2:].prod(axis=-1)
    a2 = f2[..., 2:].prod(axis=-1)
    union = a1 + a2 - inter
    iou = inter / (union + _EPS)
    enc = jnp.clip(
        jnp.maximum(b1_max, b2_max) - jnp.minimum(b1_min, b2_min),
        0.0, None).prod(axis=-1)
    return iou, iou - (enc - union) / (enc + _EPS)


def pairwise_iou_3d(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """All-pairs IoU: ``[N, 6] x [M, 6] -> [N, M]``."""
    iou, _ = iou_giou_3d(boxes1[:, None, :], boxes2[None, :, :])
    return iou


def eval_pair_iou_3d(pb: jnp.ndarray, gb: jnp.ndarray) -> jnp.ndarray:
    """Paired IoU with the evaluator's denominator convention
    (union + 1e-6 added BEFORE the divide — ref: train.py:285-298)."""
    pb_min = pb[..., :3] - pb[..., 3:] / 2
    pb_max = pb[..., :3] + pb[..., 3:] / 2
    gb_min = gb[..., :3] - gb[..., 3:] / 2
    gb_max = gb[..., :3] + gb[..., 3:] / 2
    inter = jnp.clip(
        jnp.minimum(pb_max, gb_max) - jnp.maximum(pb_min, gb_min), 0.0, None
    ).prod(axis=-1)
    union = pb[..., 3:].prod(axis=-1) + gb[..., 3:].prod(axis=-1) - inter + _EPS
    return inter / union


# ---------------------------------------------------------------------------
# Rotated-rectangle IoU (legacy surface: boxes with yaw orientation)
# ---------------------------------------------------------------------------


def _box_corners_2d(boxes: jnp.ndarray) -> jnp.ndarray:
    """Corners of rotated rectangles: ``[..., 5] (cx, cy, w, h, theta)``
    -> ``[..., 4, 2]`` counter-clockwise."""
    cx, cy, w, h, th = (boxes[..., i] for i in range(5))
    c, s = jnp.cos(th), jnp.sin(th)
    dx = jnp.stack([w, w, -w, -w], axis=-1) / 2
    dy = jnp.stack([-h, h, h, -h], axis=-1) / 2
    x = cx[..., None] + c[..., None] * dx - s[..., None] * dy
    y = cy[..., None] + s[..., None] * dx + c[..., None] * dy
    return jnp.stack([x, y], axis=-1)


def _polygon_area(pts: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
    """Shoelace area of the first ``n_valid`` points of a padded ring
    ``[K, 2]``."""
    K = pts.shape[0]
    idx = jnp.arange(K)
    nxt = jnp.where(idx + 1 >= n_valid, 0, idx + 1)
    valid = idx < n_valid
    x, y = pts[:, 0], pts[:, 1]
    cross = x * pts[nxt, 1] - pts[nxt, 0] * y
    return 0.5 * jnp.abs(jnp.sum(jnp.where(valid, cross, 0.0)))


def _clip_polygon(
    pts: jnp.ndarray, n: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sutherland-Hodgman: clip a padded convex polygon (ring of ``n`` of
    ``K`` slots) by the half-plane left of directed edge a->b. Output ring has
    at most n+1 vertices; K slots must allow that."""
    K = pts.shape[0]
    edge = b - a
    idx = jnp.arange(K)
    nxt = jnp.where(idx + 1 >= n, 0, idx + 1)
    cur = pts
    nxt_pts = pts[nxt]

    def side(p):
        return edge[0] * (p[..., 1] - a[1]) - edge[1] * (p[..., 0] - a[0])

    s_cur = side(cur)
    s_nxt = side(nxt_pts)
    in_cur = s_cur >= 0
    in_nxt = s_nxt >= 0

    denom = s_cur - s_nxt
    t = s_cur / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    inter = cur + t[:, None] * (nxt_pts - cur)

    # each input edge emits up to 2 points: (cur if in_cur) then
    # (intersection if crossing)
    emit_cur = in_cur & (idx < n)
    emit_int = (in_cur != in_nxt) & (idx < n)

    # compact via prefix sums into fixed K slots
    counts = emit_cur.astype(jnp.int32) + emit_int.astype(jnp.int32)
    offsets = jnp.cumsum(counts) - counts
    out = jnp.zeros_like(pts)
    pos_cur = jnp.where(emit_cur, offsets, K - 1)
    out = out.at[pos_cur].set(jnp.where(emit_cur[:, None], cur, out[pos_cur]))
    pos_int = jnp.where(emit_int, offsets + emit_cur.astype(jnp.int32), K - 1)
    out = out.at[pos_int].set(
        jnp.where(emit_int[:, None], inter, out[pos_int]))
    return out, jnp.sum(counts)


def rotated_iou_2d(box1: jnp.ndarray, box2: jnp.ndarray) -> jnp.ndarray:
    """IoU of two rotated rectangles ``(cx, cy, w, h, theta)``.

    Intersection of two convex quads has at most 8 vertices; we clip quad 1 by
    the 4 edges of quad 2 with padded rings of 16 slots. vmap for batches.
    """
    c1 = _box_corners_2d(box1)  # [4, 2]
    c2 = _box_corners_2d(box2)
    K = 16
    pts = jnp.zeros((K, 2), dtype=box1.dtype).at[:4].set(c1)
    n = jnp.int32(4)
    for e in range(4):
        pts, n = _clip_polygon(pts, n, c2[e], c2[(e + 1) % 4])
    inter = jnp.where(n >= 3, _polygon_area(pts, n), 0.0)
    a1 = box1[2] * box1[3]
    a2 = box2[2] * box2[3]
    return inter / (a1 + a2 - inter + _EPS)
