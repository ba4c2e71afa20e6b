"""Learned per-candidate quality scoring (the zero-shot rerank signal).

Round-4 standing conclusion (PARITY.md): soft-NMS recovers the
NMS-destroyed zero-shot candidates — the correct boxes now EXIST in the
output but rank middling, and every hand-built rerank signal measured so
far (confidence, multi-view support, physics penetration) cannot order
them. This module learns the ordering instead: a tiny MLP over
physics/geometry/agreement features of each candidate, trained on
synthetic rooms where per-candidate IoU-vs-GT labels are free, applied
at post-process time as a ``conf_scale`` multiplier (the same hook
physics rescoring uses — ops/nms.post_process).

Everything here is pure jnp at fixed shapes: ``candidate_features`` maps
one capture's pooled candidate set to a [Q, F] feature matrix inside
jit/vmap; ``mlp_apply`` evaluates the scorer. Training lives in
tools/qscore.py (host loop over a jitted loss step).

The reference has no trained post-process at all
(src/benchmark/inference.py:130-197: threshold + greedy NMS).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from room_slam_tpu.ops.iou import pairwise_iou_3d
from room_slam_tpu.ops.refine import trace_extent
from room_slam_tpu.ops.ttopt import penetration_depth

N_FEATURES = 18


def candidate_features(
    boxes: jnp.ndarray,              # [Q, 6] (cx, cy, cz, sx, sy, sz)
    logits: jnp.ndarray,             # [Q, C] class logits
    objectness: jnp.ndarray | None,  # [Q] no-object logits, or None
    raw: jnp.ndarray,                # [L, 4] the input trace
    length: jnp.ndarray,             # [] valid length
    support_iou: float = 0.25,
    contact_margin: float = 0.3,
) -> jnp.ndarray:
    """[Q, N_FEATURES] per-candidate evidence features.

    Feature groups (all trace-relative, so they transfer across rooms):
    confidence + class posture; box geometry (log sizes, footprint,
    absolute y placement); physics (mean penetration depth of the walk
    into the box, XZ overshoot beyond the visited envelope); contact
    evidence (fraction of trace points within ``contact_margin`` of the
    footprint ring, min approach distance); multi-view agreement
    (same-class support mass at ``support_iou``, raw vote count).
    """
    Q = boxes.shape[0]
    L = raw.shape[0]
    probs = jax.nn.softmax(logits, axis=-1)
    conf = jnp.max(probs, axis=-1)
    if objectness is not None:
        conf = conf * jax.nn.sigmoid(objectness)
    labels = jnp.argmax(logits, -1)
    # N_FEATURES (and every fitted weight file) is bound to the 4-class
    # benchmark label space; a different C would silently zero the class-
    # posture features, so fail loudly instead (shape is static in jit).
    assert logits.shape[-1] == 4, (
        f"qscore features are fitted for 4 classes, got C={logits.shape[-1]}")
    onehot = jax.nn.one_hot(labels, 4)

    cx, cy, cz = boxes[:, 0], boxes[:, 1], boxes[:, 2]
    sx, sy, sz = boxes[:, 3], boxes[:, 4], boxes[:, 5]
    logs = jnp.log(jnp.clip(jnp.stack([sx, sy, sz], -1), 1e-3, 50.0))
    foot = jnp.log(jnp.clip(sx * sz, 1e-4, 100.0))

    pen = penetration_depth(boxes, raw, length)                    # [Q]

    x_min, x_max, z_min, z_max = trace_extent(raw, length)
    span = jnp.maximum(jnp.maximum(x_max - x_min, z_max - z_min), 1e-3)
    over_x = jnp.maximum(jnp.maximum((cx + sx / 2) - x_max,
                                     x_min - (cx - sx / 2)), 0.0)
    over_z = jnp.maximum(jnp.maximum((cz + sz / 2) - z_max,
                                     z_min - (cz - sz / 2)), 0.0)

    # contact ring: trace points near (but outside) the XZ footprint
    valid = (jnp.arange(L) < length)
    px, pz = raw[:, 0], raw[:, 2]
    ax = jnp.maximum(jnp.abs(px[None, :] - cx[:, None]) - sx[:, None] / 2,
                     0.0)
    az = jnp.maximum(jnp.abs(pz[None, :] - cz[:, None]) - sz[:, None] / 2,
                     0.0)
    d = jnp.sqrt(ax ** 2 + az ** 2 + 1e-12)                        # [Q, L]
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    near = jnp.sum(jnp.where(valid[None, :], d < contact_margin, False),
                   axis=1) / n_valid
    min_d = jnp.min(jnp.where(valid[None, :], d, jnp.inf), axis=1)
    min_d = jnp.minimum(min_d, 10.0)

    # same-class multi-view agreement over the pooled candidate set
    iou = pairwise_iou_3d(boxes, boxes)
    same = labels[None, :] == labels[:, None]
    votes = (iou >= support_iou) & same
    mass = votes @ conf                                            # [Q]
    total = same.astype(conf.dtype) @ conf
    support = mass / jnp.maximum(total, 1e-9)
    n_votes = votes.sum(-1).astype(jnp.float32) / Q

    feats = jnp.concatenate([
        conf[:, None],                       # 1
        onehot,                              # 4
        logs,                                # 3
        foot[:, None],                       # 1
        cy[:, None], (cy - sy / 2)[:, None],  # 2 absolute placement
        pen[:, None],                        # 1
        over_x[:, None], over_z[:, None],    # 2
        (jnp.stack([near, min_d], -1)),      # 2
        support[:, None], n_votes[:, None],  # 2
    ], axis=-1)
    # span-relative variants keep scale transfer honest for the overshoots
    feats = feats.at[:, -6].set(feats[:, -6] / span)   # over_x / span
    feats = feats.at[:, -5].set(feats[:, -5] / span)   # over_z / span
    return feats                                        # [Q, 18]


def mlp_init(key, hidden: int = 16, n_features: int = N_FEATURES):
    k1, k2 = jax.random.split(key)
    return {
        "w1": jax.random.normal(k1, (n_features, hidden)) * 0.3,
        "b1": jnp.zeros((hidden,)),
        "w2": jax.random.normal(k2, (hidden, 1)) * 0.3,
        "b2": jnp.zeros((1,)),
        "mu": jnp.zeros((n_features,)),
        "sigma": jnp.ones((n_features,)),
    }


def mlp_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """[..., F] features -> [...] quality logit."""
    z = (x - params["mu"]) / params["sigma"]
    h = jnp.tanh(z @ params["w1"] + params["b1"])
    return (h @ params["w2"] + params["b2"])[..., 0]


def load_params(path: str) -> dict:
    """Load weights saved by tools/qscore.py into jnp arrays."""
    import json

    with open(path) as f:
        raw = json.load(f)
    return {k: jnp.asarray(v) for k, v in raw.items()
            if not k.startswith("_")}


def quality_scale(params: dict, boxes, logits, objectness, raw,
                  length) -> jnp.ndarray:
    """[Q] multiplicative rescoring factor sigmoid(q) for post_process's
    ``conf_scale`` hook."""
    x = candidate_features(boxes, logits, objectness, raw, length)
    return jax.nn.sigmoid(mlp_apply(params, x))
