"""Aggregate real-room benchmark: score a checkpoint on ALL real captures.

The reference ships 8 real captures across 2 rooms
(``dataset/train/``: 4 Unity-agent + 3 human walks of an 11-box room;
``dataset/val/``: 1 human walk of a 10-box room — the room whose layout the
whole system exists to recover). Scoring a single ~100-point capture makes
mAP rank noise (one TP's rank moves mAP@0.25 by ~0.07); this tool pools all
captures into one detection benchmark with per-capture rows and a bootstrap
confidence interval, so sim2real progress is measurable.

Honest calibration: the operating point (threshold / NMS / refine / extent /
consensus) is either given explicitly or chosen by sweeping on a SEPARATE
calibration directory (``--calib_dir``, e.g. held-out synthetic rooms) —
never on the captures being scored.

    python -m room_slam_tpu.tools.realbench --checkpoint ck/best_model \
        --calib_dir /tmp/synth_calib --output realbench.json

Statistics: each capture is one "image"; VOC greedy assignment makes every
prediction's TP/FP flag depend only on its own capture (per-image taken
flags, global ordering restricted to one image = per-image descending-score
ordering), so pooled AP for any bootstrap resample is a cheap merge of
precomputed per-capture (score, tp) lists.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

REF_DIRS = ("/root/reference/dataset/train", "/root/reference/dataset/val")
IOU_THRESHOLDS = (0.25, 0.5)


def forward_captures(checkpoint: str, dirs, batch_size: int = 8,
                     tta: bool = False, tta_reflect: bool = False,
                     tta_scales: tuple = (), tta_windows: int = 0) -> dict:
    """Cached forwards over every capture of every directory, concatenated.
    Requires all dirs to exist; capture names are prefixed by room."""
    from room_slam_tpu.tools.calibrate import _forward_val_set

    parts = [_forward_val_set(checkpoint, d, batch_size, tta=tta,
                              tta_reflect=tta_reflect,
                              tta_scales=tta_scales,
                              tta_windows=tta_windows)
             for d in dirs]
    out = {}
    for k in parts[0]:
        if k == "names":
            out[k] = [f"{Path(d).name}/{n}"
                      for d, p in zip(dirs, parts) for n in p["names"]]
        elif all(k in p for p in parts):
            out[k] = np.concatenate([p[k] for p in parts])
    return out


def capture_confidence(cached: dict) -> np.ndarray:
    """Per-capture auto-gate signal: max candidate confidence [N].

    Max over the pooled candidates of softmax(class logits) x
    sigmoid(objectness), read from the RAW model outputs (before any
    synthesis appends rows). Memorized rooms read ~0.9, unseen rooms
    ~0.08 (PARITY round-3 top-K note) — the signal behind the adopted
    ttopt auto-gate (FINAL.md round-5 rows 6-7), with the threshold
    calibrated from the SEEN room only (half its minimum capture
    confidence), so no unseen-room data enters the rule.
    """
    import jax
    import jax.numpy as jnp

    probs = np.asarray(jax.nn.softmax(
        jnp.asarray(cached["pred_logits"]), axis=-1))
    conf = probs.max(-1)
    if cached.get("pred_objectness") is not None:
        conf = conf / (1.0 + np.exp(
            -np.asarray(cached["pred_objectness"])))
    return conf.max(-1)


def apply_operating_point(cached: dict, cell: dict,
                          refine_furniture: bool = False) -> dict:
    """Post-process cached forwards at ONE operating point.

    Returns {boxes [P,6], labels [P], conf [P], img [P]} of kept detections.
    """
    import jax
    import jax.numpy as jnp

    from room_slam_tpu.ops.nms import post_process
    from room_slam_tpu.ops.refine import (outside_extent_mask, refine_walls,
                                          snap_y_planes,
                                          synthesize_furniture,
                                          synthesize_walls)
    from room_slam_tpu.ops.ttopt import (TTOptParams, adapt_boxes,
                                         penetration_depth)

    boxes = cached["pred_boxes"]
    logits = cached["pred_logits"]
    obj = cached.get("pred_objectness")
    rf = cell.get("refine")
    if rf is not None:
        tr = cell.get("trust", 0.4)
        pred_labels = np.argmax(logits, -1)
        boxes = np.asarray(jax.jit(jax.vmap(
            lambda b, l, r, n: refine_walls(
                b, l, r, n, clearance=jnp.float32(rf),
                trust=jnp.float32(tr),
                furniture_aware=refine_furniture)
        ))(jnp.asarray(boxes), jnp.asarray(pred_labels),
           jnp.asarray(cached["raw"]), jnp.asarray(cached["length"])))

    yc = cell.get("ycal")
    if yc is not None:
        # seen-room-calibrated floor/ceiling snap for tall BLOCK boxes
        # (ops/refine.snap_y_planes); before synth so synthesized walls
        # inherit the snapped heights
        fl, ce = float(yc[0]), float(yc[1])
        pred_labels = np.argmax(logits, -1)
        boxes = np.asarray(jax.jit(jax.vmap(
            lambda b, l: snap_y_planes(b, l, jnp.float32(fl),
                                       jnp.float32(ce))
        ))(jnp.asarray(boxes), jnp.asarray(pred_labels)))

    base_valid = np.ones(boxes.shape[:2], dtype=bool)
    if cell.get("synth"):
        obj_in = (jnp.zeros(boxes.shape[:2]) if obj is None
                  else jnp.asarray(obj))
        boxes, logits, so, base_valid = (np.asarray(a) for a in jax.jit(
            jax.vmap(lambda b, lg, o, r, n: synthesize_walls(
                b, lg, o, r, n,
                clearance=jnp.float32(rf if rf is not None else 0.3),
                furniture_aware=refine_furniture))
        )(jnp.asarray(boxes), jnp.asarray(logits), obj_in,
          jnp.asarray(cached["raw"]), jnp.asarray(cached["length"])))
        if obj is not None:
            obj = so

    if cell.get("synthf"):
        # True = v1 interior holes; "v2" adds boundary-notch + tall-BLOCK
        # hypotheses (ops/refine.synthesize_furniture_v2)
        from room_slam_tpu.ops.refine import synthesize_furniture_v2
        sfn = (synthesize_furniture_v2 if cell["synthf"] == "v2"
               else synthesize_furniture)
        Qb = boxes.shape[1]
        if obj is None:
            boxes, logits, _, nv = (np.asarray(a) if a is not None else None
                                    for a in jax.jit(jax.vmap(
                lambda b, lg, r, n: sfn(b, lg, None, r, n))
            )(jnp.asarray(boxes), jnp.asarray(logits),
              jnp.asarray(cached["raw"]), jnp.asarray(cached["length"])))
        else:
            boxes, logits, obj, nv = (np.asarray(a) for a in jax.jit(
                jax.vmap(lambda b, lg, o, r, n: sfn(
                    b, lg, o, r, n))
            )(jnp.asarray(boxes), jnp.asarray(logits), jnp.asarray(obj),
              jnp.asarray(cached["raw"]), jnp.asarray(cached["length"])))
        base_valid = np.concatenate([base_valid, np.asarray(nv)[:, Qb:]],
                                    axis=1)

    if cell.get("ttopt"):
        # test-time trace-consistency adaptation of the candidate boxes
        # (after refine/synth, before the extent mask — ops/ttopt.py).
        # An "auto" key makes the lever deployable without knowing the
        # room's memorization status: ttopt applies PER CAPTURE only when
        # the model's own max candidate confidence falls below the
        # threshold — memorized rooms read ~0.9, unseen rooms ~0.08
        # (PARITY round-3 top-K note), and the threshold itself is
        # calibrated from the SEEN room only (half its minimum capture
        # confidence), so no unseen-room data enters the rule.
        tcfg = dict(cell["ttopt"]) if isinstance(
            cell.get("ttopt"), dict) else {}
        tau = tcfg.pop("auto", None)
        tp = TTOptParams(**tcfg)
        adapted = np.asarray(jax.jit(jax.vmap(
            lambda b, r, n: adapt_boxes(b, r, n, tp)
        ))(jnp.asarray(boxes), jnp.asarray(cached["raw"]),
           jnp.asarray(cached["length"])))
        if tau is None:
            boxes = adapted
        else:
            use = capture_confidence(cached) < float(tau)  # [N] per capture
            boxes = np.where(use[:, None, None], adapted, boxes)

    ext = cell.get("extent")
    if ext is None:
        cand = jnp.asarray(base_valid)
    else:
        # BEFORE NMS/top_k (see ops/nms.post_process candidate_mask)
        cand = jnp.asarray(base_valid) & ~jax.jit(jax.vmap(
            lambda b, r, n: outside_extent_mask(
                b, r, n, slack=jnp.float32(ext))
        ))(jnp.asarray(boxes), jnp.asarray(cached["raw"]),
           jnp.asarray(cached["length"]))

    pen_beta = cell.get("pen_beta")
    if pen_beta is not None:
        # physics rescoring: demote candidates the trace walks through
        depth = jax.jit(jax.vmap(penetration_depth))(
            jnp.asarray(boxes), jnp.asarray(cached["raw"]),
            jnp.asarray(cached["length"]))
        conf_scale = jnp.exp(-jnp.float32(pen_beta) * depth)
    else:
        conf_scale = jnp.ones(boxes.shape[:2], dtype=jnp.float32)

    if cell.get("qscore"):
        # learned per-candidate quality rescoring (tools/qscore.py)
        from room_slam_tpu.ops.qscore import load_params, quality_scale

        qp = load_params(cell["qscore"])
        if obj is None:
            qsc = jax.jit(jax.vmap(
                lambda b, lg, r, n: quality_scale(qp, b, lg, None, r, n)))(
                    jnp.asarray(boxes), jnp.asarray(logits),
                    jnp.asarray(cached["raw"]),
                    jnp.asarray(cached["length"]))
        else:
            qsc = jax.jit(jax.vmap(
                lambda b, lg, o, r, n: quality_scale(qp, b, lg, o, r, n)))(
                    jnp.asarray(boxes), jnp.asarray(logits),
                    jnp.asarray(obj), jnp.asarray(cached["raw"]),
                    jnp.asarray(cached["length"]))
        qtau = cell.get("qscore_auto")
        if qtau is not None:
            # per-capture gate, identical signal + semantics to the
            # adopted ttopt auto-gate: rerank only captures the model is
            # unsure about (unseen rooms); memorized rooms keep their raw
            # confidence ranking bit-identically.
            use = capture_confidence(cached) < float(qtau)
            qsc = jnp.where(jnp.asarray(use)[:, None], jnp.asarray(qsc),
                            jnp.ones_like(jnp.asarray(qsc)))
        conf_scale = conf_scale * qsc

    def _post(b, lg, o, cm, cs):
        k, lb, cf, ob = post_process(
            b, lg, confidence_threshold=cell["threshold"],
            nms_threshold=cell["nms"], consensus=cell.get("consensus", False),
            top_k=cell.get("top_k"), objectness=o, candidate_mask=cm,
            fuse=cell.get("fuse", False), return_boxes=True,
            support=cell.get("support"), conf_scale=cs,
            soft_sigma=cell.get("soft"))
        return k, lb, cf, ob

    if obj is None:
        keep, labels, conf, boxes = (np.asarray(a) for a in jax.jit(
            jax.vmap(lambda b, lg, cm, cs: _post(b, lg, None, cm, cs)))(
                jnp.asarray(boxes), jnp.asarray(logits), cand, conf_scale))
    else:
        keep, labels, conf, boxes = (np.asarray(a) for a in jax.jit(
            jax.vmap(_post))(jnp.asarray(boxes), jnp.asarray(logits),
                             jnp.asarray(obj), cand, conf_scale))
    img, flat = np.nonzero(keep)
    return {"boxes": boxes[img, flat], "labels": labels[img, flat],
            "conf": conf[img, flat], "img": img}


def _capture_flags(dets: dict, gts: dict, n_img: int) -> list:
    """Per-capture VOC TP/FP flags.

    Returns, per capture, ``{(iou_t, cls): (scores_desc, tp_flags)}`` plus
    ``npos`` per class and ``npred``. Greedy assignment inside one capture
    with descending-score order reproduces the pooled evaluator exactly
    (see module docstring).
    """
    import jax.numpy as jnp

    from room_slam_tpu.ops.iou import pairwise_iou_3d

    per_cap = []
    for i in range(n_img):
        p_sel = dets["img"] == i
        g_sel = gts["img"] == i
        pb, pl = dets["boxes"][p_sel], dets["labels"][p_sel]
        ps = dets["conf"][p_sel]
        gb, gl = gts["boxes"][g_sel], gts["labels"][g_sel]
        entry = {"npred": int(p_sel.sum()),
                 "npos": {int(c): int((gl == c).sum()) for c in np.unique(gl)},
                 "flags": {}}
        # classes with predictions but no same-class GT in this capture
        # still contribute FPs to the class's pooled precision curve
        for c in np.union1d(np.unique(gl), np.unique(pl)):
            pc = pl == c
            if pc.sum() == 0:
                continue
            order = np.argsort(-ps[pc], kind="stable")
            pbox = pb[pc][order]
            score = ps[pc][order]
            n_gt = int((gl == c).sum())
            if n_gt == 0:
                for t in IOU_THRESHOLDS:
                    entry["flags"][(t, int(c))] = (
                        score, np.zeros(len(pbox)))
                continue
            iou = np.asarray(pairwise_iou_3d(
                jnp.asarray(pbox), jnp.asarray(gb[gl == c])))
            for t in IOU_THRESHOLDS:
                taken = np.zeros(iou.shape[1], dtype=bool)
                tp = np.zeros(len(pbox))
                for r in range(len(pbox)):
                    j = int(np.argmax(iou[r])) if iou.shape[1] else 0
                    if iou.shape[1] and iou[r, j] >= t and not taken[j]:
                        taken[j] = True
                        tp[r] = 1.0
                entry["flags"][(t, int(c))] = (score, tp)
        per_cap.append(entry)
    return per_cap


def _pool_metrics(per_cap: list, caps: np.ndarray) -> dict:
    """Pooled mAP / det-P/R/F1 over a multiset of capture indices (pure
    numpy merge of the precomputed per-capture flags)."""
    out = {}
    for t in IOU_THRESHOLDS:
        npos = {}
        merged = {}
        npred = 0
        tp_total = 0.0
        for i in caps:
            e = per_cap[i]
            npred += e["npred"]
            for c, n in e["npos"].items():
                npos[c] = npos.get(c, 0) + n
            for (tt, c), (score, tp) in e["flags"].items():
                if tt != t:
                    continue
                merged.setdefault(c, []).append((score, tp))
                tp_total += tp.sum()
        aps = {}
        for c, n in npos.items():
            if n == 0:
                continue
            if c not in merged:
                aps[c] = 0.0
                continue
            score = np.concatenate([s for s, _ in merged[c]])
            tp = np.concatenate([f for _, f in merged[c]])
            order = np.argsort(-score, kind="stable")
            tp_c = np.cumsum(tp[order])
            fp_c = np.cumsum(1.0 - tp[order])
            recall = tp_c / n
            precision = tp_c / np.maximum(tp_c + fp_c, 1e-9)
            ap = 0.0
            for r in np.linspace(0, 1, 101):
                m = recall >= r
                ap += precision[m].max() if m.any() else 0.0
            aps[c] = ap / 101
        npos_total = sum(npos.values())
        prec = tp_total / max(npred, 1)
        rec = tp_total / max(npos_total, 1)
        out[f"mAP@{t}"] = float(np.mean(list(aps.values()))) if aps else 0.0
        out[f"AP_per_class@{t}"] = {c: round(float(v), 4)
                                    for c, v in aps.items()}
        out[f"det_precision@{t}"] = prec
        out[f"det_recall@{t}"] = rec
        out[f"det_f1@{t}"] = (2 * prec * rec / (prec + rec)
                              if prec + rec > 0 else 0.0)
        out[f"tp@{t}"] = int(tp_total)
    out["num_predictions"] = int(sum(per_cap[i]["npred"] for i in caps))
    out["num_gt"] = int(sum(sum(per_cap[i]["npos"].values()) for i in caps))
    return out


def run(checkpoint: str, dirs, cell: dict, bootstrap: int = 2000,
        refine_furniture: bool = False, batch_size: int = 8,
        seed: int = 0, tta: bool = False, tta_reflect: bool = False,
        tta_scales: tuple = (), tta_windows: int = 0) -> dict:
    cached = forward_captures(checkpoint, dirs, batch_size, tta=tta,
                              tta_reflect=tta_reflect,
                              tta_scales=tta_scales,
                              tta_windows=tta_windows)
    dets = apply_operating_point(cached, cell, refine_furniture)
    n_img = cached["pred_boxes"].shape[0]
    g_img, g_flat = np.nonzero(cached["gt_valid"])
    gts = {"boxes": cached["gt_boxes"][g_img, g_flat],
           "labels": cached["gt_labels"][g_img, g_flat], "img": g_img}
    per_cap = _capture_flags(dets, gts, n_img)

    all_caps = np.arange(n_img)
    report = {
        "operating_point": cell,
        "captures": [],
        "aggregate": _pool_metrics(per_cap, all_caps),
    }
    # per-room (per-directory) aggregates: with --mix_real training the
    # train-room captures are SEEN data and only the val room is zero-shot;
    # pooling them silently would promote memorization to a transfer claim
    dirs_of = [n.split("/")[0] for n in cached["names"]]
    report["per_dir"] = {}
    for d in dict.fromkeys(dirs_of):
        caps = np.array([i for i, dd in enumerate(dirs_of) if dd == d])
        report["per_dir"][d] = _pool_metrics(per_cap, caps)
    for i in range(n_img):
        row = {"name": cached["names"][i]}
        row.update({k: (round(v, 4) if isinstance(v, float) else v)
                    for k, v in _pool_metrics(per_cap, np.array([i])).items()
                    if not k.startswith("AP_per_class")})
        report["captures"].append(row)
    if bootstrap:
        rng = np.random.default_rng(seed)
        stats = {f"mAP@{t}": [] for t in IOU_THRESHOLDS}
        stats.update({f"det_f1@{t}": [] for t in IOU_THRESHOLDS})
        for _ in range(bootstrap):
            caps = rng.integers(0, n_img, size=n_img)
            m = _pool_metrics(per_cap, caps)
            for k in stats:
                stats[k].append(m[k])
        report["bootstrap"] = {
            k: {"lo": round(float(np.percentile(v, 2.5)), 4),
                "hi": round(float(np.percentile(v, 97.5)), 4),
                "median": round(float(np.percentile(v, 50)), 4)}
            for k, v in stats.items()}
        report["bootstrap"]["resamples"] = bootstrap
    return report


def choose_cell(checkpoint: str, calib_dir: str, select: str = "mAP@0.25",
                batch_size: int = 8, refine_furniture: bool = False,
                tta: bool = False, tta_reflect: bool = False,
                tta_scales: tuple = ()) -> dict:
    """Sweep the calibration grid on a held-out directory; return the best
    cell by ``select`` (calibrate-on-A, score-on-B). ``tta``/``tta_reflect``
    must match the scoring run: a cell chosen on single-forward candidates
    is not comparable to pooled multi-view candidates."""
    from room_slam_tpu.tools.calibrate import _forward_val_set, sweep

    cached = _forward_val_set(checkpoint, calib_dir, batch_size, tta=tta,
                              tta_reflect=tta_reflect,
                              tta_scales=tta_scales)
    cells = sweep(cached, thresholds=(0.0, 0.3, 0.5, 0.7),
                  nms_vals=(0.1, 0.3),
                  refine_vals=(None, 0.55), extent_vals=(None, 0.75),
                  consensus_vals=(False, True),
                  top_k_vals=(None, 10, 15),
                  refine_furniture=refine_furniture,
                  trust_vals=(0.4, 0.8), synth_vals=(False, True))
    cells.sort(key=lambda c: (-c[select], -c["mAP@0.5"]))
    best = cells[0]
    return {k: best.get(k) for k in
            ("threshold", "nms", "refine", "trust", "synth", "ttopt",
             "extent", "consensus", "top_k", "support", "pen_beta")}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="checkpoint stem, or comma-separated stems to "
                        "pool as a seed ensemble")
    p.add_argument("--dirs", default=",".join(REF_DIRS),
                   help="comma list of capture directories to score")
    p.add_argument("--calib_dir", default=None,
                   help="held-out directory to choose the operating point on"
                        " (otherwise --threshold/--nms/... are used as-is)")
    p.add_argument("--select", default="mAP@0.25",
                   help="metric the calibration sweep optimizes")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--nms", type=float, default=0.3)
    p.add_argument("--refine", default="none")
    p.add_argument("--trust", type=float, default=0.4,
                   help="wall-refine max snap distance (m)")
    p.add_argument("--synth", action="store_true",
                   help="inject the 4 extent-implied wall candidates "
                        "(ops/refine.synthesize_walls)")
    p.add_argument("--extent", default="none")
    p.add_argument("--consensus", action="store_true")
    p.add_argument("--top_k", type=int, default=None,
                   help="keep only the K best detections after NMS")
    p.add_argument("--fuse", action="store_true",
                   help="weighted box fusion: kept boxes become their NMS "
                        "cluster's score-weighted mean (ops/nms)")
    p.add_argument("--ttopt", action="store_true",
                   help="test-time trace-consistency adaptation of the "
                        "candidate boxes against non-penetration / "
                        "envelope physics (ops/ttopt.py)")
    p.add_argument("--ttopt_params", default=None,
                   help="JSON dict of TTOptParams overrides applied when "
                        "--ttopt is set (e.g. '{\"deadband\": 0.15}')")
    p.add_argument("--support", default="none",
                   help="support-ordered NMS: vote IoU threshold (e.g. "
                        "0.25) — candidates are reranked by same-class "
                        "multi-view agreement BEFORE the greedy sweep "
                        "(ops/nms.post_process support)")
    p.add_argument("--pen_beta", default="none",
                   help="physics rescoring strength: ranking confidence "
                        "is scaled by exp(-beta * mean penetration depth) "
                        "(ops/ttopt.penetration_depth)")
    p.add_argument("--soft", default="none",
                   help="soft-NMS Gaussian sigma: loose overlaps are "
                        "decayed instead of suppressed; --nms becomes the "
                        "tight-duplicate fusion threshold (pair with a "
                        "HIGH value like 0.5) — ops/nms.soft_nms_3d_fused")
    p.add_argument("--qscore_auto", default="none",
                   help="per-capture confidence gate for --qscore (same "
                        "signal + tau rule as the adopted ttopt auto-"
                        "gate): rerank only captures whose max candidate "
                        "confidence is below this threshold")
    p.add_argument("--qscore", default="none",
                   help="learned-quality weight JSON (tools/qscore.py) "
                        "applied as conf_scale rescoring")
    p.add_argument("--synthf", nargs="?", const="v1", default=None,
                   choices=["v1", "v2"],
                   help="inject hole-implied furniture candidates: "
                        "bare flag / 'v1' = interior unvisited components "
                        "of the walk raster become extra LOW/MID "
                        "candidates (ops/refine.synthesize_furniture); "
                        "'v2' adds boundary-notch and tall-BLOCK "
                        "hypotheses (synthesize_furniture_v2)")
    p.add_argument("--ycal", default="none",
                   help="seen-room Y-plane calibration: a colliders.json "
                        "path (the room the model trained on) or "
                        "'floor,ceil' in metres; snaps tall BLOCK "
                        "predictions to those planes "
                        "(ops/refine.snap_y_planes)")
    p.add_argument("--refine_furniture", action="store_true")
    p.add_argument("--bootstrap", type=int, default=2000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--device", choices=["cpu", "default"], default="cpu")
    p.add_argument("--tta", action="store_true",
                   help="4-way rotation test-time augmentation: pool the "
                        "un-rotated candidates of all four 90-degree "
                        "forwards before the operating point is applied")
    p.add_argument("--tta_reflect", action="store_true",
                   help="also pool the x-mirrored copy of every TTA view "
                        "(8-view dihedral pooling with --tta)")
    p.add_argument("--tta_scales", default="",
                   help="comma list of extra uniform scales to forward "
                        "every TTA view at (boxes exactly unscaled)")
    p.add_argument("--tta_windows", type=int, default=0,
                   help=">= 2: pool that many overlapping full-resolution "
                        "temporal windows of each capture (restores "
                        "detail long captures lose to decimation)")
    p.add_argument("--output", default=None)
    args = p.parse_args()

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    dirs = [d for d in args.dirs.split(",") if d]
    missing = [d for d in dirs if not Path(d).is_dir()]
    if missing:
        raise SystemExit(f"capture directories not found: {missing}")

    tta_scales = tuple(float(x) for x in args.tta_scales.split(",") if x)
    if args.calib_dir:
        cell = choose_cell(args.checkpoint, args.calib_dir, args.select,
                           args.batch_size, args.refine_furniture,
                           tta=args.tta, tta_reflect=args.tta_reflect,
                           tta_scales=tta_scales)
        cell["calibrated_on"] = args.calib_dir
        cell.setdefault("fuse", args.fuse)
        if args.ttopt:
            cell["ttopt"] = (json.loads(args.ttopt_params)
                             if args.ttopt_params else True)
        # post-process dimensions outside choose_cell's sweep grid merge
        # into the calibrated cell exactly like fuse/ttopt/ycal — a
        # requested flag must never be silently dropped
        if args.soft != "none":
            cell["soft"] = float(args.soft)
        if args.support != "none":
            cell["support"] = float(args.support)
        if args.pen_beta != "none":
            cell["pen_beta"] = float(args.pen_beta)
        if args.synthf:
            cell["synthf"] = args.synthf
        if args.qscore != "none":
            cell["qscore"] = args.qscore
        if args.qscore_auto != "none":
            cell["qscore_auto"] = float(args.qscore_auto)
        print(f"operating point from {args.calib_dir}: {cell}")
    else:
        cell = {"threshold": args.threshold, "nms": args.nms,
                "refine": None if args.refine == "none"
                else float(args.refine),
                "trust": args.trust,
                "synth": args.synth,
                "extent": None if args.extent == "none"
                else float(args.extent),
                "consensus": args.consensus,
                "top_k": args.top_k,
                "fuse": args.fuse,
                "ttopt": ((json.loads(args.ttopt_params)
                           if args.ttopt_params else True)
                          if args.ttopt else False),
                "support": None if args.support == "none"
                else float(args.support),
                "pen_beta": None if args.pen_beta == "none"
                else float(args.pen_beta),
                "soft": None if args.soft == "none"
                else float(args.soft),
                "synthf": args.synthf or False,
                "qscore": None if args.qscore == "none" else args.qscore,
                "qscore_auto": None if args.qscore_auto == "none"
                else float(args.qscore_auto)}
    if args.ycal != "none":
        if "," in args.ycal and not Path(args.ycal).exists():
            cell["ycal"] = [float(x) for x in args.ycal.split(",")]
        else:
            from room_slam_tpu.ops.refine import y_planes_from_colliders
            cell["ycal"] = list(y_planes_from_colliders(args.ycal))
    cell["tta"] = args.tta
    cell["tta_reflect"] = args.tta_reflect
    if tta_scales:
        cell["tta_scales"] = list(tta_scales)
    if args.tta_windows:
        cell["tta_windows"] = args.tta_windows

    report = run(args.checkpoint, dirs, cell, args.bootstrap,
                 args.refine_furniture, args.batch_size, tta=args.tta,
                 tta_reflect=args.tta_reflect, tta_scales=tta_scales,
                 tta_windows=args.tta_windows)
    agg = report["aggregate"]
    print(f"\n=== {len(report['captures'])} captures, "
          f"{agg['num_gt']} GT boxes, {agg['num_predictions']} predictions")
    for row in report["captures"]:
        print(f"  {row['name']:48s} tp@0.25={row['tp@0.25']:2d}"
              f"/{row['num_gt']:2d}  det_f1@0.25={row['det_f1@0.25']:.3f}"
              f"  mAP@0.25={row['mAP@0.25']:.3f}")
    for t in IOU_THRESHOLDS:
        print(f"aggregate @IoU{t}: mAP={agg[f'mAP@{t}']:.4f} "
              f"det_f1={agg[f'det_f1@{t}']:.4f} "
              f"P={agg[f'det_precision@{t}']:.3f} "
              f"R={agg[f'det_recall@{t}']:.3f} tp={agg[f'tp@{t}']}")
    for d, m in report["per_dir"].items():
        print(f"room[{d}] @IoU0.25: mAP={m['mAP@0.25']:.4f} "
              f"det_f1={m['det_f1@0.25']:.4f} tp={m['tp@0.25']}"
              f"/{m['num_gt']}")
    if "bootstrap" in report:
        for k in ("mAP@0.25", "det_f1@0.25"):
            b = report["bootstrap"][k]
            print(f"bootstrap {k}: median={b['median']:.4f} "
                  f"95% CI [{b['lo']:.4f}, {b['hi']:.4f}]")
    if args.output:
        with open(args.output, "w") as f:
            json.dump(report, f, indent=2, default=float)
        print(f"\nwrote {args.output}")


if __name__ == "__main__":
    main()
