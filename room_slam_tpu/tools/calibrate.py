"""Detection-calibration sweep: confidence threshold x NMS IoU x wall-refine.

The matcher-based metrics (F1, mIoU) see more quality than ranked mAP does —
the gap is calibration: which confidence cut, NMS IoU, and refinement setting
turn the model's raw (boxes, logits) into the best ranked detections. The
reference hardcodes threshold=0.7/nms=0.3 (src/benchmark/inference.py:133-134)
and never sweeps; this tool forwards the val set ONCE and then scores every
grid cell from the cached outputs, so a 48-cell sweep costs one model pass.

    python -m room_slam_tpu.tools.calibrate --checkpoint /tmp/ckpt/best_model \
        --data_dir /tmp/val --thresholds 0.3,0.5,0.7 --nms 0.1,0.3,0.5 \
        --refine none,0.3,0.55

Runs on CPU by default (per-cell post-processing is many small dispatches —
hostile to the axon tunnel's per-dispatch latency; the model forward at val
scale is cheap on host).
"""

from __future__ import annotations

import argparse
import functools
import itertools
import json
from pathlib import Path

import numpy as np


def window_fractions(n_windows: int, overlap: float = 0.1) -> list:
    """``n_windows`` overlapping (start, end) fractions covering [0, 1]."""
    if n_windows < 2:
        return []
    width = (1.0 + overlap * (n_windows - 1)) / n_windows
    step = (1.0 - width) / (n_windows - 1)
    return [(i * step, i * step + width) for i in range(n_windows)]


def _forward_val_set(checkpoint: str, data_dir: str, batch_size: int,
                     tta: bool = False, tta_reflect: bool = False,
                     tta_scales: tuple = (), tta_windows: int = 0):
    """One jitted forward over the whole val set; returns host arrays.

    ``tta``: forward each capture at all four 90-degree Y rotations and
    pool the un-rotated candidates along the query axis — cached arrays
    become [N, 4*Q, ...] and every downstream operating point (NMS,
    top-K, refine) sees the pooled candidate set (rotation test-time
    augmentation, same semantics as predictor.build_predictor).
    ``tta_reflect`` adds the x-mirrored copy of every view (the other
    half of the dihedral group D4): 8 views with ``tta``, 2 without.
    ``tta_scales`` (e.g. ``(0.9, 1.1)``) additionally forwards every view
    at those uniform scales (positions scaled, boxes exactly unscaled) —
    the test-time twin of the training scale augmentation.
    ``tta_windows`` (>= 2): additionally forward that many overlapping
    temporal windows of each capture, each RE-DOWNSAMPLED FROM THE
    FULL-RESOLUTION trace file. A real capture can be 3k-41k points
    decimated to max_trace_len, so unlike the geometric views a window
    is not a resampling of the same information — it restores up to
    ``n_windows``x temporal resolution over its span. Window candidates
    pool along the query axis like every other view (same frame: no
    geometric inverse needed); the cached ``raw`` stays the full-trace
    view so refine/extent post-passes see the whole walk.

    ``checkpoint`` may be a comma-separated list: candidates from every
    checkpoint pool along the same query axis (seed ensembling — the
    NMS/top-K/consensus machinery merges agreeing detections exactly as
    it merges TTA rotations). All checkpoints must share a data config."""
    ckpts = [c for c in str(checkpoint).split(",") if c]
    if len(ckpts) > 1:
        parts = [_forward_val_set(c, data_dir, batch_size, tta, tta_reflect,
                                  tta_scales, tta_windows)
                 for c in ckpts]
        out = dict(parts[0])
        for k in ("pred_boxes", "pred_logits", "pred_objectness"):
            if all(k in p for p in parts):
                out[k] = np.concatenate([p[k] for p in parts], axis=1)
            else:
                # mixed heads (some checkpoints without objectness) can't
                # share one confidence formula — fall back to softmax-only
                out.pop(k, None)
        return out

    import jax
    import jax.numpy as jnp

    from room_slam_tpu.data.augment import (reflect_raw, rotate_raw,
                                            scale_raw, unreflect_boxes,
                                            unrotate_boxes, unscale_boxes)
    from room_slam_tpu.data.dataset import TraceColliderArrays
    from room_slam_tpu.data.features import featurize
    from room_slam_tpu.train.driver import load_model_for_inference
    from room_slam_tpu.train.loop import make_forward

    model, params, cfg = load_model_for_inference(checkpoint)
    ds = TraceColliderArrays(data_dir, cfg.data, augment=False, verbose=False)
    fwd = make_forward(model)

    # full-resolution temporal windows as extra input variants
    variants = [ds]
    if tta_windows >= 2:
        import copy

        from room_slam_tpu.data import formats

        L = cfg.data.max_trace_len
        pairs = formats.find_data_pairs(Path(data_dir))
        fulls = [formats.sort_by_time(formats.load_trace_json(t))
                 for t, _ in pairs]
        for f0, f1 in window_fractions(tta_windows):
            ds_w = copy.copy(ds)
            ds_w.raw = np.zeros_like(ds.raw)
            ds_w.length = np.zeros_like(ds.length)
            for i, arr in enumerate(fulls):
                lo = int(f0 * arr.shape[0])
                hi = max(int(f1 * arr.shape[0]), lo + 1)
                win = formats.linspace_downsample(arr[lo:hi], L)
                ds_w.raw[i, : win.shape[0]] = win
                ds_w.length[i] = max(win.shape[0], 1)
            variants.append(ds_w)

    geom_views = [(k, m, s) for s in (1.0, *tta_scales)
                  for m in ((0, 1) if tta_reflect else (0,))
                  for k in (range(4) if tta else (0,))]

    rows = {k: [] for k in ("pred_boxes", "pred_logits", "raw", "length",
                            "gt_boxes", "gt_labels", "gt_valid")}
    names: list = []
    batch_iters = [v.epoch_batches(batch_size, shuffle=False)
                   for v in variants]
    for batches in zip(*batch_iters):
        boxes_k, logits_k, obj_k = [], [], []
        for batch_v in batches:
            db = {k: jnp.asarray(v) for k, v in batch_v.items()}
            for k, m, s in geom_views:
                raw_k = scale_raw(db["raw"], s) if s != 1.0 else db["raw"]
                raw_k = reflect_raw(raw_k) if m else raw_k
                raw_k = rotate_raw(raw_k, k) if k else raw_k
                feats, mask = featurize(raw_k, db["length"])
                out = fwd(params, feats, mask)
                b = out["pred_boxes"]
                if k:
                    b = unrotate_boxes(b, jnp.full(b.shape[0], k))
                if m:
                    b = unreflect_boxes(b)
                if s != 1.0:
                    b = unscale_boxes(b, s)
                boxes_k.append(np.asarray(b))
                logits_k.append(np.asarray(out["pred_classes"]))
                if "pred_objectness" in out:
                    obj_k.append(np.asarray(out["pred_objectness"]))
        batch = batches[0]  # full-trace variant: raw/length/gt/weights
        keepers = np.where(batch["weight"] != 0)[0]
        rows["pred_boxes"].append(
            np.concatenate(boxes_k, axis=1)[keepers])
        rows["pred_logits"].append(
            np.concatenate(logits_k, axis=1)[keepers])
        if obj_k:
            rows.setdefault("pred_objectness", []).append(
                np.concatenate(obj_k, axis=1)[keepers])
        for k in ("raw", "length"):
            rows[k].append(batch[k][keepers])
        rows["gt_boxes"].append(batch["boxes"][keepers])
        rows["gt_labels"].append(batch["labels"][keepers])
        rows["gt_valid"].append(batch["valid"][keepers])
    # shuffle=False + augment=False: expanded order == base order
    names.extend(ds.names)
    out = {k: np.concatenate(v) for k, v in rows.items()}
    out["names"] = names[: out["pred_boxes"].shape[0]]
    return out


def sweep(cached: dict, thresholds, nms_vals, refine_vals,
          extent_vals=(None,), consensus_vals=(False,), top_k_vals=(None,),
          iou_thresholds=(0.5, 0.25), refine_furniture: bool = False,
          trust_vals=(0.4,), synth_vals=(False,),
          fuse_vals=(False,), ttopt_vals=(False,),
          ttopt_params=None, support_vals=(None,),
          pen_vals=(None,), soft_vals=(None,),
          synthf_vals=(False,), qscore_vals=(None,)) -> list:
    """Score every (threshold, nms, refine, trust, synth, ttopt, extent,
    consensus, top_k, fuse, support, pen_beta) cell from cached forwards.

    ``trust_vals`` sweeps refine_walls' max snap distance — under domain
    shift wall predictions drift well past the in-domain 0.4 m default
    (measured 0.6-0.97 m on the real val capture), so the window itself is
    an operating-point choice. ``synth_vals`` sweeps extent-implied wall
    candidate injection (ops/refine.synthesize_walls). ``fuse_vals``
    sweeps weighted box fusion (ops/nms.nms_3d_fused) — each kept box
    becomes its NMS cluster's score-weighted mean. ``ttopt_vals`` sweeps
    test-time trace-consistency adaptation (ops/ttopt.adapt_boxes),
    applied to the candidate boxes after refine/synth and before the
    extent mask / NMS. ``support_vals`` sweeps support-ordered NMS (vote
    IoU threshold; ops/nms.post_process) and ``pen_vals`` physics
    rescoring strength (ops/ttopt.penetration_depth) — both rerank
    candidates BEFORE the greedy NMS sweep. ``soft_vals`` sweeps soft-NMS
    Gaussian sigma (ops/nms.soft_nms_3d_fused): loose overlaps decay
    instead of dying, and the cell's ``nms`` value becomes the
    tight-duplicate fusion threshold. ``synthf_vals`` sweeps
    hole-implied furniture candidate injection
    (ops/refine.synthesize_furniture). ``qscore_vals`` sweeps learned
    per-candidate quality rescoring (weight-JSON paths from
    tools/qscore.py; composes multiplicatively with pen_beta via the
    same conf_scale hook)."""
    import jax
    import jax.numpy as jnp

    from room_slam_tpu.ops.nms import post_process
    from room_slam_tpu.ops.refine import (outside_extent_mask, refine_walls,
                                          synthesize_furniture,
                                          synthesize_walls)
    from room_slam_tpu.ops.ttopt import (TTOptParams, adapt_boxes,
                                         penetration_depth)
    from room_slam_tpu.train.metrics import average_precision_3d

    if ttopt_params is None:
        ttopt_params = TTOptParams()

    pred_labels_all = np.argmax(cached["pred_logits"], -1)

    @jax.jit
    def _refine_all(boxes, labels, raw, length, clearance, trust):
        return jax.vmap(
            lambda b, l, r, n: refine_walls(
                b, l, r, n, clearance=clearance, trust=trust,
                furniture_aware=refine_furniture)
        )(boxes, labels, raw, length)

    obj_all = cached.get("pred_objectness")  # [B, Q] or None

    @jax.jit
    def _synth_all(boxes, logits, obj, raw, length, clearance):
        return jax.vmap(
            lambda b, lg, o, r, n: synthesize_walls(
                b, lg, o, r, n, clearance=clearance,
                furniture_aware=refine_furniture)
        )(boxes, logits, obj, raw, length)

    @functools.partial(jax.jit, static_argnames=("consensus", "top_k",
                                                 "has_obj", "fuse",
                                                 "support", "soft_sigma"))
    def _post_all(boxes, logits, obj, thr, nms_thr, consensus=False,
                  top_k=None, cand=None, has_obj=True, fuse=False,
                  support=None, conf_scale=None, soft_sigma=None):
        if not has_obj:
            return jax.vmap(lambda b, lg, cm, cs: post_process(
                b, lg, confidence_threshold=thr, nms_threshold=nms_thr,
                consensus=consensus, top_k=top_k, candidate_mask=cm,
                fuse=fuse, return_boxes=True, support=support,
                conf_scale=cs, soft_sigma=soft_sigma)
            )(boxes, logits, cand, conf_scale)
        return jax.vmap(lambda b, lg, o, cm, cs: post_process(
            b, lg, confidence_threshold=thr, nms_threshold=nms_thr,
            consensus=consensus, top_k=top_k, objectness=o,
            candidate_mask=cm, fuse=fuse, return_boxes=True,
            support=support, conf_scale=cs, soft_sigma=soft_sigma)
        )(boxes, logits, obj, cand, conf_scale)

    from room_slam_tpu.ops.refine import synthesize_furniture_v2

    @functools.partial(jax.jit, static_argnames=("mode",))
    def _synthf_all(boxes, logits, obj, raw, length, mode="v1"):
        fn = synthesize_furniture_v2 if mode == "v2" else synthesize_furniture
        return jax.vmap(
            lambda b, lg, o, r, n: fn(b, lg, o, r, n)
        )(boxes, logits, obj, raw, length)

    @functools.partial(jax.jit, static_argnames=("mode",))
    def _synthf_all_noobj(boxes, logits, raw, length, mode="v1"):
        fn = synthesize_furniture_v2 if mode == "v2" else synthesize_furniture
        return jax.vmap(
            lambda b, lg, r, n: fn(b, lg, None, r, n)
        )(boxes, logits, raw, length)

    @jax.jit
    def _pen_depth_all(boxes, raw, length):
        return jax.vmap(penetration_depth)(boxes, raw, length)

    @jax.jit
    def _ttopt_all(boxes, raw, length):
        return jax.vmap(
            lambda b, r, n: adapt_boxes(b, r, n, ttopt_params)
        )(boxes, raw, length)

    # (refine, trust, synth, ttopt) -> (boxes, logits, objectness,
    # base_valid)
    variants = {}
    for rf in refine_vals:
        for tr in (trust_vals if rf is not None else (trust_vals[0],)):
            if rf is None:
                boxes = cached["pred_boxes"]
            else:
                boxes = np.asarray(_refine_all(
                    jnp.asarray(cached["pred_boxes"]),
                    jnp.asarray(pred_labels_all),
                    jnp.asarray(cached["raw"]),
                    jnp.asarray(cached["length"]),
                    jnp.float32(rf), jnp.float32(tr)))
            for sy in synth_vals:
                if not sy:
                    sb, sl, so, sv = (boxes, cached["pred_logits"], obj_all,
                                      np.ones(boxes.shape[:2], dtype=bool))
                else:
                    obj_in = (jnp.zeros(boxes.shape[:2]) if obj_all is None
                              else jnp.asarray(obj_all))
                    sb, sl, so, sv = (np.asarray(a) for a in _synth_all(
                        jnp.asarray(boxes),
                        jnp.asarray(cached["pred_logits"]),
                        obj_in, jnp.asarray(cached["raw"]),
                        jnp.asarray(cached["length"]),
                        jnp.float32(rf if rf is not None else 0.3)))
                    if obj_all is None:
                        so = None
                for sf in synthf_vals:
                    if not sf:
                        fb, fl, fo, fv = sb, sl, so, sv
                    else:
                        Qb = sb.shape[1]
                        sf_mode = "v2" if sf == "v2" else "v1"
                        if so is None:
                            fb, fl, _, nv = _synthf_all_noobj(
                                jnp.asarray(sb), jnp.asarray(sl),
                                jnp.asarray(cached["raw"]),
                                jnp.asarray(cached["length"]),
                                mode=sf_mode)
                            fo = None
                        else:
                            fb, fl, fo, nv = _synthf_all(
                                jnp.asarray(sb), jnp.asarray(sl),
                                jnp.asarray(so),
                                jnp.asarray(cached["raw"]),
                                jnp.asarray(cached["length"]),
                                mode=sf_mode)
                            fo = np.asarray(fo)
                        fb, fl, nv = (np.asarray(a) for a in (fb, fl, nv))
                        fv = np.concatenate([sv, nv[:, Qb:]], axis=1)
                    for tt in ttopt_vals:
                        tb = fb
                        if tt:
                            tb = np.asarray(_ttopt_all(
                                jnp.asarray(fb),
                                jnp.asarray(cached["raw"]),
                                jnp.asarray(cached["length"])))
                        variants[rf, tr, sy, sf, tt] = (tb, fl, fo, fv)

    n_img = cached["pred_boxes"].shape[0]
    gt_rows = [(cached["gt_boxes"][i][cached["gt_valid"][i]],
                cached["gt_labels"][i][cached["gt_valid"][i]], i)
               for i in range(n_img)]
    gt_boxes = np.concatenate([r[0] for r in gt_rows])
    gt_labels = np.concatenate([r[1] for r in gt_rows])
    gt_imgs = np.concatenate([np.full(len(r[0]), r[2]) for r in gt_rows])

    @jax.jit
    def _outside_all(boxes, raw, length, slack):
        return jax.vmap(
            lambda b, r, n: outside_extent_mask(b, r, n, slack=slack)
        )(boxes, raw, length)

    # penetration depths depend only on the variant's boxes, not the cell
    pen_cache = {}
    qs_params = {}
    qs_cache = {}

    def _qscale_all(path, vkey, boxes, logits, obj):
        if (path, vkey) not in qs_cache:
            from room_slam_tpu.ops.qscore import load_params, quality_scale

            if path not in qs_params:
                qs_params[path] = load_params(path)
            qp = qs_params[path]
            if obj is None:
                fn = jax.jit(jax.vmap(
                    lambda b, lg, r, n: quality_scale(qp, b, lg, None,
                                                      r, n)))
                qs_cache[path, vkey] = fn(
                    jnp.asarray(boxes), jnp.asarray(logits),
                    jnp.asarray(cached["raw"]),
                    jnp.asarray(cached["length"]))
            else:
                fn = jax.jit(jax.vmap(
                    lambda b, lg, o, r, n: quality_scale(qp, b, lg, o,
                                                         r, n)))
                qs_cache[path, vkey] = fn(
                    jnp.asarray(boxes), jnp.asarray(logits),
                    jnp.asarray(obj), jnp.asarray(cached["raw"]),
                    jnp.asarray(cached["length"]))
        return qs_cache[path, vkey]

    results = []
    for (rf, tr, sy, sf, tt), thr, nm, ext, cns, tk, fu, sp, pb, so, qs \
            in itertools.product(
                variants, thresholds, nms_vals, extent_vals,
                consensus_vals, top_k_vals, fuse_vals, support_vals,
                pen_vals, soft_vals, qscore_vals):
        boxes, logits, obj, base_valid = variants[rf, tr, sy, sf, tt]
        if ext is None:
            cand = jnp.asarray(base_valid)
        else:
            # extent suppression runs BEFORE NMS/top_k: an implausible box
            # must not suppress a real one or consume a top-K slot
            cand = jnp.asarray(base_valid) & ~_outside_all(
                jnp.asarray(boxes), jnp.asarray(cached["raw"]),
                jnp.asarray(cached["length"]), jnp.float32(ext))
        vkey = (rf, tr, sy, sf, tt)
        if pb is None:
            cs = jnp.ones(boxes.shape[:2], dtype=jnp.float32)
        else:
            if vkey not in pen_cache:
                pen_cache[vkey] = _pen_depth_all(
                    jnp.asarray(boxes), jnp.asarray(cached["raw"]),
                    jnp.asarray(cached["length"]))
            cs = jnp.exp(-jnp.float32(pb) * pen_cache[vkey])
        if qs is not None:
            cs = cs * _qscale_all(qs, vkey, boxes, logits, obj)
        keep, labels, conf, boxes = (np.asarray(a) for a in _post_all(
            jnp.asarray(boxes), jnp.asarray(logits),
            None if obj is None else jnp.asarray(obj),
            jnp.float32(thr), jnp.float32(nm), consensus=cns, top_k=tk,
            cand=cand, has_obj=obj is not None, fuse=fu, support=sp,
            conf_scale=cs, soft_sigma=so))
        img_ids, flat = np.nonzero(keep)
        cell = {"threshold": thr, "nms": nm, "refine": rf, "trust": tr,
                "synth": sy, "synthf": sf, "ttopt": tt, "extent": ext,
                "consensus": cns, "top_k": tk, "fuse": fu, "support": sp,
                "pen_beta": pb, "soft": so, "qscore": qs,
                "num_predictions": int(keep.sum())}
        for it in iou_thresholds:
            if keep.any():
                mAP, aps = average_precision_3d(
                    boxes[img_ids, flat], labels[img_ids, flat],
                    conf[img_ids, flat], img_ids,
                    gt_boxes, gt_labels, gt_imgs, iou_thresh=it)
                from room_slam_tpu.train.metrics import detection_prf

                _, _, df1, dtp = detection_prf(
                    boxes[img_ids, flat], labels[img_ids, flat],
                    conf[img_ids, flat], img_ids,
                    gt_boxes, gt_labels, gt_imgs, iou_thresh=it)
            else:
                mAP, aps, df1, dtp = 0.0, {}, 0.0, 0
            cell[f"mAP@{it}"] = round(float(mAP), 4)
            cell[f"AP_per_class@{it}"] = {int(k): round(float(v), 3)
                                          for k, v in aps.items()}
            cell[f"det_f1@{it}"] = round(float(df1), 4)
            cell[f"tp@{it}"] = int(dtp)
        results.append(cell)
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True,
                   help="checkpoint stem, or comma-separated stems to "
                        "pool as a seed ensemble")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--thresholds", default="0.3,0.5,0.7")
    p.add_argument("--nms", default="0.1,0.3,0.5")
    p.add_argument("--refine", default="none,0.3,0.55",
                   help="comma list of wall-refine clearances; 'none' = off")
    p.add_argument("--trust", default="0.4",
                   help="comma list of wall-refine max snap distances (m); "
                        "only meaningful with --refine")
    p.add_argument("--synth", default="off",
                   help="'off', 'on', or 'off,on' (alias 'both'): sweep "
                        "extent-implied wall candidate injection "
                        "(ops/refine.synthesize_walls)")
    p.add_argument("--extent", default="none",
                   help="comma list of extent-suppression slacks (m); "
                        "'none' = off")
    p.add_argument("--consensus", default="off",
                   help="'off', 'on', 'off,on' (alias 'both') to sweep "
                        "cluster-size consensus rescoring")
    p.add_argument("--top_k", default="none",
                   help="comma list of rank cutoffs (keep K best after "
                        "NMS); 'none' = absolute threshold only")
    p.add_argument("--fuse", default="off",
                   help="'off', 'on', or 'off,on' (alias 'both'): sweep "
                        "weighted box fusion — kept boxes become their "
                        "NMS cluster's score-weighted mean "
                        "(ops/nms.nms_3d_fused)")
    p.add_argument("--ttopt", default="off",
                   help="'off', 'on', or 'off,on' (alias 'both'): sweep "
                        "test-time trace-consistency adaptation — "
                        "per-capture differentiable refinement of the "
                        "candidate boxes against non-penetration / "
                        "envelope physics (ops/ttopt.py)")
    p.add_argument("--ttopt_params", default=None,
                   help="JSON dict of TTOptParams overrides for the "
                        "ttopt=on cells (e.g. '{\"steps\": 300, "
                        "\"w_env\": 0.5}') — lets the adaptation "
                        "hyperparameters themselves be chosen on "
                        "calibration splits")
    p.add_argument("--support", default="none",
                   help="comma list of support-ordered-NMS vote IoU "
                        "thresholds (e.g. 'none,0.25'): candidates are "
                        "reranked by same-class multi-view agreement "
                        "BEFORE the greedy sweep (ops/nms.post_process)")
    p.add_argument("--pen_beta", default="none",
                   help="comma list of physics-rescoring strengths (e.g. "
                        "'none,3'): ranking confidence scaled by "
                        "exp(-beta * mean penetration depth) "
                        "(ops/ttopt.penetration_depth)")
    p.add_argument("--soft", default="none",
                   help="comma list of soft-NMS Gaussian sigmas (e.g. "
                        "'none,0.25,0.5'): loose overlaps decay instead "
                        "of dying; the cell's nms value becomes the "
                        "tight-duplicate fusion threshold "
                        "(ops/nms.soft_nms_3d_fused)")
    p.add_argument("--qscore", default="none",
                   help="comma list of learned-quality weight JSONs "
                        "(tools/qscore.py) to sweep as conf_scale "
                        "rescoring ('none' entries = off)")
    p.add_argument("--synthf", default="off",
                   help="comma list of 'off'/'on'(='v1')/'v2', or 'both' "
                        "(off+v1): sweep hole-implied furniture candidate "
                        "injection — interior unvisited components of the "
                        "walk raster become extra LOW/MID candidates "
                        "(ops/refine.synthesize_furniture); 'v2' adds "
                        "boundary-notch + tall-BLOCK hypotheses")
    p.add_argument("--refine_furniture", action="store_true",
                   help="refine cells place wall planes beyond predicted "
                        "furniture lining the envelope (ops/refine.py)")
    p.add_argument("--device", choices=["cpu", "default"], default="cpu")
    p.add_argument("--tta", action="store_true",
                   help="4-way rotation test-time augmentation: every "
                        "cell is scored on the pooled un-rotated "
                        "candidates of all four 90-degree forwards")
    p.add_argument("--tta_reflect", action="store_true",
                   help="also pool the x-mirrored copy of every TTA view "
                        "(8-view dihedral pooling with --tta)")
    p.add_argument("--tta_scales", default="",
                   help="comma list of extra uniform scales (e.g. "
                        "'0.9,1.1') to forward every TTA view at; boxes "
                        "are exactly unscaled before pooling")
    p.add_argument("--tta_windows", type=int, default=0,
                   help=">= 2: also forward that many overlapping "
                        "temporal windows re-downsampled from the "
                        "FULL-RESOLUTION trace files (restores detail "
                        "long captures lose to decimation)")
    p.add_argument("--output", default=None)
    p.add_argument("--eval_dir", default=None,
                   help="honest protocol: choose the best cell on "
                        "--data_dir, then re-score THAT cell on this "
                        "untouched directory (reported numbers are from "
                        "eval_dir only)")
    p.add_argument("--select", default="mAP@0.5",
                   help="metric the sweep ranks cells by")
    args = p.parse_args()

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    thresholds = [float(x) for x in args.thresholds.split(",")]
    nms_vals = [float(x) for x in args.nms.split(",")]
    refine_vals = [None if x == "none" else float(x)
                   for x in args.refine.split(",")]
    trust_vals = [float(x) for x in args.trust.split(",")]
    if args.synth == "both":
        synth_vals = [False, True]
    else:
        synth_vals = [x == "on" for x in args.synth.split(",")]
    extent_vals = [None if x == "none" else float(x)
                   for x in args.extent.split(",")]
    if args.consensus == "both":
        consensus_vals = [False, True]
    else:
        consensus_vals = [x == "on" for x in args.consensus.split(",")]
    top_k_vals = [None if x == "none" else int(x)
                  for x in args.top_k.split(",")]
    if args.fuse == "both":
        fuse_vals = [False, True]
    else:
        fuse_vals = [x == "on" for x in args.fuse.split(",")]
    if args.ttopt == "both":
        ttopt_vals = [False, True]
    else:
        ttopt_vals = [x == "on" for x in args.ttopt.split(",")]
    ttopt_params = None
    if args.ttopt_params:
        from room_slam_tpu.ops.ttopt import TTOptParams

        ttopt_params = TTOptParams(**json.loads(args.ttopt_params))
    support_vals = [None if x == "none" else float(x)
                    for x in args.support.split(",")]
    pen_vals = [None if x == "none" else float(x)
                for x in args.pen_beta.split(",")]
    soft_vals = [None if x == "none" else float(x)
                 for x in args.soft.split(",")]
    if args.synthf == "both":
        synthf_vals = [False, "v1"]
    else:
        _sf_map = {"off": False, "on": "v1", "v1": "v1", "v2": "v2"}
        synthf_vals = [_sf_map[x] for x in args.synthf.split(",")]
    qscore_vals = [None if x == "none" else x
                   for x in args.qscore.split(",")]

    tta_scales = tuple(float(x) for x in args.tta_scales.split(",") if x)
    cached = _forward_val_set(args.checkpoint, args.data_dir,
                              args.batch_size, tta=args.tta,
                              tta_reflect=args.tta_reflect,
                              tta_scales=tta_scales,
                              tta_windows=args.tta_windows)
    results = sweep(cached, thresholds, nms_vals, refine_vals, extent_vals,
                    consensus_vals, top_k_vals,
                    refine_furniture=args.refine_furniture,
                    trust_vals=trust_vals, synth_vals=synth_vals,
                    fuse_vals=fuse_vals, ttopt_vals=ttopt_vals,
                    ttopt_params=ttopt_params, support_vals=support_vals,
                    pen_vals=pen_vals, soft_vals=soft_vals,
                    synthf_vals=synthf_vals, qscore_vals=qscore_vals)
    results.sort(key=lambda c: (-c[args.select], -c["mAP@0.25"]))
    for c in results:
        print(f"thr={c['threshold']:.2f} nms={c['nms']:.2f} "
              f"refine={c['refine']} trust={c['trust']} "
              f"synth={int(c['synth'])} sf={c['synthf'] or 0} "
              f"tt={int(c['ttopt'])} "
              f"extent={c['extent']} "
              f"cns={int(c['consensus'])} k={c['top_k']} "
              f"fuse={int(c['fuse'])} "
              f"sup={c['support']} pen={c['pen_beta']} "
              f"soft={c['soft']} q={int(c['qscore'] is not None)} "
              f"preds={c['num_predictions']:4d} "
              f"mAP@0.5={c['mAP@0.5']:.4f} mAP@0.25={c['mAP@0.25']:.4f}")
    best = results[0]
    print("\nbest:", json.dumps(best, default=float))
    if args.eval_dir:
        # honest protocol: the chosen cell's numbers come from a directory
        # the sweep never saw (max-over-cells on the reported set is
        # selection bias)
        eval_cached = _forward_val_set(args.checkpoint, args.eval_dir,
                                       args.batch_size, tta=args.tta,
                                       tta_reflect=args.tta_reflect,
                                       tta_scales=tta_scales,
                                       tta_windows=args.tta_windows)
        held_out = sweep(eval_cached, [best["threshold"]], [best["nms"]],
                         [best["refine"]], [best["extent"]],
                         [best["consensus"]], [best.get("top_k")],
                         refine_furniture=args.refine_furniture,
                         trust_vals=[best.get("trust", 0.4)],
                         synth_vals=[best.get("synth", False)],
                         fuse_vals=[best.get("fuse", False)],
                         ttopt_vals=[best.get("ttopt", False)],
                         ttopt_params=ttopt_params,
                         support_vals=[best.get("support")],
                         pen_vals=[best.get("pen_beta")],
                         soft_vals=[best.get("soft")],
                         synthf_vals=[best.get("synthf", False)],
                         qscore_vals=[best.get("qscore")])[0]
        held_out["calibrated_on"] = args.data_dir
        held_out["scored_on"] = args.eval_dir
        if args.ttopt_params:
            held_out["ttopt_params"] = json.loads(args.ttopt_params)
        print("held-out:", json.dumps(held_out, default=float))
        best = held_out
    if args.output:
        with open(args.output, "w") as f:
            json.dump({"best": best, "sweep": results} if args.eval_dir
                      else results, f, indent=2, default=float)


if __name__ == "__main__":
    main()
