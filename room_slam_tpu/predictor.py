"""Reusable single-trace predictor: featurize -> jitted forward+NMS -> dicts.

Shared by the inference CLI (one file, one call) and the live UDP demo
(data/ingest.py ``live``: many calls against a growing trace). The forward,
optional wall refinement, NMS and extent suppression run as ONE jitted
dispatch at the fixed shape [1, max_trace_len, F] (zero-padded + masked), so
every call after the first reuses the compiled program regardless of how
many points have arrived (ref: src/benchmark/inference.py:200-275).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from room_slam_tpu.data import formats
from room_slam_tpu.data.features import process_traces_np
from room_slam_tpu.ops.nms import post_process


def model_input_dim(params, default: int = 11) -> int:
    """Expected encoder input width, read from the checkpoint's input_proj
    kernel — the source of truth even when the saved config disagrees
    (ref: inference.py:242-252 reads encoder.input_proj.in_features)."""
    import jax

    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        if ("input_proj" in keys and keys[-1] == "kernel"
                and getattr(leaf, "ndim", 0) == 2):
            return int(leaf.shape[0])
    return default


def adapt_features(feats: np.ndarray, in_feat: int) -> np.ndarray:
    """Truncate/zero-pad the trailing feature dim to the model's expected
    width, so an odd checkpoint (e.g. trained on raw 4-D [x,y,z,t]) still
    runs (ref: inference.py:242-258)."""
    cur = feats.shape[-1]
    if cur == in_feat:
        return feats
    if cur > in_feat:
        return feats[..., :in_feat]
    pad = np.zeros((*feats.shape[:-1], in_feat - cur), feats.dtype)
    return np.concatenate([feats, pad], axis=-1)


def build_predictor(model, params, max_trace_len: int = 3000,
                    confidence_threshold: float = 0.7,
                    nms_threshold: float = 0.3,
                    refine_clearance: float | None = None,
                    refine_trust: float = 0.4,
                    refine_furniture: bool = False,
                    synth_walls: bool = False,
                    extent_slack: float | None = None,
                    consensus: bool = False,
                    top_k: int | None = None,
                    tta_rotations: bool = False,
                    tta_reflect: bool = False,
                    tta_scales: tuple = (),
                    fuse: bool = False,
                    ttopt: bool = False,
                    ttopt_params: dict | None = None,
                    soft_sigma: float | None = None,
                    synth_furniture: bool | str = False,
                    y_planes: tuple | None = None,
                    qscore: str | None = None,
                    qscore_auto: float | None = None,
                    verbose: bool = True):
    """Return ``predict_array([N, 4] raw trace) -> list[collider dict]``.

    The returned callable owns one jit-compiled program; call it as often
    as desired (the live demo calls it every few seconds on the growing
    trace).

    ``tta_rotations`` enables 4-way rotation test-time augmentation: the
    trace is forwarded at all four 90-degree Y rotations in one batch,
    predictions are rotated back into the capture frame (exact for
    axis-aligned boxes: centers rotate, x/z sizes swap at 90/270), and
    the pooled 4*Q candidates go through ONE refine + NMS + top-K pass.
    Same-object candidates from different rotations merge under NMS (and
    boost the consensus score), averaging out the model's rotation
    variance — a training-free transfer lever for unseen rooms.
    ``tta_reflect`` adds the x-mirrored copy of every view (the other
    half of the dihedral group D4): 8 views with ``tta_rotations``, 2
    without. ``tta_scales`` (e.g. ``(0.9, 1.1)``) forwards every view at
    those extra uniform scales, boxes exactly unscaled before pooling.
    ``fuse`` replaces each kept box with its NMS cluster's score-weighted
    mean (weighted box fusion, ops/nms.nms_3d_fused). ``ttopt`` runs
    test-time trace-consistency adaptation of the candidate boxes against
    the capture's own physics (non-penetration / envelope — ops/ttopt.py)
    before the extent mask and NMS. ``ttopt_params`` overrides
    TTOptParams fields; its ``"auto": tau`` key enables the ADOPTED
    per-capture gate (FINAL.md round-5): ttopt applies only when the
    model's max candidate confidence falls below tau (memorized rooms
    read ~0.9, unseen ~0.08), tau calibrated from the seen room alone —
    identical semantics to realbench.apply_operating_point. ``soft_sigma`` switches the NMS sweep
    to soft-NMS (loose overlaps decay instead of dying; pair
    ``nms_threshold`` ~0.5 — the unseen-room recall recipe, FINAL.md).
    ``synth_furniture`` injects hole-implied furniture candidates
    (ops/refine.synthesize_furniture; pass "v2" for the boundary-notch +
    tall-BLOCK variant, synthesize_furniture_v2). ``qscore`` rescores
    every candidate's confidence by the learned quality model at that
    weight-JSON path (tools/qscore.py, ops/qscore.quality_scale) before
    NMS; ``qscore_auto`` gates the rescoring per capture on the same
    confidence signal and tau rule as the ttopt auto-gate, so memorized
    rooms keep their raw ranking — identical semantics to
    realbench.apply_operating_point."""
    import jax

    from room_slam_tpu.data.augment import unreflect_boxes, unrotate_boxes

    qscore_params = None
    if qscore is not None:
        from room_slam_tpu.ops.qscore import load_params

        qscore_params = load_params(qscore)

    # view v = rotate_k(reflect^m(scale_s(trace))); row 0 is the capture
    # frame
    views = [(k, m, s) for s in (1.0, *tta_scales)
             for m in ((0, 1) if tta_reflect else (0,))
             for k in (range(4) if tta_rotations else (0,))]
    view_ks = jnp.asarray([k for k, _, _ in views])
    view_ms = jnp.asarray([bool(m) for _, m, _ in views])
    view_ss = jnp.asarray([s for _, _, s in views], jnp.float32)

    @jax.jit
    def run(params, traces, mask):
        # traces: [R, L, F] — row r is the trace in view r's frame (R=1
        # when TTA is off). Row 0 is always the capture frame; the
        # trace-informed post-passes below all use it.
        R = traces.shape[0]
        # mask-less fallback for models whose __call__ doesn't take a mask
        # (ref: inference.py:261-265 TypeError fallback); the TypeError
        # surfaces at trace time, so plain try/except works under jit
        try:
            out = model.apply(params, traces, mask, deterministic=True)
        except TypeError:
            out = model.apply(params, traces, deterministic=True)
        boxes_r = out["pred_boxes"]          # [R, Q, 6]
        Q = boxes_r.shape[1]
        # inverse of the view transform: unrotate, unreflect, unscale
        boxes_r = unrotate_boxes(boxes_r, view_ks)
        boxes_r = jnp.where(view_ms[:, None, None],
                            unreflect_boxes(boxes_r), boxes_r)
        boxes_r = boxes_r / view_ss[:, None, None]
        boxes0 = boxes_r.reshape(R * Q, 6)
        out = dict(out)
        out["pred_classes"] = out["pred_classes"].reshape(R * Q, -1)[None]
        if out.get("pred_objectness") is not None:
            out["pred_objectness"] = \
                out["pred_objectness"].reshape(R * Q)[None]
        if refine_clearance is not None and traces.shape[-1] >= 4:
            from room_slam_tpu.ops.refine import refine_walls

            # feature columns 0..3 are (x, y, z, t) — the raw trace
            boxes0 = refine_walls(
                boxes0, jnp.argmax(out["pred_classes"][0], -1),
                traces[0, :, :4], jnp.sum(mask[0].astype(jnp.int32)),
                clearance=refine_clearance, trust=refine_trust,
                furniture_aware=refine_furniture)
        obj = out.get("pred_objectness")
        obj0 = None if obj is None else obj[0]
        logits0 = out["pred_classes"][0]
        # the auto-gate signal reads the RAW pooled model outputs (before
        # synthesis appends rows), matching realbench's cached pred_logits
        sig_logits, sig_obj = logits0, obj0
        cand = None
        if y_planes is not None:
            # seen-room-calibrated floor/ceiling snap for tall BLOCK boxes
            # (ops/refine.snap_y_planes; calibrate with
            # y_planes_from_colliders on the room the model trained on).
            # BEFORE synthesize_walls, matching
            # realbench.apply_operating_point: synthesized walls inherit
            # the snapped heights, so both pipelines score identically.
            from room_slam_tpu.ops.refine import snap_y_planes

            boxes0 = snap_y_planes(
                boxes0, jnp.argmax(logits0, -1),
                jnp.float32(y_planes[0]), jnp.float32(y_planes[1]))
        if synth_walls and traces.shape[-1] >= 4:
            from room_slam_tpu.ops.refine import synthesize_walls

            # extent-implied wall candidates (model predictions untouched;
            # on-plane duplicates NMS away — ops/refine.synthesize_walls)
            boxes0, logits0, obj0, cand = synthesize_walls(
                boxes0, logits0,
                jnp.zeros(boxes0.shape[0]) if obj0 is None else obj0,
                traces[0, :, :4], jnp.sum(mask[0].astype(jnp.int32)),
                clearance=(0.3 if refine_clearance is None
                           else refine_clearance),
                furniture_aware=refine_furniture)
            if obj is None:
                obj0 = None
        if synth_furniture and traces.shape[-1] >= 4:
            # True/'v1' = interior holes; 'v2' adds boundary-notch +
            # tall-BLOCK hypotheses (ops/refine.synthesize_furniture_v2)
            from room_slam_tpu.ops.refine import (synthesize_furniture,
                                                  synthesize_furniture_v2)

            sfn = (synthesize_furniture_v2 if synth_furniture == "v2"
                   else synthesize_furniture)
            Qb = boxes0.shape[0]
            boxes0, logits0, obj0, nv = sfn(
                boxes0, logits0, obj0, traces[0, :, :4],
                jnp.sum(mask[0].astype(jnp.int32)))
            cand = (nv if cand is None
                    else jnp.concatenate([cand, nv[Qb:]]))
        if ttopt and traces.shape[-1] >= 4:
            from room_slam_tpu.ops.ttopt import TTOptParams, adapt_boxes

            tcfg = dict(ttopt_params) if ttopt_params else {}
            tau = tcfg.pop("auto", None)
            adapted = adapt_boxes(
                boxes0, traces[0, :, :4],
                jnp.sum(mask[0].astype(jnp.int32)), TTOptParams(**tcfg))
            if tau is None:
                boxes0 = adapted
            else:
                conf = jnp.max(jax.nn.softmax(sig_logits, -1), -1)
                if sig_obj is not None:
                    conf = conf * jax.nn.sigmoid(sig_obj)
                boxes0 = jnp.where(jnp.max(conf) < jnp.float32(tau),
                                   adapted, boxes0)
        if extent_slack is not None and traces.shape[-1] >= 4:
            from room_slam_tpu.ops.refine import outside_extent_mask

            # BEFORE NMS/top_k (see ops/nms.post_process candidate_mask)
            outside = outside_extent_mask(
                boxes0, traces[0, :, :4],
                jnp.sum(mask[0].astype(jnp.int32)), slack=extent_slack)
            cand = ~outside if cand is None else cand & ~outside
        conf_scale = None
        if qscore_params is not None and traces.shape[-1] >= 4:
            from room_slam_tpu.ops.qscore import quality_scale

            qsc = quality_scale(
                qscore_params, boxes0, logits0, obj0, traces[0, :, :4],
                jnp.sum(mask[0].astype(jnp.int32)))
            if qscore_auto is not None:
                # per-capture gate — same raw-output signal as the ttopt
                # auto-gate above: rerank only when the model is unsure
                conf = jnp.max(jax.nn.softmax(sig_logits, -1), -1)
                if sig_obj is not None:
                    conf = conf * jax.nn.sigmoid(sig_obj)
                qsc = jnp.where(jnp.max(conf) < jnp.float32(qscore_auto),
                                qsc, jnp.ones_like(qsc))
            conf_scale = qsc
        keep, labels, conf, boxes_out = post_process(
            boxes0, logits0,
            confidence_threshold=confidence_threshold,
            nms_threshold=nms_threshold, consensus=consensus, top_k=top_k,
            objectness=obj0, candidate_mask=cand,
            fuse=fuse, return_boxes=True, soft_sigma=soft_sigma,
            conf_scale=conf_scale)
        # ONE stacked output -> ONE device->host fetch. Each np.asarray of
        # a separate device array costs a full tunnel round-trip (~20-40
        # ms); four of them dominated single-trace latency.
        return jnp.concatenate(
            [boxes_out,
             keep[:, None].astype(jnp.float32),
             labels[:, None].astype(jnp.float32),
             conf[:, None].astype(jnp.float32)], axis=-1)

    adapted_once = [False]

    def predict_array(arr: np.ndarray):
        if arr.shape[0] == 0:
            if verbose:
                print("Warning: No traces found in file")
            return []
        if arr.shape[0] > max_trace_len and verbose:
            print(f"Downsampling traces from {arr.shape[0]} to "
                  f"{max_trace_len} points")
        R = len(views)
        rot_cos = [1.0, 0.0, -1.0, 0.0]
        rot_sin = [0.0, 1.0, 0.0, -1.0]
        feats_r, n = [], None
        for k, m, sc in views:
            a = np.asarray(arr, np.float32)
            if k or m or sc != 1.0:
                # same convention as augment.scale_raw / reflect_raw /
                # rotate_sample: scale, mirror, then
                # x' = c x + s z ; z' = -s x + c z
                c, s = rot_cos[k], rot_sin[k]
                a = a.copy()
                a[:, :3] *= sc
                x0 = -a[:, 0] if m else a[:, 0]
                z0 = a[:, 2].copy()
                a[:, 0], a[:, 2] = c * x0 + s * z0, -s * x0 + c * z0
            f = process_traces_np(a, max_len=max_trace_len)  # [n, 11]
            in_feat = model_input_dim(params, default=f.shape[-1])
            if in_feat != f.shape[-1]:
                if verbose and not adapted_once[0]:
                    print(f"Adapting features from {f.shape[-1]} to "
                          f"{in_feat} dims to match the checkpoint")
                    adapted_once[0] = True
                f = adapt_features(f, in_feat)
            feats_r.append(f)
            n = f.shape[0]
        padded = np.zeros((R, max_trace_len, feats_r[0].shape[-1]),
                          np.float32)
        mask = np.zeros((R, max_trace_len), bool)
        for k, f in enumerate(feats_r):
            padded[k, :n] = f
            mask[k, :n] = True

        stacked = np.asarray(run(
            params, jnp.asarray(padded), jnp.asarray(mask)))

        boxes = stacked[:, :6]
        keep = stacked[:, 6] > 0.5
        labels = stacked[:, 7].astype(np.int64)
        conf = stacked[:, 8]
        order = np.argsort(-conf * keep)
        return [
            formats.collider_to_dict(boxes[i], labels[i], conf[i])
            for i in order if keep[i]
        ]

    # expose the compiled serving program + its view layout for
    # tools/export.py (StableHLO export of exactly this dispatch)
    predict_array.run = run
    predict_array.views = views
    return predict_array
