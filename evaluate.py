#!/usr/bin/env python3
"""Evaluation CLI (ref: README.md:76-79 and src/benchmark/train.py:234-328).

Benchmark surface:
    python evaluate.py --checkpoint checkpoints/best_model \
        --data_dir dataset/val
Legacy surface (GRU checkpoint; rotated-box mAP + baseline comparison):
    python evaluate.py --checkpoint checkpoints/best_model_legacy \
        --data_dir data/sample --compare_baseline --visualize out/
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def evaluate_benchmark(args) -> dict:
    from room_slam_tpu.config import BENCH_ID_TO_LABEL
    from room_slam_tpu.data.dataset import TraceColliderArrays
    from room_slam_tpu.ops.nms import post_process
    from room_slam_tpu.train.driver import load_model_for_inference
    from room_slam_tpu.train.metrics import (average_precision_3d,
                                             make_metrics_step,
                                             summarize_metrics)

    model, params, cfg = load_model_for_inference(args.checkpoint)
    ds = TraceColliderArrays(args.data_dir, cfg.data, augment=False)
    mstep = make_metrics_step(model, iou_thresh=args.iou_thresh)

    from room_slam_tpu.data.features import featurize
    from room_slam_tpu.train.loop import make_forward

    fwd = make_forward(model)

    acc = None
    pred_rows, gt_rows = [], []
    img = 0
    for batch in ds.epoch_batches(args.batch_size, shuffle=False):
        db = {k: jnp.asarray(v) for k, v in batch.items()}
        sums = {k: float(v) for k, v in mstep(params, db).items()}
        acc = sums if acc is None else {k: acc[k] + sums[k] for k in sums}

        feats, mask = featurize(db["raw"], db["length"])
        out = fwd(params, feats, mask)
        for b in range(db["raw"].shape[0]):
            if batch["weight"][b] == 0:
                continue
            pred_b = out["pred_boxes"][b]
            if args.refine is not None:
                from room_slam_tpu.ops.refine import refine_walls

                pred_b = refine_walls(
                    pred_b, jnp.argmax(out["pred_classes"][b], -1),
                    db["raw"][b], db["length"][b],
                    clearance=args.refine,
                    furniture_aware=args.refine_furniture)
            obj = out.get("pred_objectness")
            keep, labels, conf = post_process(
                pred_b, out["pred_classes"][b],
                confidence_threshold=args.threshold,
                nms_threshold=args.nms, consensus=args.consensus,
                objectness=None if obj is None else obj[b])
            if args.extent_slack is not None:
                from room_slam_tpu.ops.refine import outside_extent_mask

                keep = keep & ~outside_extent_mask(
                    pred_b, db["raw"][b], db["length"][b],
                    slack=args.extent_slack)
            keep = np.asarray(keep)
            boxes = np.asarray(pred_b)
            for q in np.where(keep)[0]:
                pred_rows.append((boxes[q], int(labels[q]),
                                  float(conf[q]), img))
            v = batch["valid"][b]
            for m in np.where(v)[0]:
                gt_rows.append((batch["boxes"][b, m],
                                int(batch["labels"][b, m]), img))
            img += 1

    metrics = summarize_metrics(acc)
    if pred_rows and gt_rows:
        mAP, aps = average_precision_3d(
            np.stack([r[0] for r in pred_rows]),
            np.asarray([r[1] for r in pred_rows]),
            np.asarray([r[2] for r in pred_rows]),
            np.asarray([r[3] for r in pred_rows]),
            np.stack([r[0] for r in gt_rows]),
            np.asarray([r[1] for r in gt_rows]),
            np.asarray([r[2] for r in gt_rows]),
            iou_thresh=args.iou_thresh,
        )
        metrics["mAP"] = mAP
        metrics["AP_per_class"] = {
            BENCH_ID_TO_LABEL[c]: round(v, 4) for c, v in aps.items()}
        from room_slam_tpu.train.metrics import detection_prf

        dp, dr, df1, dtp = detection_prf(
            np.stack([r[0] for r in pred_rows]),
            np.asarray([r[1] for r in pred_rows]),
            np.asarray([r[2] for r in pred_rows]),
            np.asarray([r[3] for r in pred_rows]),
            np.stack([r[0] for r in gt_rows]),
            np.asarray([r[1] for r in gt_rows]),
            np.asarray([r[2] for r in gt_rows]),
            iou_thresh=args.iou_thresh,
        )
        metrics["det_precision"] = round(dp, 4)
        metrics["det_recall"] = round(dr, 4)
        metrics["det_f1"] = round(df1, 4)
        metrics["det_tp"] = dtp
    return metrics


def evaluate_legacy(args) -> dict:
    from room_slam_tpu.data.legacy import LegacyArrays
    from room_slam_tpu.models.baseline import OccupancyBaseline
    from room_slam_tpu.models.legacy_gru import RoomSlamGRU
    from room_slam_tpu.train import checkpoint as ckpt_lib
    from room_slam_tpu.train.metrics import average_precision_rotated_2d

    ds = LegacyArrays(args.data_dir)
    model = RoomSlamGRU(hidden_size=args.hidden_size,
                        max_objects=args.max_objects)
    dummy = jnp.zeros((1, ds.traces.shape[1], 2), jnp.float32)
    template = jax.jit(lambda k: model.init(
        {"params": k}, dummy, deterministic=True))(jax.random.key(0))
    params, _, side = ckpt_lib.load_checkpoint(args.checkpoint, template)

    @jax.jit
    def fwd(p, traces):
        return model.apply(p, traces, deterministic=True)

    # Evaluation is per TRACE: a trace's ground truth counts once, the
    # model's predictions from all its windows pool together, and the
    # baseline sees the trace's full movement record (per-window GT
    # duplication would deflate AP for both).
    trace_ids = sorted(set(ds.trace_id.tolist()))

    def collect_model_preds():
        rows = []
        out = fwd(params, jnp.asarray(ds.traces[:, :, 1:3]))
        val = np.asarray(jax.nn.sigmoid(out["validity"][..., 0]))
        prob = np.asarray(jax.nn.softmax(out["classes"], axis=-1))
        conf = val * prob.max(axis=-1)
        labels = prob.argmax(axis=-1)
        boxes = np.asarray(out["pred_boxes"])  # [S, N, 5]
        for i in range(len(ds)):
            tid = int(ds.trace_id[i])
            for s in np.where(conf[i] > args.threshold)[0]:
                rows.append((boxes[i, s], int(labels[i, s]),
                             float(conf[i, s]), tid))
        return rows

    def collect_gt():
        rows = []
        for tid in trace_ids:
            i = int(np.where(ds.trace_id == tid)[0][0])
            for m in np.where(ds.valid[i])[0]:
                rows.append((ds.boxes[i, m], int(ds.labels[i, m]), tid))
        return rows

    def score(pred_rows, gt_rows):
        if not pred_rows or not gt_rows:
            return 0.0, {}
        return average_precision_rotated_2d(
            np.stack([r[0] for r in pred_rows]),
            np.asarray([r[1] for r in pred_rows]),
            np.asarray([r[2] for r in pred_rows]),
            np.asarray([r[3] for r in pred_rows]),
            np.stack([r[0] for r in gt_rows]),
            np.asarray([r[1] for r in gt_rows]),
            np.asarray([r[2] for r in gt_rows]),
            iou_thresh=args.iou_thresh,
        )

    gt_rows = collect_gt()
    mAP, aps = score(collect_model_preds(), gt_rows)
    result = {"mAP": mAP, "AP_per_class": aps,
              "checkpoint_epoch": side.get("epoch")}

    if args.compare_baseline:
        baseline = OccupancyBaseline(max_objects=args.max_objects)
        rows = []
        for tid in trace_ids:
            sel = np.where(ds.trace_id == tid)[0]
            full = np.concatenate([ds.traces[i] for i in sel], axis=0)
            objs = baseline.predict(full)
            for o in objs:
                box = np.asarray(
                    o["position"] + o["size"] + [o["orientation"]],
                    np.float32)
                rows.append((box, o["class_id"], o["confidence"], tid))
        b_mAP, b_aps = score(rows, gt_rows)
        result["baseline_mAP"] = b_mAP
        result["baseline_AP_per_class"] = b_aps

    if args.visualize:
        _visualize_legacy(args.visualize, ds, trace_ids,
                          collect_model_preds(), gt_rows)
    return result


def _visualize_legacy(out_dir, ds, trace_ids, pred_rows, gt_rows):
    """Per-trace PNG overlays: trace, GT objects (red), model predictions
    (blue dashed) — the README's documented --visualize behavior."""
    from pathlib import Path

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    from room_slam_tpu.config import LEGACY_ID_TO_LABEL

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    import numpy as _np

    for tid in trace_ids[:12]:
        sel = _np.where(ds.trace_id == tid)[0]
        full = _np.concatenate([ds.traces[i] for i in sel], axis=0)
        fig, ax = plt.subplots(figsize=(9, 9))
        ax.plot(full[:, 1], full[:, 2], "b-", lw=0.4, alpha=0.6,
                label="trace")
        for b, l, t in gt_rows:
            if t != tid:
                continue
            ax.add_patch(Rectangle(
                (b[0] - b[2] / 2, b[1] - b[3] / 2), b[2], b[3],
                ec="red", fc="red", alpha=0.2))
            ax.text(b[0], b[1], LEGACY_ID_TO_LABEL.get(int(l), "?"),
                    color="red", fontsize=7, ha="center")
        for b, l, c, t in pred_rows:
            if t != tid:
                continue
            ax.add_patch(Rectangle(
                (b[0] - b[2] / 2, b[1] - b[3] / 2), b[2], b[3],
                ec="blue", fc="none", ls="--"))
            ax.text(b[0], b[1],
                    f"{LEGACY_ID_TO_LABEL.get(int(l), '?')}\n{c:.2f}",
                    color="blue", fontsize=6, ha="center")
        ax.set_aspect("equal")
        ax.set_title(f"trace {tid}: GT (red) vs prediction (blue)")
        ax.legend()
        fig.savefig(out / f"eval_trace_{tid}.png", dpi=110,
                    bbox_inches="tight")
        plt.close(fig)
    print(f"saved visualizations to {out}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--data_dir", type=str, default="dataset/val")
    p.add_argument("--surface", choices=["auto", "bench", "legacy"],
                   default="auto")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--iou_thresh", type=float, default=0.5)
    p.add_argument("--threshold", type=float, default=0.5,
                   help="confidence threshold for detection metrics")
    p.add_argument("--nms", type=float, default=0.3)
    p.add_argument("--consensus", action="store_true",
                   help="rescore detections by NMS cluster-size consensus "
                        "(rank-only; see ops/nms.py post_process)")
    p.add_argument("--extent_slack", type=float, default=None,
                   metavar="METERS",
                   help="suppress predictions entirely outside the trace "
                        "extent + this margin (single-room captures; see "
                        "ops/refine.py outside_extent_mask)")
    p.add_argument("--refine", type=float, default=None, metavar="CLEARANCE",
                   help="trace-informed wall refinement before NMS, with "
                        "this walker-clearance prior in meters; off by "
                        "default — calibration selects NO snap for well-"
                        "trained models (PARITY.md round 3). See "
                        "room_slam_tpu/ops/refine.py")
    p.add_argument("--refine_furniture", action="store_true",
                   help="with --refine: where predicted furniture lines a "
                        "side of the visited envelope, place the wall "
                        "plane beyond the furniture's outer face instead "
                        "of the clearance prior")
    p.add_argument("--hidden_size", type=int, default=128)
    p.add_argument("--max_objects", type=int, default=10)
    p.add_argument("--compare_baseline", action="store_true")
    p.add_argument("--visualize", type=str, default=None, metavar="OUT_DIR",
                   help="write per-trace GT-vs-prediction PNGs "
                        "(legacy surface; README.md:76-79)")
    p.add_argument("--output", type=str, default=None)
    args = p.parse_args()

    surface = args.surface
    if surface == "auto":
        surface = "legacy" if "legacy" in args.checkpoint else "bench"
        print(f"[evaluate] auto-detected surface: {surface}")

    metrics = (evaluate_legacy(args) if surface == "legacy"
               else evaluate_benchmark(args))
    print(json.dumps(metrics, indent=2, default=float))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(metrics, f, indent=2, default=float)


if __name__ == "__main__":
    main()
