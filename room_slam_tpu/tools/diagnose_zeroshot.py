"""Per-GT zero-shot failure decomposition: WHICH boxes fail, and WHY.

The FINAL direction-B benchmark (FINAL.md) measures zero-shot quality on
77 GT boxes but reports only pooled metrics; the structural ceiling
(tools/ceiling.py) says 95% of those boxes are trace-recoverable. This
tool joins the two: it reruns the scored operating point's deterministic
forward + post-process (tools/realbench.py) on the zero-shot room and, for
every GT box of every capture, reports

- its ceiling class (contacted / plane_inferable / unrecoverable),
- the best IoU any same-class prediction achieves against it, and the
  best any-class IoU (the gap between the two = class confusion),
- for the best same-class candidate: XZ center error and size ratios
  (localization error decomposed into translation vs extent),
- hit flags at IoU 0.25 / 0.5.

Aggregates decompose the miss set by (ceiling class x wall/furniture),
plus a near-miss band (best IoU in [0.10, 0.25): candidates that exist
but are localized too loosely) vs total misses (best IoU < 0.10: the
model has no candidate at all). This separates "detection failure" from
"localization failure" — the reference has no equivalent diagnostic (its
post-process is threshold+NMS only, src/benchmark/inference.py:130-197).

    python -m room_slam_tpu.tools.diagnose_zeroshot \
        --checkpoint .ckpts/final_B_s100/best_model \
        --zero_shot_dir /root/reference/dataset/train \
        --threshold 0 --nms 0.1 --extent 1.0 --fuse --tta \
        --output results/r4_B_zeroshot_diagnosis.json

Diagnostic only: it re-applies an ALREADY-SCORED cell (deterministic
forwards); it performs no selection and reports no headline metric.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def _center_size_errors(pred: np.ndarray, gt: np.ndarray) -> dict:
    """XZ translation and per-axis size ratio of one candidate box."""
    return {
        "center_err_xz_m": round(float(np.hypot(pred[0] - gt[0],
                                                pred[2] - gt[2])), 3),
        "center_err_y_m": round(float(abs(pred[1] - gt[1])), 3),
        "size_ratio": [round(float(pred[3 + a] / max(gt[3 + a], 1e-6)), 3)
                       for a in range(3)],
    }


def diagnose(checkpoint: str, zero_shot_dir: str, cell: dict,
             tta: bool = False, tta_reflect: bool = False,
             contact_r: float = 0.5, wall_r: float = 1.0,
             batch_size: int = 8) -> dict:
    import jax.numpy as jnp

    from room_slam_tpu.data import formats
    from room_slam_tpu.ops.iou import pairwise_iou_3d
    from room_slam_tpu.tools.ceiling import analyze_capture
    from room_slam_tpu.tools.realbench import (apply_operating_point,
                                               forward_captures)

    cached = forward_captures(checkpoint, [zero_shot_dir], batch_size,
                              tta=tta, tta_reflect=tta_reflect)
    dets = apply_operating_point(cached, cell)

    pairs = formats.find_data_pairs(Path(zero_shot_dir))
    report = {"checkpoint": checkpoint, "zero_shot_dir": zero_shot_dir,
              "operating_point": cell, "tta": tta, "captures": []}
    for i, (trace_file, collider_file) in enumerate(pairs):
        trace = formats.sort_by_time(formats.load_trace_json(trace_file))
        gt_boxes, gt_labels = formats.load_colliders_json(collider_file)
        ceil_rows = analyze_capture(trace, gt_boxes, gt_labels,
                                    contact_r, wall_r)
        sel = dets["img"] == i
        pb, pl = dets["boxes"][sel], dets["labels"][sel]
        rows = []
        for g, (gb, gl, cr) in enumerate(zip(gt_boxes, gt_labels,
                                             ceil_rows)):
            row = {"gt_index": g, "label": int(gl),
                   "is_wall": cr["is_wall"], "size": cr["size"],
                   "ceiling": cr["status"]}
            if len(pb):
                iou_all = np.asarray(pairwise_iou_3d(
                    jnp.asarray(pb), jnp.asarray(gb[None, :])))[:, 0]
                row["best_iou_anyclass"] = round(float(iou_all.max()), 3)
                same = pl == gl
                if same.any():
                    j = int(np.argmax(np.where(same, iou_all, -1.0)))
                    row["best_iou"] = round(float(iou_all[j]), 3)
                    row.update(_center_size_errors(pb[j], gb))
                else:
                    row["best_iou"] = 0.0
            else:
                row["best_iou"] = 0.0
                row["best_iou_anyclass"] = 0.0
            row["hit@0.25"] = row["best_iou"] >= 0.25
            row["hit@0.5"] = row["best_iou"] >= 0.5
            rows.append(row)
        report["captures"].append({
            "name": f"{Path(zero_shot_dir).name}/{trace_file.name}",
            "num_predictions": int(sel.sum()), "boxes": rows})

    # ---- aggregates: miss decomposition ----
    allr = [r for c in report["captures"] for r in c["boxes"]]

    def bucket(rows):
        n = len(rows)
        if not n:
            return {"n": 0}
        hits = sum(r["hit@0.25"] for r in rows)
        near = sum(0.10 <= r["best_iou"] < 0.25 for r in rows)
        blind = sum(r["best_iou"] < 0.10 for r in rows)
        confused = sum(r["best_iou"] < 0.10 <= r["best_iou_anyclass"]
                       for r in rows)
        return {"n": n, "hit@0.25": hits, "near_miss": near,
                "no_candidate": blind, "class_confusion": confused,
                "hit_rate": round(hits / n, 3)}

    agg = {"all": bucket(allr)}
    for status in ("contacted", "plane_inferable", "unrecoverable"):
        agg[status] = bucket([r for r in allr if r["ceiling"] == status])
    agg["walls"] = bucket([r for r in allr if r["is_wall"]])
    agg["furniture"] = bucket([r for r in allr if not r["is_wall"]])
    for lab in sorted({r["label"] for r in allr}):
        agg[f"label_{lab}"] = bucket([r for r in allr
                                      if r["label"] == lab])
    report["aggregate"] = agg
    return report


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--checkpoint", required=True,
                    help="checkpoint prefix, or comma-list for an ensemble")
    ap.add_argument("--zero_shot_dir",
                    default="/root/reference/dataset/train")
    ap.add_argument("--threshold", type=float, default=0.0)
    ap.add_argument("--nms", type=float, default=0.1)
    ap.add_argument("--extent", type=float, default=1.0)
    ap.add_argument("--top_k", type=int, default=None)
    ap.add_argument("--trust", type=float, default=0.4)
    ap.add_argument("--fuse", action="store_true")
    ap.add_argument("--tta", action="store_true")
    ap.add_argument("--ttopt", action="store_true")
    ap.add_argument("--support", type=float, default=None)
    ap.add_argument("--pen_beta", type=float, default=None)
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    cell = {"threshold": args.threshold, "nms": args.nms,
            "refine": None, "trust": args.trust, "synth": False,
            "extent": args.extent, "consensus": False,
            "top_k": args.top_k, "fuse": args.fuse,
            "ttopt": args.ttopt, "support": args.support,
            "pen_beta": args.pen_beta}
    rep = diagnose(args.checkpoint, args.zero_shot_dir, cell, tta=args.tta)
    print(f"{'capture':48s} hits  near  blind")
    for c in rep["captures"]:
        b = [r for r in c["boxes"]]
        print(f"{c['name']:48s} "
              f"{sum(r['hit@0.25'] for r in b):4d}  "
              f"{sum(0.10 <= r['best_iou'] < 0.25 for r in b):4d}  "
              f"{sum(r['best_iou'] < 0.10 for r in b):4d}")
    print(json.dumps(rep["aggregate"], indent=1))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(rep, f, indent=2, default=float)
        print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
