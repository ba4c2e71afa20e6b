"""Simulated-blindness calibration harness for furniture synthesis.

The zero-shot frontier (FINAL.md round-4 close-out): 30+ of the unseen
room's furniture GT draw NO model candidate at all, so post-hoc
selection is capped — the missing boxes must be SYNTHESIZED
(ops/refine.synthesize_furniture / _v2). But the round-4 in-domain
adoption sweep is structurally blind to that regime: on synthetic
calibration rooms the model ALREADY emits candidates at real-furniture
holes, the dup gate absorbs every injection, and synthesis can only
dilute (PARITY.md "hole-implied furniture synthesis REJECTED").

This harness simulates the zero-shot emission failure on synthetic
rooms where labels are free: every furniture-class candidate row
(LOW/MID, plus non-thin interior BLOCK solids) is BLINDED — its XZ
center moved out of the room and its objectness floored — so the
post-process sees exactly what it sees on an unseen real room: good
walls, no furniture. Synthesis gates (hole/notch bands, hypothesis mix,
verifier weights) are then tuned on how much furniture the injections
RECOVER, never on real captures; the direction-B scoring stays one
pre-registered shot (FINAL.md).

    python3 -m room_slam_tpu.tools.blindcal \
      --checkpoint a/best_model,b/best_model --tta \
      --data_dir .ckpts/splits/ms2_calib --output results/r5_blindcal.json

The reference has no calibration tooling at all (its operating point is
hard-coded: src/benchmark/inference.py:277-289).
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def blind_furniture(cached: dict, thin: float = 0.25,
                    shift: float = 1000.0) -> dict:
    """Return a copy of cached forwards with furniture rows disabled.

    A row is furniture when its argmax class is LOW/MID, or BLOCK with a
    non-thin footprint (min(sx, sz) > ``thin`` — interior solids; thin
    BLOCK rows are walls and stay). Blinding = XZ center shifted out of
    the room only: dup gates and IoU see nothing nearby and the extent
    mask (always on in the sweep grid) removes the rows from the
    candidate set, while confidence/objectness stay UNTOUCHED — in the
    real zero-shot regime the model's furniture rows carry low-but-real
    confidence that synthesis datum/confidence inheritance legitimately
    reads, so flooring it here would starve the injections of rank in a
    way the real failure does not.
    """
    out = dict(cached)
    boxes = np.array(cached["pred_boxes"])            # [N, Q, 6]
    logits = cached["pred_logits"]
    labels = np.argmax(logits, -1)
    furn = ((labels == 1) | (labels == 2)
            | ((labels == 0)
               & (np.minimum(boxes[..., 3], boxes[..., 5]) > thin)))
    boxes[..., 0] = np.where(furn, boxes[..., 0] + shift, boxes[..., 0])
    boxes[..., 2] = np.where(furn, boxes[..., 2] + shift, boxes[..., 2])
    out["pred_boxes"] = boxes
    n = int(furn.sum())
    print(f"blinded {n} furniture rows "
          f"({100 * n / furn.size:.1f}% of candidates)")
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--tta", action="store_true")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--thresholds", default="0,0.05")
    ap.add_argument("--nms", default="0.1,0.5")
    ap.add_argument("--soft", default="none,0.25")
    ap.add_argument("--top_k", default="none,12")
    ap.add_argument("--synthf", default="off,v1,v2")
    ap.add_argument("--qscore", default="none",
                    help="comma list of qscore weight JSONs to sweep")
    ap.add_argument("--no_blind", action="store_true",
                    help="control run: same grid without blinding")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from room_slam_tpu.tools.calibrate import _forward_val_set, sweep

    cached = _forward_val_set(args.checkpoint, args.data_dir,
                              args.batch_size, tta=args.tta)
    if not args.no_blind:
        cached = blind_furniture(cached)

    def flist(s, cast=float):
        return [None if x == "none" else cast(x) for x in s.split(",")]

    _sf = {"off": False, "on": "v1", "v1": "v1", "v2": "v2"}
    cells = sweep(
        cached,
        thresholds=[float(x) for x in args.thresholds.split(",")],
        nms_vals=[float(x) for x in args.nms.split(",")],
        refine_vals=[None],
        extent_vals=[1.0],
        top_k_vals=flist(args.top_k, int),
        fuse_vals=[True],
        soft_vals=flist(args.soft),
        synthf_vals=[_sf[x] for x in args.synthf.split(",")],
        qscore_vals=flist(args.qscore, str),
        iou_thresholds=(0.25, 0.5),
    )
    # furniture recovery = class 1/2 AP + overall TP; with furniture rows
    # blinded, any furniture AP must come from synthesis
    for c in cells:
        aps = c.get("AP_per_class@0.25", {})
        c["furn_AP@0.25"] = round(
            (aps.get(1, 0.0) + aps.get(2, 0.0)) / 2, 4)
    cells.sort(key=lambda c: (-c["furn_AP@0.25"], -c["tp@0.25"]))
    print(f"\n{'synthf':7s} {'thr':5s} {'nms':4s} {'soft':5s} {'topk':5s} "
          f"{'qs':3s} | {'furnAP':7s} {'mAP':6s} {'tp':4s} {'f1':6s} "
          f"{'tp@.5':5s} {'npred':6s}")
    for c in cells:
        print(f"{str(c['synthf'] or 'off'):7s} {c['threshold']:<5g} "
              f"{c['nms']:<4g} {str(c['soft']):5s} {str(c['top_k']):5s} "
              f"{'y' if c['qscore'] else 'n':3s} | "
              f"{c['furn_AP@0.25']:<7.4f} {c['mAP@0.25']:<6.4f} "
              f"{c['tp@0.25']:<4d} {c['det_f1@0.25']:<6.4f} "
              f"{c['tp@0.5']:<5d} {c['num_predictions']:<6d}")
    if args.output:
        with open(args.output, "w") as f:
            json.dump({"checkpoint": args.checkpoint,
                       "data_dir": args.data_dir,
                       "blinded": not args.no_blind,
                       "tta": args.tta,
                       "cells": cells}, f, indent=1)
        print(f"\nwrote {args.output}")


if __name__ == "__main__":
    main()
