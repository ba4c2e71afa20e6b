"""Quality-parity harness: score checkpoints — ours (msgpack) or the
reference's (.pth, imported via torch_import) — with ONE evaluator on the
same data, so accuracy comparisons are apples-to-apples.

The reference publishes no accuracy numbers (BASELINE.md), so the parity
gate ("mAP within 0.5 points", BASELINE.json) is measured by training the
reference ourselves and comparing here.

    python -m room_slam_tpu.tools.parity \
        --checkpoints ours=/tmp/ours_ckpt/best_model \
                      reference=/tmp/ref_ckpt/best_model.pth \
        --data_dir dataset/val
"""

from __future__ import annotations

import argparse
import json
from typing import Dict

import jax.numpy as jnp
import numpy as np


def score_checkpoint(checkpoint: str, data_dir: str, batch_size: int = 8,
                     iou_thresh: float = 0.5, threshold: float = 0.5,
                     nms: float = 0.3,
                     refine_clearance: float | None = None,
                     extent_slack: float | None = None,
                     consensus: bool = False) -> Dict:
    """Hungarian-aligned metrics + 3D mAP for one checkpoint.

    ``refine_clearance`` enables the trace-informed wall refinement and
    ``extent_slack`` the outside-extent suppression (ops/refine.py) — each
    applied identically to every checkpoint scored, so comparisons stay
    apples-to-apples."""
    from room_slam_tpu.data.dataset import TraceColliderArrays
    from room_slam_tpu.data.features import featurize
    from room_slam_tpu.ops.nms import post_process
    from room_slam_tpu.ops.refine import outside_extent_mask, refine_walls
    from room_slam_tpu.train.driver import load_model_for_inference
    from room_slam_tpu.train.loop import make_forward
    from room_slam_tpu.train.metrics import (average_precision_3d,
                                             make_metrics_step,
                                             summarize_metrics)

    model, params, cfg = load_model_for_inference(checkpoint)
    ds = TraceColliderArrays(data_dir, cfg.data, augment=False,
                             verbose=False)
    mstep = make_metrics_step(model, iou_thresh=iou_thresh)
    fwd = make_forward(model)

    acc = None
    pred_rows, gt_rows = [], []
    img = 0
    for batch in ds.epoch_batches(batch_size, shuffle=False):
        db = {k: jnp.asarray(v) for k, v in batch.items()}
        sums = {k: float(v) for k, v in mstep(params, db).items()}
        acc = sums if acc is None else {k: acc[k] + sums[k] for k in sums}
        feats, mask = featurize(db["raw"], db["length"])
        out = fwd(params, feats, mask)
        for b in range(db["raw"].shape[0]):
            if batch["weight"][b] == 0:
                continue
            pred_b = out["pred_boxes"][b]
            if refine_clearance is not None:
                pred_b = refine_walls(
                    pred_b, jnp.argmax(out["pred_classes"][b], -1),
                    db["raw"][b], db["length"][b],
                    clearance=refine_clearance)
            obj = out.get("pred_objectness")
            keep, labels, conf = post_process(
                pred_b, out["pred_classes"][b],
                confidence_threshold=threshold, nms_threshold=nms,
                consensus=consensus,
                objectness=None if obj is None else obj[b])
            if extent_slack is not None:
                keep = keep & ~outside_extent_mask(
                    pred_b, db["raw"][b], db["length"][b],
                    slack=extent_slack)
            keep = np.asarray(keep)
            boxes = np.asarray(pred_b)
            for q in np.where(keep)[0]:
                pred_rows.append(
                    (boxes[q], int(labels[q]), float(conf[q]), img))
            for m in np.where(batch["valid"][b])[0]:
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
            iou_thresh=iou_thresh)
        metrics["mAP"] = mAP
        metrics["AP_per_class"] = {int(k): round(v, 4)
                                   for k, v in aps.items()}
    else:
        metrics["mAP"] = 0.0
    metrics["num_predictions"] = len(pred_rows)
    return metrics


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoints", nargs="+", required=True,
                   help="name=path pairs; .pth paths are torch-imported")
    p.add_argument("--data_dir", type=str, default="dataset/val")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--iou_thresh", type=float, default=0.5)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--nms", type=float, default=0.3)
    p.add_argument("--refine", type=float, default=None, metavar="CLEARANCE",
                   help="apply trace-informed wall refinement (ops/refine.py)"
                        " to EVERY checkpoint scored")
    p.add_argument("--extent_slack", type=float, default=None,
                   metavar="METERS",
                   help="suppress predictions entirely outside trace extent"
                        " + margin, for EVERY checkpoint scored")
    p.add_argument("--consensus", action="store_true",
                   help="cluster-size consensus rescoring (rank-only), for "
                        "EVERY checkpoint scored")
    p.add_argument("--output", type=str, default=None)
    args = p.parse_args()

    results = {}
    for spec in args.checkpoints:
        name, _, path = spec.partition("=")
        print(f"scoring {name}: {path}")
        results[name] = score_checkpoint(
            path, args.data_dir, args.batch_size, args.iou_thresh,
            args.threshold, args.nms, refine_clearance=args.refine,
            extent_slack=args.extent_slack, consensus=args.consensus)

    print(json.dumps(results, indent=2, default=float))
    names = list(results)
    if len(names) == 2:
        a, b = names
        delta = results[a]["mAP"] - results[b]["mAP"]
        print(f"\nmAP delta ({a} - {b}): {delta:+.4f} "
              f"({'within' if abs(delta) <= 0.005 or delta > 0 else 'OUTSIDE'}"
              " the 0.5-point parity gate when negative)")
    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2, default=float)


if __name__ == "__main__":
    main()
