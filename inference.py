#!/usr/bin/env python3
"""Inference CLI (ref: src/benchmark/inference.py:277-331).

    python inference.py --checkpoint checkpoints/best_model \
        --input dataset/val/human_data_20251016_204024.json \
        --output predictions.json --threshold 0.7 --nms 0.3

Accepts our msgpack checkpoints or a reference ``.pth`` (imported through
room_slam_tpu.train.torch_import).
"""

from __future__ import annotations

import argparse
import json

from room_slam_tpu.data import formats
from room_slam_tpu.predictor import (adapt_features, build_predictor,
                                     model_input_dim)
from room_slam_tpu.train.driver import load_model_for_inference

__all__ = ["adapt_features", "model_input_dim", "predict"]


def predict(model, params, traces_file: str, max_trace_len: int = 3000,
            confidence_threshold: float = 0.7, nms_threshold: float = 0.3,
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
            synth_furniture: bool = False,
            y_planes: tuple | None = None,
            qscore: str | None = None,
            qscore_auto: float | None = None):
    """Featurize one trace file, forward, confidence-filter + per-class NMS
    (ref: inference.py:200-275). Thin wrapper over
    room_slam_tpu.predictor.build_predictor (shared with the live UDP
    demo)."""
    predict_array = build_predictor(
        model, params, max_trace_len=max_trace_len,
        confidence_threshold=confidence_threshold,
        nms_threshold=nms_threshold, refine_clearance=refine_clearance,
        refine_trust=refine_trust, refine_furniture=refine_furniture,
        synth_walls=synth_walls,
        extent_slack=extent_slack, consensus=consensus, top_k=top_k,
        tta_rotations=tta_rotations, tta_reflect=tta_reflect,
        tta_scales=tta_scales, fuse=fuse, ttopt=ttopt,
        ttopt_params=ttopt_params,
        soft_sigma=soft_sigma, synth_furniture=synth_furniture,
        y_planes=y_planes, qscore=qscore, qscore_auto=qscore_auto)
    return predict_array(formats.load_trace_json(traces_file))


def _ycal(spec):
    """Resolve --ycal: 'floor,ceil' literal or a colliders.json path."""
    if not spec:
        return None
    import os
    if "," in spec and not os.path.exists(spec):
        lo, hi = spec.split(",")
        return (float(lo), float(hi))
    from room_slam_tpu.ops.refine import y_planes_from_colliders
    return y_planes_from_colliders(spec)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="Path to model checkpoint (.msgpack stem or "
                             "reference .pth)")
    parser.add_argument("--input", type=str, required=True,
                        help="Input trace file (JSON)")
    parser.add_argument("--output", type=str, default=None,
                        help="Output file for predictions")
    parser.add_argument("--threshold", type=float, default=0.7,
                        help="Confidence threshold (default: 0.7)")
    parser.add_argument("--nms", type=float, default=0.3,
                        help="NMS IoU threshold (default: 0.3)")
    parser.add_argument("--refine", type=float, default=None,
                        metavar="CLEARANCE",
                        help="trace-informed wall refinement with this "
                             "walker-clearance prior in meters. Off by "
                             "default: calibration selects NO snap for "
                             "well-trained models (PARITY.md round 3 — "
                             "a wrong prior zeroes thin-wall IoU)")
    parser.add_argument("--refine_trust", type=float, default=0.4,
                        metavar="METERS",
                        help="with --refine: max distance a wall "
                             "prediction may be moved onto the "
                             "extent-implied plane (default 0.4; real "
                             "captures drift further — see ops/refine.py)")
    parser.add_argument("--refine_furniture", action="store_true",
                        help="with --refine: wall planes sit beyond "
                             "predicted furniture lining the envelope")
    parser.add_argument("--synth_walls", action="store_true",
                        help="inject the 4 trace-extent-implied wall "
                             "candidates alongside the model's "
                             "predictions (ops/refine.synthesize_walls)")
    parser.add_argument("--consensus", action="store_true",
                        help="rescore detections by NMS cluster-size "
                             "consensus (rank-only)")
    parser.add_argument("--extent_slack", type=float, default=None,
                        metavar="METERS",
                        help="suppress predictions entirely outside the "
                             "trace extent + this margin (single-room "
                             "captures)")
    parser.add_argument("--top_k", type=int, default=None,
                        help="keep only the K best detections after NMS "
                             "(rank-based operating point; transfers "
                             "across domains where absolute thresholds "
                             "do not)")
    parser.add_argument("--tta", action="store_true",
                        help="4-way rotation test-time augmentation: "
                             "forward all four 90-degree rotations, pool "
                             "the un-rotated candidates through one "
                             "NMS/top-K pass (averages out rotation "
                             "variance; helps unseen rooms)")
    parser.add_argument("--tta_reflect", action="store_true",
                        help="also pool the x-mirrored copy of every TTA "
                             "view (8-view dihedral pooling with --tta)")
    parser.add_argument("--tta_scales", default="",
                        help="comma list of extra uniform scales to "
                             "forward every TTA view at (boxes exactly "
                             "unscaled before pooling)")
    parser.add_argument("--ttopt", action="store_true",
                        help="test-time trace-consistency adaptation of "
                             "the candidate boxes against the capture's "
                             "physics (ops/ttopt.py)")
    parser.add_argument("--ttopt_params", default=None,
                        help="JSON TTOptParams overrides for --ttopt; "
                             "'{\"auto\": tau}' enables the adopted "
                             "per-capture confidence gate (FINAL.md "
                             "round-5) - same semantics as realbench")
    parser.add_argument("--fuse", action="store_true",
                        help="weighted box fusion: each kept detection "
                             "becomes its NMS cluster's score-weighted "
                             "mean (best with --tta/--tta_reflect or "
                             "ensemble pooling)")
    parser.add_argument("--soft", type=float, default=None,
                        help="soft-NMS Gaussian sigma: loose overlaps "
                             "decay instead of dying; pair --nms 0.5 — "
                             "the unseen-room recall recipe (FINAL.md)")
    parser.add_argument("--synth_furniture", nargs="?", const="v1",
                        default=None, choices=["v1", "v2"],
                        help="inject hole-implied furniture candidates "
                             "(interior unvisited components of the walk "
                             "raster; ops/refine.synthesize_furniture); "
                             "'v2' adds boundary-notch + tall-BLOCK "
                             "hypotheses (synthesize_furniture_v2)")
    parser.add_argument("--qscore", default=None,
                        help="learned-quality weight JSON (tools/"
                             "qscore.py): rescores every candidate's "
                             "confidence before NMS "
                             "(ops/qscore.quality_scale)")
    parser.add_argument("--qscore_auto", type=float, default=None,
                        help="per-capture confidence gate for --qscore "
                             "(same signal + tau rule as the ttopt "
                             "auto-gate): rerank only when the model's "
                             "max candidate confidence is below this")
    parser.add_argument("--ycal", default=None,
                        help="seen-room Y-plane calibration: a "
                             "colliders.json path (the room the model "
                             "trained on) or 'floor,ceil' in metres; "
                             "snaps tall BLOCK predictions to those "
                             "planes (ops/refine.snap_y_planes)")
    args = parser.parse_args()

    print(f"Loading model from {args.checkpoint}")
    model, params, cfg = load_model_for_inference(args.checkpoint)

    print(f"Processing {args.input}")
    predictions = predict(
        model, params, args.input,
        max_trace_len=cfg.data.max_trace_len,
        confidence_threshold=args.threshold, nms_threshold=args.nms,
        refine_clearance=args.refine, refine_trust=args.refine_trust,
        refine_furniture=args.refine_furniture,
        synth_walls=args.synth_walls,
        extent_slack=args.extent_slack, consensus=args.consensus,
        top_k=args.top_k, tta_rotations=args.tta,
        tta_reflect=args.tta_reflect,
        tta_scales=tuple(float(x) for x in args.tta_scales.split(",") if x),
        fuse=args.fuse, ttopt=args.ttopt,
        ttopt_params=(json.loads(args.ttopt_params)
                      if args.ttopt_params else None),
        soft_sigma=args.soft,
        synth_furniture=args.synth_furniture, y_planes=_ycal(args.ycal),
        qscore=args.qscore, qscore_auto=args.qscore_auto)

    print(f"\nFound {len(predictions)} colliders:")
    for i, pred in enumerate(predictions):
        c = pred["center"]
        print(f"  {i + 1}. {pred['label']} at "
              f"({c['x']:.2f}, {c['y']:.2f}, {c['z']:.2f}) "
              f"- confidence: {pred['confidence']:.3f}")

    if args.output:
        formats.save_predictions_json(
            args.output, predictions, args.threshold, args.nms)
        print(f"\nResults saved to {args.output}")


if __name__ == "__main__":
    main()
