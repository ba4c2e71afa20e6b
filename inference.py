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

import jax.numpy as jnp
import numpy as np

from room_slam_tpu.data import formats
from room_slam_tpu.data.features import process_traces_np
from room_slam_tpu.ops.nms import post_process
from room_slam_tpu.train.driver import load_model_for_inference


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


def predict(model, params, traces_file: str, max_trace_len: int = 3000,
            confidence_threshold: float = 0.7, nms_threshold: float = 0.3,
            refine_clearance: float | None = None,
            extent_slack: float | None = None,
            consensus: bool = False):
    """Featurize one trace file, forward, confidence-filter + per-class NMS
    (ref: inference.py:200-275).

    The forward + NMS run as ONE jitted dispatch at the fixed shape
    [1, max_trace_len, F] (zero-padded + masked), so repeated calls reuse
    the compiled program regardless of trace length."""
    import jax

    arr = formats.load_trace_json(traces_file)
    if arr.shape[0] == 0:
        print("Warning: No traces found in file")
        return []
    if arr.shape[0] > max_trace_len:
        print(f"Downsampling traces from {arr.shape[0]} to "
              f"{max_trace_len} points")
    feats = process_traces_np(arr, max_len=max_trace_len)  # [n, 11]
    in_feat = model_input_dim(params, default=feats.shape[-1])
    if in_feat != feats.shape[-1]:
        print(f"Adapting features from {feats.shape[-1]} to {in_feat} dims "
              "to match the checkpoint")
        feats = adapt_features(feats, in_feat)
    n = feats.shape[0]
    padded = np.zeros((1, max_trace_len, in_feat), np.float32)
    padded[0, :n] = feats
    mask = np.zeros((1, max_trace_len), bool)
    mask[0, :n] = True

    @jax.jit
    def run(params, traces, mask):
        # mask-less fallback for models whose __call__ doesn't take a mask
        # (ref: inference.py:261-265 TypeError fallback); the TypeError
        # surfaces at trace time, so plain try/except works under jit
        try:
            out = model.apply(params, traces, mask, deterministic=True)
        except TypeError:
            out = model.apply(params, traces, deterministic=True)
        boxes0 = out["pred_boxes"][0]
        if refine_clearance is not None and traces.shape[-1] >= 4:
            from room_slam_tpu.ops.refine import refine_walls

            # feature columns 0..3 are (x, y, z, t) — the raw trace
            boxes0 = refine_walls(
                boxes0, jnp.argmax(out["pred_classes"][0], -1),
                traces[0, :, :4], jnp.sum(mask[0].astype(jnp.int32)),
                clearance=refine_clearance)
        obj = out.get("pred_objectness")
        keep, labels, conf = post_process(
            boxes0, out["pred_classes"][0],
            confidence_threshold=confidence_threshold,
            nms_threshold=nms_threshold, consensus=consensus,
            objectness=None if obj is None else obj[0])
        if extent_slack is not None and traces.shape[-1] >= 4:
            from room_slam_tpu.ops.refine import outside_extent_mask

            keep = keep & ~outside_extent_mask(
                boxes0, traces[0, :, :4],
                jnp.sum(mask[0].astype(jnp.int32)), slack=extent_slack)
        return boxes0, keep, labels, conf

    boxes0, keep, labels, conf = run(
        params, jnp.asarray(padded), jnp.asarray(mask))

    keep = np.asarray(keep)
    boxes = np.asarray(boxes0)
    labels = np.asarray(labels)
    conf = np.asarray(conf)
    order = np.argsort(-conf * keep)
    preds = [
        formats.collider_to_dict(boxes[i], labels[i], conf[i])
        for i in order if keep[i]
    ]
    return preds


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
                             "walker-clearance prior in meters (agent: 0.3, "
                             "human: ~0.55)")
    parser.add_argument("--consensus", action="store_true",
                        help="rescore detections by NMS cluster-size "
                             "consensus (rank-only)")
    parser.add_argument("--extent_slack", type=float, default=None,
                        metavar="METERS",
                        help="suppress predictions entirely outside the "
                             "trace extent + this margin (single-room "
                             "captures)")
    args = parser.parse_args()

    print(f"Loading model from {args.checkpoint}")
    model, params, cfg = load_model_for_inference(args.checkpoint)

    print(f"Processing {args.input}")
    predictions = predict(
        model, params, args.input,
        max_trace_len=cfg.data.max_trace_len,
        confidence_threshold=args.threshold, nms_threshold=args.nms,
        refine_clearance=args.refine, extent_slack=args.extent_slack,
        consensus=args.consensus)

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
