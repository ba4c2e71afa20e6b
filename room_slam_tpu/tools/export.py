"""Export the serving program to a self-contained StableHLO artifact.

``predictor.build_predictor`` compiles the entire inference pipeline —
featurized trace in, post-processed boxes out (forward + TTA view pooling +
refine + NMS + fusion) — as ONE jitted dispatch. This tool serializes that
exact program with ``jax.export``: the checkpoint weights are closed over
(baked in as constants), so the resulting ``.shlo`` file is the complete
deployable — a serving host needs jax (or anything that executes StableHLO)
and this one file, none of this framework's Python.

The artifact is shape-specialized (fixed [R, L, F] input — the same
fixed-shape serving contract the live UDP mode uses) and lowered for the
platforms named at export time, so a CPU-exported artifact runs on any CPU
host and a ``--platforms cpu,tpu`` artifact on either. The reference has no
deployment story beyond "run the torch repo" (ref: src/benchmark/
inference.py loads the .pth in-process).

Usage:
    python -m room_slam_tpu.tools.export --checkpoint CKPT \
        --output model.shlo [--max_trace_len 3000] [--threshold 0.0 ...]
    python -m room_slam_tpu.tools.export --run model.shlo \
        --input trace.json   # smoke-test a serialized artifact
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def export_checkpoint(checkpoint: str, output: str,
                      max_trace_len: int = 3000,
                      threshold: float = 0.05, nms: float = 0.1,
                      refine: float | None = None,
                      refine_furniture: bool = True,
                      extent: float | None = 1.0,
                      top_k: int | None = 12,
                      tta: bool = False, fuse: bool = True,
                      platforms: tuple = ()) -> dict:
    """Serialize the full inference program for ``checkpoint`` to
    ``output`` (.shlo bytes) + a JSON sidecar describing the contract."""
    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    from room_slam_tpu.predictor import build_predictor, model_input_dim
    from room_slam_tpu.train.driver import load_model_for_inference

    model, params, cfg = load_model_for_inference(checkpoint)
    predict = build_predictor(
        model, params, max_trace_len=max_trace_len,
        confidence_threshold=threshold, nms_threshold=nms,
        refine_clearance=refine, refine_furniture=refine_furniture,
        extent_slack=extent, top_k=top_k, tta_rotations=tta, fuse=fuse,
        verbose=False)
    run, views = predict.run, predict.views
    R = len(views)
    F = model_input_dim(params, default=cfg.model.input_dim)

    closed = jax.jit(lambda traces, mask: run(params, traces, mask))
    args = (jax.ShapeDtypeStruct((R, max_trace_len, F), jnp.float32),
            jax.ShapeDtypeStruct((R, max_trace_len), jnp.bool_))
    exported = jexport.export(closed, platforms=list(platforms) or None)(
        *args)
    data = exported.serialize()
    Path(output).write_bytes(data)

    meta = {
        "input": {"traces": [R, max_trace_len, F],
                  "mask": [R, max_trace_len]},
        "output": "[RQ', 9] rows: box(6), keep, label, confidence",
        "views": [list(v) for v in views],
        "operating_point": {
            "threshold": threshold, "nms": nms, "refine": refine,
            "refine_furniture": refine_furniture, "extent": extent,
            "top_k": top_k, "tta": tta, "fuse": fuse},
        "platforms": list(exported.platforms),
        "model_type": cfg.model.model_type,
        "bytes": len(data),
    }
    Path(output).with_suffix(".json").write_text(json.dumps(meta, indent=1))
    return meta


def load_exported(path: str):
    """Deserialize an artifact; returns ``fn(traces, mask) -> [RQ', 9]``."""
    from jax import export as jexport

    exported = jexport.deserialize(Path(path).read_bytes())
    return exported.call


def run_exported(path: str, trace_file: str) -> list:
    """Smoke-test: featurize a trace file on the host and run the
    deserialized program (mirrors predictor.predict_array's host side)."""
    from room_slam_tpu.data import formats
    from room_slam_tpu.predictor import adapt_features, process_traces_np

    meta = json.loads(Path(path).with_suffix(".json").read_text())
    R, L, F = meta["input"]["traces"]
    arr = formats.load_trace_json(trace_file)
    feats = process_traces_np(np.asarray(arr, np.float32), max_len=L)
    if feats.shape[-1] != F:
        feats = adapt_features(feats, F)
    if R != 1:
        raise SystemExit("--run supports artifacts exported without --tta "
                         f"(R=1); this one has R={R}")
    n = feats.shape[0]
    padded = np.zeros((R, L, F), np.float32)
    mask = np.zeros((R, L), bool)
    padded[0, :n], mask[0, :n] = feats, True
    stacked = np.asarray(load_exported(path)(padded, mask))
    keep = stacked[:, 6] > 0.5
    out = [formats.collider_to_dict(stacked[i, :6],
                                    int(stacked[i, 7]), stacked[i, 8])
           for i in np.argsort(-stacked[:, 8] * keep) if keep[i]]
    print(f"{len(out)} colliders from {path}")
    for c in out[:8]:
        print(" ", c["label"], [round(float(x), 2) for x in
                               (c["center"]["x"], c["center"]["y"],
                                c["center"]["z"])], round(c["confidence"], 3))
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", help="checkpoint to export")
    p.add_argument("--output", default="model.shlo")
    p.add_argument("--max_trace_len", type=int, default=3000)
    # defaults = the calibration-selected detection cell (PARITY.md
    # round 3: refine snapping OFF — it destroys memorized walls)
    p.add_argument("--threshold", type=float, default=0.05)
    p.add_argument("--nms", type=float, default=0.1)
    p.add_argument("--refine", type=float, default=None)
    p.add_argument("--no_refine", action="store_true")
    p.add_argument("--extent", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=12)
    p.add_argument("--tta", action="store_true")
    p.add_argument("--fuse", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--platforms", default="",
                   help="comma list, e.g. cpu,tpu (default: current)")
    p.add_argument("--run", help="smoke-test an existing artifact instead")
    p.add_argument("--input", help="trace JSON for --run")
    args = p.parse_args()

    if args.run:
        if not args.input:
            raise SystemExit("--run needs --input TRACE_JSON")
        run_exported(args.run, args.input)
        return
    if not args.checkpoint:
        raise SystemExit("--checkpoint required")
    meta = export_checkpoint(
        args.checkpoint, args.output, max_trace_len=args.max_trace_len,
        threshold=args.threshold, nms=args.nms,
        refine=None if args.no_refine else args.refine,
        extent=args.extent, top_k=args.top_k, tta=args.tta, fuse=args.fuse,
        platforms=tuple(s for s in args.platforms.split(",") if s))
    print(json.dumps(meta, indent=1))


if __name__ == "__main__":
    main()
