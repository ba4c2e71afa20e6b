#!/usr/bin/env python3
"""Behavioral diagnostics against a trained checkpoint
(ref: src/benchmark/diagnose_overfitting.py).

Three probes that detect a model ignoring its input:
1. trace sensitivity — different random traces must give different outputs
2. order sensitivity — shuffling the trace must change outputs
3. scale proportionality — 2x/0.5x coordinate scaling must scale boxes

    python diagnose.py checkpoints/best_model [trace_file.json]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from room_slam_tpu.data import formats
from room_slam_tpu.data.features import process_traces_np
from room_slam_tpu.train.driver import load_model_for_inference


_JITTED = {}


def _forward(model, params, feats_np, pad_to: int = 1000):
    """Fixed-shape jitted forward (pad + mask) so each probe is one
    compiled dispatch."""
    if id(model) not in _JITTED:
        _JITTED[id(model)] = jax.jit(
            lambda p, t, m: model.apply(p, t, m, deterministic=True))
    n = feats_np.shape[0]
    padded = np.zeros((1, pad_to, feats_np.shape[1]), np.float32)
    padded[0, :n] = feats_np[:pad_to]
    mask = np.zeros((1, pad_to), bool)
    mask[0, :n] = True
    return _JITTED[id(model)](params, jnp.asarray(padded),
                              jnp.asarray(mask))


def _feats_from_raw(raw_xyzt):
    return process_traces_np(raw_xyzt, max_len=1000)


def test_trace_sensitivity(model, params, rng) -> bool:
    print("\n" + "=" * 60)
    print("Test 1: Trace Sensitivity")
    print("=" * 60)
    outs = []
    for i in range(3):
        if i < 2:
            raw = rng.normal(size=(1000, 4)).astype(np.float32) * 2.0
            raw[:, 3] = np.sort(rng.uniform(0, 30, 1000))
        else:
            raw = np.zeros((1000, 4), np.float32)
        out = _forward(model, params, _feats_from_raw(raw))
        outs.append(np.asarray(out["pred_boxes"][0]))
    d12 = np.abs(outs[0] - outs[1]).mean()
    d13 = np.abs(outs[0] - outs[2]).mean()
    print(f"  Random1 vs Random2: {d12:.6f}")
    print(f"  Random1 vs Zeros:   {d13:.6f}")
    ok = not (d12 < 0.1 and d13 < 0.1)
    print("  ✅ OK" if ok else "  ❌ PROBLEM: model ignores the trace")
    return ok


def test_order_sensitivity(model, params, trace_file, rng) -> bool:
    print("\n" + "=" * 60)
    print("Test 2: Trace Order Sensitivity")
    print("=" * 60)
    raw = formats.load_trace_json(trace_file)
    raw = formats.linspace_downsample(formats.sort_by_time(raw), 1000)
    out1 = _forward(model, params, _feats_from_raw(raw))
    # shuffle positions while keeping timestamps ascending: this scrambles
    # the PATH (and its kinematics), which an order-sensitive model must see
    perm = rng.permutation(raw.shape[0])
    shuffled = raw.copy()
    shuffled[:, :3] = raw[perm, :3]
    out2 = _forward(model, params, _feats_from_raw(shuffled))
    d = np.abs(np.asarray(out1["pred_boxes"]) -
               np.asarray(out2["pred_boxes"])).mean()
    print(f"  original vs shuffled: {d:.6f}")
    ok = d >= 0.1
    print("  ✅ OK" if ok else "  ❌ PROBLEM: order-insensitive")
    return ok


def test_scale_sensitivity(model, params, trace_file) -> bool:
    print("\n" + "=" * 60)
    print("Test 3: Trace Scaling Sensitivity")
    print("=" * 60)
    raw = formats.load_trace_json(trace_file)
    raw = formats.linspace_downsample(formats.sort_by_time(raw), 1000)

    def centers(scale):
        r = raw.copy()
        r[:, :3] *= scale
        out = _forward(model, params, _feats_from_raw(r))
        return np.asarray(out["pred_boxes"][0]).mean(axis=0)[:3]

    c1, c2, c05 = centers(1.0), centers(2.0), centers(0.5)
    ratio2 = c2 / (c1 + 1e-6)
    print(f"  1x centers: {c1}")
    print(f"  2x ratio:   {ratio2}")
    ok = np.abs(ratio2 - 2.0).mean() < 0.5
    print("  ✅ OK: boxes scale with trace" if ok
          else "  ❌ PROBLEM: boxes don't scale")
    return ok


def main():
    if len(sys.argv) < 2:
        print("Usage: python diagnose.py <checkpoint> [trace_file]")
        sys.exit(1)
    checkpoint = sys.argv[1]
    trace_file = (sys.argv[2] if len(sys.argv) > 2
                  else "dataset/val/human_data_20251016_204024.json")

    print(f"Loading model from {checkpoint}")
    model, params, _ = load_model_for_inference(checkpoint)
    rng = np.random.default_rng(0)

    results = [
        ("Trace Sensitivity", test_trace_sensitivity(model, params, rng)),
        ("Trace Order",
         test_order_sensitivity(model, params, trace_file, rng)),
        ("Trace Scaling", test_scale_sensitivity(model, params, trace_file)),
    ]

    print("\n" + "=" * 60)
    print("DIAGNOSIS SUMMARY")
    print("=" * 60)
    for name, ok in results:
        print(f"{'✅ PASS' if ok else '❌ FAIL'}: {name}")
    passed = sum(ok for _, ok in results)
    print(f"\nPassed: {passed}/{len(results)}")
    if passed == 0:
        print("\n⚠️  SEVERE OVERFITTING: model is not using the traces. "
              "Increase augmentation / regularization, or collect more "
              "varied rooms.")
    elif passed < len(results):
        print("\n⚠️  PARTIAL OVERFITTING: model uses traces but may "
              "memorize patterns.")
    else:
        print("\n✅ Model appears to be learning from traces!")


if __name__ == "__main__":
    main()
