#!/usr/bin/env python3
"""Demo: the rule-based occupancy-heatmap baseline on synthetic traces —
no training required (ref: README.md:56-62 "Run the Demo").

    python demo.py [--n_rooms 3] [--save_viz demo_out]
"""

from __future__ import annotations

import argparse
import json

import jax
import numpy as np

from room_slam_tpu.data import synthetic
from room_slam_tpu.models.baseline import OccupancyBaseline


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_rooms", type=int, default=3)
    p.add_argument("--num_steps", type=int, default=3000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_viz", type=str, default=None,
                   help="directory for PNG visualizations")
    p.add_argument("--output", type=str, default=None,
                   help="JSON file for predictions")
    args = p.parse_args()

    print(f"Generating {args.n_rooms} synthetic rooms + traces on device...")
    data = jax.device_get(synthetic.generate_rooms_and_traces(
        jax.random.key(args.seed), args.n_rooms, args.num_steps))

    baseline = OccupancyBaseline()
    all_results = []
    for i in range(args.n_rooms):
        raw = data["raw"][i]  # [T, 4] (x, y, z, t)
        trace_txy = np.stack([raw[:, 3], raw[:, 0], raw[:, 2]], axis=1)
        objects = baseline.predict(trace_txy)

        v = data["valid"][i]
        n_gt = int(v.sum())
        print(f"\nRoom {i}: {n_gt} ground-truth colliders, "
              f"baseline predicted {len(objects)} objects:")
        for o in objects:
            print(f"  {o['class_name']:6s} at "
                  f"({o['position'][0]:+.2f}, {o['position'][1]:+.2f}) "
                  f"size {o['size'][0]:.2f}x{o['size'][1]:.2f} "
                  f"conf {o['confidence']:.2f}")
        all_results.append({"room": i, "objects": objects})

        if args.save_viz:
            _plot(args.save_viz, i, raw, data["boxes"][i][v],
                  data["labels"][i][v], objects)

    if args.output:
        with open(args.output, "w") as f:
            json.dump({"results": all_results}, f, indent=2)
        print(f"\nSaved predictions to {args.output}")


def _plot(out_dir, i, raw, gt_boxes, gt_labels, objects):
    from pathlib import Path

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    Path(out_dir).mkdir(parents=True, exist_ok=True)
    fig, ax = plt.subplots(figsize=(10, 10))
    ax.plot(raw[:, 0], raw[:, 2], "b-", alpha=0.4, lw=0.5, label="Trace")
    for b in gt_boxes:
        ax.add_patch(Rectangle(
            (b[0] - b[3] / 2, b[2] - b[5] / 2), b[3], b[5],
            ec="red", fc="red", alpha=0.25))
    for o in objects:
        x, y = o["position"]
        w, h = o["size"]
        ax.add_patch(Rectangle(
            (x - w / 2, y - h / 2), w, h, ec="blue", fc="none", ls="--"))
        ax.text(x, y, o["class_name"], color="blue", ha="center",
                fontsize=7)
    ax.set_aspect("equal")
    ax.set_title(f"Room {i}: GT (red) vs occupancy baseline (blue)")
    ax.legend()
    fig.savefig(f"{out_dir}/demo_room_{i}.png", dpi=120,
                bbox_inches="tight")
    plt.close(fig)
    print(f"  saved {out_dir}/demo_room_{i}.png")


if __name__ == "__main__":
    main()
