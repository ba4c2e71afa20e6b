"""Augmentation visual check (ref: src/benchmark/test_augmentation.py).

Renders the 4 rotation variants of one sample in a 2x2 grid (trace +
colliders) and runs the numeric rotation assertion — at 90 degrees,
(x, z) -> (-z, x) within 0.01 (ref: test_augmentation.py:126-150; exact here
since the rotation table is exact). A second figure shows the stochastic
augmentations (translation/scale/noise/crop/warp) across several draws.

    python -m room_slam_tpu.viz.augmentation --data_dir dataset/train \
        --out augmentation_test.png
"""

from __future__ import annotations

import argparse

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib.patches import Rectangle  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from room_slam_tpu.config import DataConfig  # noqa: E402
from room_slam_tpu.data.augment import Sample, augment_sample, \
    rotate_sample  # noqa: E402
from room_slam_tpu.data.dataset import TraceColliderArrays  # noqa: E402


def _panel(ax, raw, n, boxes, valid, title):
    ax.plot(raw[:n, 0], raw[:n, 2], "b-", lw=0.4, alpha=0.7)
    for b in boxes[valid]:
        ax.add_patch(Rectangle(
            (b[0] - b[3] / 2, b[2] - b[5] / 2), b[3], b[5],
            ec="red", fc="red", alpha=0.2))
    ax.set_title(title, fontsize=9)
    ax.set_aspect("equal")
    ax.grid(alpha=0.3)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", type=str, default="dataset/train")
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--out", type=str, default="augmentation_test.png")
    p.add_argument("--stochastic_out", type=str, default=None,
                   help="optional second figure with random augmentations")
    args = p.parse_args()

    cfg = DataConfig()
    ds = TraceColliderArrays(args.data_dir, cfg, augment=False)
    i = args.index
    sample = Sample(
        raw=jnp.asarray(ds.raw[i]),
        length=jnp.asarray(ds.length[i]),
        boxes=jnp.asarray(ds.boxes[i]),
        labels=jnp.asarray(ds.labels[i]),
        valid=jnp.asarray(ds.valid[i]),
    )
    n = int(ds.length[i])

    fig, axes = plt.subplots(2, 2, figsize=(14, 14))
    for k, ax in enumerate(axes.flat):
        r = rotate_sample(sample, jnp.asarray(k))
        _panel(ax, np.asarray(r.raw), n, np.asarray(r.boxes),
               np.asarray(r.valid), f"rotation {k * 90}°")
    fig.suptitle(f"Rotation augmentation — {ds.names[i]}")
    fig.savefig(args.out, dpi=110, bbox_inches="tight")
    print(f"saved {args.out}")

    # numeric check (ref: test_augmentation.py:133-150)
    r90 = rotate_sample(sample, jnp.asarray(1))
    x, z = np.asarray(sample.raw[:n, 0]), np.asarray(sample.raw[:n, 2])
    err = max(
        np.abs(np.asarray(r90.raw[:n, 0]) - z).max(),
        np.abs(np.asarray(r90.raw[:n, 2]) + x).max(),
    )
    status = "✓" if err < 0.01 else "✗"
    print(f"{status} 90° rotation maps (x, z) -> (z, -x): "
          f"max error {err:.2e} (threshold 0.01)")

    if args.stochastic_out:
        fig, axes = plt.subplots(2, 3, figsize=(20, 13))
        _panel(axes[0, 0], np.asarray(sample.raw), n,
               np.asarray(sample.boxes), np.asarray(sample.valid),
               "original")
        for j, ax in enumerate(axes.flat[1:], start=1):
            out = augment_sample(jax.random.key(j), sample, jnp.asarray(0),
                                 cfg)
            _panel(ax, np.asarray(out.raw), int(out.length),
                   np.asarray(out.boxes), np.asarray(out.valid),
                   f"random draw {j} (len {int(out.length)})")
        fig.suptitle("Stochastic augmentations "
                     "(translate / scale / noise / crop / warp / dropout)")
        fig.savefig(args.stochastic_out, dpi=110, bbox_inches="tight")
        print(f"saved {args.stochastic_out}")


if __name__ == "__main__":
    main()
