"""Checkpoint souping: average the params of several checkpoints of ONE
training run into a new checkpoint (uniform "model soup").

Late checkpoints of a cosine-schedule run sit in one converged basin, so
their uniform average denoises the final point much like a parameter EMA
— but it can be applied post hoc to any finished run (the trainer's
``train.ema_decay`` needs deciding before training). Only checkpoints
from the SAME run may be souped: independently-seeded runs live in
different basins and averaging them destroys the model (pool those with
the ensemble ``--checkpoint a,b,c`` instead).

    python -m room_slam_tpu.tools.soup --out /tmp/run/soup \
        /tmp/run/checkpoint_epoch_259 ... /tmp/run/checkpoint_epoch_299

The output is a normal checkpoint stem usable by every CLI.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def soup_params(stems: list) -> tuple:
    """Uniformly average the ``params`` trees of checkpoint stems.

    Returns (averaged state-dict tree, sidecar of the last stem)."""
    from flax import serialization

    if len(stems) < 2:
        raise SystemExit("soup needs at least 2 checkpoints")
    acc = None
    side = None
    for stem in stems:
        p = Path(stem)
        state = serialization.msgpack_restore(
            p.with_suffix(".msgpack").read_bytes())
        params = state["params"]
        side = json.loads(p.with_suffix(".json").read_text())
        flat = {}

        def _flatten(tree, prefix=()):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    _flatten(v, prefix + (k,))
            else:
                flat[prefix] = np.asarray(tree, np.float64)

        _flatten(params)
        if acc is None:
            acc = {k: v.copy() for k, v in flat.items()}
            shapes = {k: v.shape for k, v in flat.items()}
        else:
            if {k: v.shape for k, v in flat.items()} != shapes:
                raise SystemExit(
                    f"{stem}: params tree differs from the first "
                    "checkpoint — soup only checkpoints of one run")
            for k, v in flat.items():
                acc[k] += v

    n = len(stems)
    tree: dict = {}
    for k, v in acc.items():
        node = tree
        for part in k[:-1]:
            node = node.setdefault(part, {})
        node[k[-1]] = (v / n).astype(np.float32)
    return tree, side


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("stems", nargs="+",
                    help="checkpoint stems (msgpack+json pairs) of ONE run")
    ap.add_argument("--out", required=True, help="output checkpoint stem")
    args = ap.parse_args()

    from room_slam_tpu.config import ExperimentConfig
    from room_slam_tpu.train.checkpoint import save_checkpoint

    params, side = soup_params(args.stems)
    cfg = ExperimentConfig.from_dict(side.get("config", {}))
    save_checkpoint(
        args.out, params, epoch=side.get("epoch", 0), config=cfg,
        extra={"soup_of": [str(s) for s in args.stems]})
    print(f"souped {len(args.stems)} checkpoints -> {args.out}")


if __name__ == "__main__":
    main()
