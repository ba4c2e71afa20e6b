#!/usr/bin/env python3
"""Training CLI — both API surfaces of the reference.

Benchmark surface (JSON 3D traces, DETR-style set prediction; the reference's
``src/benchmark/train.py``):
    python train.py --surface bench --data_dir dataset/train \
        --val_dir dataset/val --model lstm --epochs 200

Legacy surface (CSV 2D traces, GRU + multi-head MLP decoder; the reference's
documented top-level ``train.py``, README.md:64-79, 147-157):
    python train.py --create_sample_data
    python train.py --data_dir data/sample --epochs 50
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--surface", choices=["auto", "bench", "legacy"],
                   default="auto")
    p.add_argument("--data_dir", type=str, default="data/sample")
    p.add_argument("--val_dir", type=str, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--model", type=str, default=None,
                   help="lstm | transformer | gru")
    p.add_argument("--d_model", type=int, default=None)
    p.add_argument("--hidden_size", type=int, default=128,
                   help="legacy GRU hidden size (README default 128)")
    p.add_argument("--seq_len", type=int, default=500,
                   help="legacy window length (README default 500)")
    p.add_argument("--max_objects", type=int, default=10)
    p.add_argument("--num_queries", type=int, default=None)
    p.add_argument("--max_trace_len", type=int, default=None)
    p.add_argument("--save_dir", type=str, default="./checkpoints")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--create_sample_data", action="store_true",
                   help="synthesize legacy sample data into --data_dir "
                        "(README.md:64-68)")
    p.add_argument("--num_sample_traces", type=int, default=10)
    p.add_argument("--config", type=str, default=None,
                   help="JSON ExperimentConfig to start from")
    p.add_argument("--no_fused", action="store_true",
                   help="use the per-epoch host loop instead of fusing the "
                        "whole run into one XLA dispatch")
    p.add_argument("--synthetic", type=int, default=None, metavar="N_ROOMS",
                   help="train on N on-device synthetic rooms instead of "
                        "--data_dir (val = N/8 independent rooms)")
    p.add_argument("--multi_room_prob", type=float, default=0.0,
                   help="share of synthetic layouts that are two rooms "
                        "connected by a doorway (sim2real lever)")
    p.add_argument("--wall_adjacent_prob", type=float, default=0.0,
                   help="share of synthetic furniture snapped against a "
                        "wall (the real rooms: ~60%%); 0 keeps the legacy "
                        "free-standing-only generator")
    p.add_argument("--synthetic_mode", choices=["agent", "human", "mixed"],
                   default="agent",
                   help="walker height model for --synthetic: constant "
                        "sensor (agent), head-height with bob (human), or "
                        "half each (mixed)")
    p.add_argument("--sim_factor", type=float, default=None,
                   help="synthetic walk duration as a multiple of "
                        "max_trace_len ticks, downsampled back like real "
                        "captures (default: human 2.4 / agent 4.0, matching "
                        "the real recordings; 1.0 = old behavior)")
    p.add_argument("--captures_per_room", type=int, default=1,
                   help="with --synthetic: emit this many independent "
                        "walks of each sampled layout as separate samples "
                        "(the reference dataset ships 3-4 captures per "
                        "room); N stays the SAMPLE count")
    p.add_argument("--evidence_mask", action="store_true",
                   help="with --synthetic: drop GT boxes the walk carries "
                        "no evidence for from supervision "
                        "(data/synthetic.box_evidence_mask)")
    p.add_argument("--mix_real", type=str, default=None, metavar="DIR",
                   help="with --synthetic: also fold the real trace/collider "
                        "pairs from DIR into the training set (the val "
                        "split stays purely synthetic)")
    p.add_argument("--mix_copies", type=int, default=16,
                   help="how many times to tile the --mix_real samples "
                        "(few real captures vs thousands of synthetic "
                        "rooms)")
    p.add_argument("--schedule", choices=["plateau", "cosine"], default=None,
                   help="LR schedule: ReduceLROnPlateau (reference default) "
                        "or warmup+cosine (the schedule the reference "
                        "defines but never plugs in)")
    p.add_argument("--resume", type=str, default=None,
                   help="continue from a checkpoint (params + optimizer "
                        "state + epoch); implies the per-epoch driver")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   help="config override section.key=value (repeatable)")
    args = p.parse_args()

    if args.create_sample_data:
        from room_slam_tpu.data.legacy import create_sample_data

        create_sample_data(args.data_dir, n_traces=args.num_sample_traces,
                           seed=args.seed)
        if args.epochs is None:
            return

    surface = args.surface
    if surface == "auto":
        d = Path(args.data_dir)
        has_csv = any(d.glob("*.csv")) if d.is_dir() else False
        surface = "legacy" if has_csv else "bench"
        print(f"[train] auto-detected surface: {surface}")

    if surface == "legacy":
        from room_slam_tpu.train.driver import train_legacy

        result = train_legacy(
            data_dir=args.data_dir,
            epochs=args.epochs if args.epochs is not None else 100,
            batch_size=args.batch_size or 32,
            lr=args.lr or 1e-3,
            hidden_size=args.hidden_size,
            seq_len=args.seq_len,
            max_objects=args.max_objects,
            save_dir=args.save_dir,
            seed=args.seed,
        )
        print(json.dumps(
            {k: v for k, v in result.items()
             if isinstance(v, (int, float, str))}, indent=2))
        return

    from room_slam_tpu.config import ExperimentConfig
    from room_slam_tpu.train.driver import train_benchmark, \
        train_benchmark_fused

    cfg = (ExperimentConfig.from_json(args.config) if args.config
           else ExperimentConfig())
    cfg.data.data_dir = args.data_dir
    cfg.data.val_dir = args.val_dir or args.data_dir.replace("train", "val")
    if args.epochs is not None:
        cfg.train.num_epochs = args.epochs
    if args.batch_size is not None:
        cfg.train.batch_size = args.batch_size
    if args.lr is not None:
        cfg.train.lr = args.lr
    if args.model is not None:
        cfg.model.model_type = args.model
    if args.d_model is not None:
        cfg.model.d_model = args.d_model
    if args.num_queries is not None:
        cfg.model.num_queries = args.num_queries
    if args.max_trace_len is not None:
        cfg.data.max_trace_len = args.max_trace_len
    cfg.train.save_dir = args.save_dir
    cfg.train.seed = args.seed
    if args.schedule is not None:
        cfg.train.lr_schedule = args.schedule
    cfg.apply_overrides(args.overrides)

    print("\n=== Data Augmentation Settings ===")
    print(f"Rotation: {list(cfg.data.rotation_angles)}°")
    print(f"Translation: ±{cfg.data.translation_range} meters")
    print(f"Scale: {cfg.data.scale_range[0]}x to {cfg.data.scale_range[1]}x")
    print(f"Collider Dropout: {cfg.data.collider_dropout_prob:.0%} "
          "probability")
    print("=" * 40 + "\n")

    kwargs = {}
    if args.synthetic:
        from room_slam_tpu.train.driver import make_synthetic_datasets

        print(f"[train] generating {args.synthetic} synthetic rooms "
              f"on device (mode={args.synthetic_mode})")
        tr, va = make_synthetic_datasets(
            cfg, args.synthetic, cfg.train.seed, mode=args.synthetic_mode,
            multi_room_prob=args.multi_room_prob,
            sim_factor=args.sim_factor,
            wall_adjacent_prob=args.wall_adjacent_prob,
            captures_per_room=args.captures_per_room,
            evidence_mask=args.evidence_mask)
        if args.mix_real:
            from room_slam_tpu.data.dataset import TraceColliderArrays

            real = TraceColliderArrays(args.mix_real, cfg.data, augment=True)
            print(f"[train] mixing {real.n_base} real samples x "
                  f"{args.mix_copies} copies into "
                  f"{tr.n_base} synthetic rooms")
            tr = TraceColliderArrays.concat([tr, real],
                                            [1, args.mix_copies])
        kwargs = {"train_ds": tr, "val_ds": va}

    if args.resume:
        kwargs["resume"] = args.resume
        result = train_benchmark(cfg, **kwargs)
    else:
        # fused runs shine on small datasets (host round trips dominate);
        # for large synthetic sweeps the per-epoch driver compiles much
        # faster and the round-trip overhead amortizes anyway
        use_fused = not args.no_fused and not args.synthetic
        train_fn = train_benchmark_fused if use_fused else train_benchmark
        result = train_fn(cfg, **kwargs)
    print(json.dumps(
        {k: v for k, v in result.items()
         if isinstance(v, (int, float, str))}, indent=2))


if __name__ == "__main__":
    main()
