"""Train the PyTorch *reference* on an arbitrary data directory.

Thin driver for the quality-parity protocol (PARITY.md): the reference's
own ``main()`` hardcodes its paths/epochs (reference train.py:356-507), so
this runner wires the reference's OWN components — ``create_dataloader``
(with the same aggressive-augmentation settings, train.py:390-410),
``build_model``, ``SetCriterion`` (same weight dict, train.py:433-438),
AdamW + ReduceLROnPlateau (same hyperparameters, train.py:440-458),
``train_one_epoch`` / ``validate`` / ``evaluate_metrics`` — against a
configurable dataset, so both frameworks can be trained on identical data
and scored by ONE evaluator (``room_slam_tpu.tools.parity``).

No reference code is copied: everything below is orchestration that calls
the reference's public functions. Requires /root/reference (skipped
elsewhere).

    python -m room_slam_tpu.tools.ref_train \
        --data_dir /tmp/parity/train --val_dir /tmp/parity/val \
        --save_dir /tmp/parity/ref_ckpt --epochs 120
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REFERENCE = Path("/root/reference/src/benchmark")

# The reference's own training hyperparameters (train.py:366-380,433-458).
REF_CONFIG = {
    "model_type": "lstm",
    "batch_size": 20,
    "lr": 2e-4,
    "weight_decay": 1e-4,
    "d_model": 128,
    "num_queries": 30,
    "iou_thresh": 0.5,
    "loss_weights": {"class_loss": 2.0, "l1_loss": 5.0, "giou_loss": 2.0},
    "plateau": dict(mode="min", factor=0.5, patience=5, threshold=1e-3,
                    cooldown=1, min_lr=1e-6),
}


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--val_dir", required=True)
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--batch_size", type=int,
                    default=REF_CONFIG["batch_size"])
    ap.add_argument("--max_trace_len", type=int, default=3000,
                    help="reference dataloader default (dataloader.py:27)")
    ap.add_argument("--model_type", default=REF_CONFIG["model_type"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--val_every", type=int, default=1)
    args = ap.parse_args(argv)

    if not REFERENCE.exists():
        sys.exit("reference not mounted at /root/reference — nothing to do")
    sys.path.insert(0, str(REFERENCE))

    import numpy as np
    import torch

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)

    from dataloader import create_dataloader  # reference module
    from model import build_model  # reference module
    from train import (SetCriterion, evaluate_metrics,  # reference module
                       train_one_epoch, validate)

    device = torch.device("cpu")
    save_dir = Path(args.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)

    # Same aggressive augmentation the reference trains with
    # (train.py:390-410) and a clean val loader (train.py:412-420).
    train_loader = create_dataloader(
        args.data_dir, batch_size=args.batch_size, shuffle=True,
        max_trace_len=args.max_trace_len,
        augment_rotation=True, augment_translation=True,
        augment_scale=True, augment_collider_dropout=True,
        rotation_angles=[0, 90, 180, 270], scale_range=(0.8, 1.2),
        translation_range=1.0, collider_dropout_prob=0.2)
    val_loader = create_dataloader(
        args.val_dir, batch_size=args.batch_size, shuffle=False,
        max_trace_len=args.max_trace_len,
        augment_rotation=False, augment_translation=False,
        augment_scale=False, augment_collider_dropout=False)

    model = build_model(num_queries=REF_CONFIG["num_queries"],
                        d_model=REF_CONFIG["d_model"],
                        model_type=args.model_type).to(device)
    criterion = SetCriterion(dict(REF_CONFIG["loss_weights"]))
    optimizer = torch.optim.AdamW(model.parameters(), lr=REF_CONFIG["lr"],
                                  weight_decay=REF_CONFIG["weight_decay"])
    scheduler = torch.optim.lr_scheduler.ReduceLROnPlateau(
        optimizer, **REF_CONFIG["plateau"])

    config = dict(REF_CONFIG, epochs=args.epochs, data_dir=args.data_dir,
                  val_dir=args.val_dir, max_trace_len=args.max_trace_len,
                  seed=args.seed)
    (save_dir / "config.json").write_text(json.dumps(config, indent=2))

    best_val = float("inf")
    t0 = time.time()
    history = []
    for epoch in range(args.epochs):
        train_loss = train_one_epoch(model, train_loader, criterion,
                                     optimizer, device, epoch)
        row = {"epoch": epoch, "train_loss": float(train_loss),
               "lr": optimizer.param_groups[0]["lr"],
               "wall_s": round(time.time() - t0, 1)}
        if (epoch + 1) % args.val_every == 0:
            val_loss = validate(model, val_loader, criterion, device)
            metrics = evaluate_metrics(model, val_loader, device,
                                       iou_thresh=REF_CONFIG["iou_thresh"])
            scheduler.step(val_loss)
            row.update(val_loss=float(val_loss),
                       **{k: float(v) for k, v in metrics.items()})
            print(f"Epoch {epoch}: Train {train_loss:.4f} | "
                  f"Val {val_loss:.4f} | mIoU={metrics['mIoU']:.3f} "
                  f"F1={metrics['f1']:.3f} ClsAcc={metrics['cls_acc']:.3f} "
                  f"| LR={row['lr']:.6f} | {row['wall_s']:.0f}s",
                  flush=True)
            if val_loss < best_val:
                best_val = val_loss
                torch.save({"epoch": epoch,
                            "model_state_dict": model.state_dict(),
                            "val_loss": float(val_loss),
                            "metrics": {k: float(v)
                                        for k, v in metrics.items()},
                            "config": config},
                           save_dir / "best_model.pth")
        history.append(row)
        (save_dir / "history.json").write_text(json.dumps(history))
    print(f"done: best_val={best_val:.4f} wall={time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
