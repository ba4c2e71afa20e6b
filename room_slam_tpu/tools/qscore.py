"""Fit the learned per-candidate quality scorer (ops/qscore.py).

Trains the tiny rerank MLP on synthetic rooms where per-candidate
IoU-vs-GT labels are free, using EXACTLY the pooled candidate sets the
inference pipeline produces (same ``_forward_val_set`` + TTA pooling as
calibrate/realbench, optional multi-checkpoint ensembles). The scorer is
a post-process rescoring signal — it never touches model weights — so
training data hygiene follows the calibration-split rules: fit on a
dedicated split, adopt on the calibration split, score once.

    python3 -m room_slam_tpu.tools.qscore \
      --checkpoint a/best_model,b/best_model,c/best_model \
      --data_dir .ckpts/splits/qs_train --tta \
      --output results/r4_qscore_weights.json

Round-5 generalization (VERDICT r4 item 7 — the round-4 scorer was fit
on one ensemble's own candidates and transferred only +0.005):
``--spec specs.json`` pools candidates from MULTIPLE (checkpoint,
data_dir) pairs — different training generations and synthetic
generators — and ``--synthf v1|v2`` additionally appends the
hole/notch-synthesized candidates (ops/refine.synthesize_furniture[_v2])
to every pool so the scorer learns to rank injected hypotheses too.

The weights JSON is consumed by ``calibrate --qscore`` /
``realbench --qscore`` (a ``conf_scale`` dimension like physics
rescoring).
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def iou_labels(cached: dict, iou_thresh: float = 0.25) -> np.ndarray:
    """[B, Q] bool: candidate has a same-class GT at IoU >= thresh."""
    import jax
    import jax.numpy as jnp

    from room_slam_tpu.ops.iou import pairwise_iou_3d

    @jax.jit
    def one(boxes, logits, gt_boxes, gt_labels, gt_valid):
        iou = pairwise_iou_3d(boxes, gt_boxes)            # [Q, M]
        labels = jnp.argmax(logits, -1)
        same = labels[:, None] == gt_labels[None, :]
        ok = (iou >= iou_thresh) & same & gt_valid[None, :]
        return jnp.any(ok, axis=1)

    return np.asarray(jax.vmap(one)(
        jnp.asarray(cached["pred_boxes"]),
        jnp.asarray(cached["pred_logits"]),
        jnp.asarray(cached["gt_boxes"]),
        jnp.asarray(cached["gt_labels"]),
        jnp.asarray(cached["gt_valid"])))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--checkpoint", default=None,
                    help="stem or comma-separated stems (candidate pool "
                         "matches the ensemble recipe)")
    ap.add_argument("--data_dir", default=None)
    ap.add_argument("--spec", default=None,
                    help="JSON file: list of {checkpoint, data_dir} pairs "
                         "pooled into one training set (multi-generation "
                         "fit); overrides --checkpoint/--data_dir")
    ap.add_argument("--synthf", default=None, choices=["v1", "v2"],
                    help="append hole/notch-synthesized candidates to "
                         "every pool so the scorer learns to rank "
                         "injected hypotheses")
    ap.add_argument("--tta", action="store_true")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=800)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--iou", type=float, default=0.25)
    ap.add_argument("--holdout", type=float, default=0.2,
                    help="fraction of ROOMS held out for the fit report")
    ap.add_argument("--output", default="results/r4_qscore_weights.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from room_slam_tpu.ops.qscore import (candidate_features, mlp_apply,
                                          mlp_init)
    from room_slam_tpu.tools.calibrate import _forward_val_set

    if args.spec:
        specs = json.load(open(args.spec))
    else:
        if not (args.checkpoint and args.data_dir):
            raise SystemExit("--checkpoint/--data_dir or --spec required")
        specs = [{"checkpoint": args.checkpoint, "data_dir": d}
                 for d in args.data_dir.split(",")]

    def synth_augment(cached):
        """Append synthesized candidates (realbench's synthf step) so the
        scorer sees injected rows at fit time; returns augmented arrays +
        a validity mask (invalid synth slots never reach inference)."""
        from room_slam_tpu.ops.refine import (synthesize_furniture,
                                              synthesize_furniture_v2)

        fn = (synthesize_furniture_v2 if args.synthf == "v2"
              else synthesize_furniture)
        obj = cached.get("pred_objectness")
        out = dict(cached)
        if obj is None:
            b, lg, _, nv = jax.jit(jax.vmap(
                lambda b, lg, r, n: fn(b, lg, None, r, n)))(
                jnp.asarray(cached["pred_boxes"]),
                jnp.asarray(cached["pred_logits"]),
                jnp.asarray(cached["raw"]), jnp.asarray(cached["length"]))
        else:
            b, lg, ob, nv = jax.jit(jax.vmap(
                lambda b, lg, o, r, n: fn(b, lg, o, r, n)))(
                jnp.asarray(cached["pred_boxes"]),
                jnp.asarray(cached["pred_logits"]), jnp.asarray(obj),
                jnp.asarray(cached["raw"]), jnp.asarray(cached["length"]))
            out["pred_objectness"] = np.asarray(ob)
        out["pred_boxes"], out["pred_logits"] = np.asarray(b), np.asarray(lg)
        return out, np.asarray(nv)

    Xr, yr = [], []                      # per-room flattened arrays
    for sp in specs:
        cached = _forward_val_set(sp["checkpoint"], sp["data_dir"],
                                  args.batch_size,
                                  tta=sp.get("tta", args.tta))
        if args.synthf:
            cached, valid = synth_augment(cached)
        else:
            valid = np.ones(cached["pred_boxes"].shape[:2], bool)
        obj = cached.get("pred_objectness")
        feats = np.asarray(jax.vmap(
            lambda b, lg, o, r, n: candidate_features(b, lg, o, r, n)
        )(jnp.asarray(cached["pred_boxes"]),
          jnp.asarray(cached["pred_logits"]),
          None if obj is None else jnp.asarray(obj),
          jnp.asarray(cached["raw"]), jnp.asarray(cached["length"])))
        y = iou_labels(cached, args.iou)
        for i in range(feats.shape[0]):
            m = valid[i]
            Xr.append(feats[i][m])
            yr.append(y[i][m].astype(np.float32))
        print(f"  spec {sp['data_dir']}: rooms {feats.shape[0]}, "
              f"Q' {feats.shape[1]}")

    B = len(Xr)
    rng = np.random.default_rng(args.seed)
    perm = rng.permutation(B)
    n_hold = max(int(B * args.holdout), 1)
    hold, tr = perm[:n_hold], perm[n_hold:]
    Xtr = np.concatenate([Xr[i] for i in tr])
    ytr = np.concatenate([yr[i] for i in tr])
    Xho = np.concatenate([Xr[i] for i in hold])
    yho = np.concatenate([yr[i] for i in hold])
    feats = Xtr                          # feature width source below
    print(f"rooms {B} (fit {len(tr)} / report {len(hold)}), "
          f"candidates {len(ytr)}, positives {ytr.mean():.3f}")

    params = mlp_init(jax.random.key(args.seed), args.hidden,
                      feats.shape[-1])
    mu = Xtr.mean(0)
    sigma = Xtr.std(0) + 1e-6
    params["mu"] = jnp.asarray(mu)
    params["sigma"] = jnp.asarray(sigma)
    pos_w = float((1.0 - ytr.mean()) / max(ytr.mean(), 1e-6))

    tx = optax.adam(args.lr)
    opt = tx.init(params)
    Xj, yj = jnp.asarray(Xtr), jnp.asarray(ytr)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            q = mlp_apply(p, Xj)
            ls = optax.sigmoid_binary_cross_entropy(q, yj)
            w = jnp.where(yj > 0.5, pos_w, 1.0)
            return jnp.sum(ls * w) / jnp.sum(w)

        loss, g = jax.value_and_grad(loss_fn)(params)
        g = {k: (jnp.zeros_like(v) if k in ("mu", "sigma") else g[k])
             for k, v in params.items()}
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    for e in range(args.epochs):
        params, opt, loss = step(params, opt)
        if e % 200 == 0:
            print(f"  epoch {e}: loss {float(loss):.4f}", flush=True)

    def auc(X, yv):
        q = np.asarray(mlp_apply(params, jnp.asarray(X)))
        order = np.argsort(q)
        ranks = np.empty_like(order, dtype=np.float64)
        ranks[order] = np.arange(len(q))
        n_pos, n_neg = yv.sum(), (1 - yv).sum()
        if n_pos == 0 or n_neg == 0:
            return float("nan")
        return float((ranks[yv > 0.5].sum()
                      - n_pos * (n_pos - 1) / 2) / (n_pos * n_neg))

    def conf_auc(X, yv):
        order = np.argsort(X[:, 0])
        ranks = np.empty_like(order, dtype=np.float64)
        ranks[order] = np.arange(len(order))
        n_pos, n_neg = yv.sum(), (1 - yv).sum()
        return float((ranks[yv > 0.5].sum()
                      - n_pos * (n_pos - 1) / 2) / (n_pos * n_neg))

    report = {
        "train_auc": auc(Xtr, ytr), "holdout_auc": auc(Xho, yho),
        "train_conf_auc": conf_auc(Xtr, ytr),
        "holdout_conf_auc": conf_auc(Xho, yho),
        "n_candidates": int(len(ytr)), "pos_rate": float(ytr.mean()),
    }
    print(json.dumps(report, indent=1))
    out = {k: np.asarray(v).tolist() for k, v in params.items()}
    out["_meta"] = {"hidden": args.hidden, "iou": args.iou,
                    "specs": specs, "tta": bool(args.tta),
                    "synthf": args.synthf, "report": report}
    with open(args.output, "w") as f:
        json.dump(out, f)
    print("wrote", args.output)


if __name__ == "__main__":
    main()
