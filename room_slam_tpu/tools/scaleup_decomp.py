"""Decompose the scale-up train step's wall time on the attached device.

Times each pipeline stage of the seq=5000, d=512 BiGRU config in isolation —
full train step, augment+featurize, jitted forward, the 4 Pallas recurrence
passes (fwd and fwd+bwd), and the Hungarian+set-loss block — so MFU work
targets the stage that actually binds (bench.py --scaleup measures only the
aggregate). The probes reuse the production builders (models/factory,
train/loop, ops/losses), so numbers track the real step, not a model of it.

Usage: python -m room_slam_tpu.tools.scaleup_decomp [--batch 128]
       [--dtype bfloat16|float32]

Prints one JSON line with per-stage milliseconds.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seq", type=int, default=5000)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    args = ap.parse_args()

    jax.config.update("jax_default_matmul_precision", "bfloat16")

    from room_slam_tpu.config import (DataConfig, ExperimentConfig,
                                      ModelConfig, TrainConfig)
    from room_slam_tpu.data.augment import make_augment_batch
    from room_slam_tpu.data.features import featurize
    from room_slam_tpu.models.factory import build_model, init_params
    from room_slam_tpu.ops.losses import set_criterion
    from room_slam_tpu.ops.rnn import gru_recurrence
    from room_slam_tpu.train.loop import (TrainState, batch_to_sample,
                                          make_optimizer, make_train_step)

    B, L, M = args.batch, args.seq, 32
    cfg = ExperimentConfig(
        data=DataConfig(max_trace_len=L, max_colliders=M),
        model=ModelConfig(model_type="bigru", d_model=512, num_queries=M,
                          compute_dtype=args.dtype),
        train=TrainConfig(batch_size=B),
    )
    model = build_model(cfg.model)
    params = init_params(model, cfg.model, seq_len=256, batch=B)
    tx = make_optimizer(cfg)
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    train_step = make_train_step(model, tx, cfg, augment=True)

    rng = np.random.default_rng(0)
    raw = rng.normal(size=(B, L, 4)).astype(np.float32)
    raw[..., 3] = np.cumsum(np.abs(raw[..., 3]) * 0.03 + 1e-3, axis=-1)
    batch = {
        "raw": jnp.asarray(raw),
        "length": jnp.full((B,), L, jnp.int32),
        "boxes": jnp.asarray(
            np.abs(rng.normal(size=(B, M, 6))).astype(np.float32)),
        "labels": jnp.asarray(rng.integers(0, 4, (B, M)).astype(np.int32)),
        "valid": jnp.asarray((np.arange(M)[None] < 12).repeat(B, 0)),
        "rotation_k": jnp.zeros((B,), jnp.int32),
        "weight": jnp.ones((B,), jnp.float32),
    }
    out = {"batch": B, "seq": L, "dtype": args.dtype,
           "platform": jax.devices()[0].platform}
    key = jax.random.key(0)

    # full step — train_step donates state, so rebind it every call
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, losses = train_step(state, batch, sub)
    jax.block_until_ready(losses["total_loss"])
    t0 = time.perf_counter()
    n = 8
    for _ in range(n):
        key, sub = jax.random.split(key)
        state, losses = train_step(state, batch, sub)
    jax.block_until_ready(losses["total_loss"])
    out["full_step_ms"] = round((time.perf_counter() - t0) / n * 1000, 1)

    # augment + featurize (the on-device data pipeline inside the step)
    aug_fn = make_augment_batch(cfg.data)

    @jax.jit
    def aug_feat(akey, batch):
        sample = aug_fn(akey, batch_to_sample(batch), batch["rotation_k"])
        return featurize(sample.raw, sample.length)[0]

    out["augment_featurize_ms"] = round(_timeit(aug_feat, key, batch), 1)

    # jitted forward (featurize + model apply)
    @jax.jit
    def fwd(params, raw, length):
        feats, mask = featurize(raw, length)
        return model.apply(params, feats, mask,
                           deterministic=True)["pred_boxes"]

    out["forward_ms"] = round(
        _timeit(fwd, state.params, batch["raw"], batch["length"]), 1)

    # the 4 recurrence passes alone, at the encoder's stream dtype
    H = cfg.model.d_model // 2
    sd = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    xg = jnp.asarray(
        rng.normal(size=(B, L, 3 * H)).astype(np.float32)).astype(sd)
    w_hh = jnp.asarray(rng.normal(size=(H, 3 * H)).astype(np.float32) * 0.05)
    b_hh = jnp.zeros((3 * H,), jnp.float32)
    on_tpu = jax.devices()[0].platform == "tpu"

    @jax.jit
    def rec4(xg, w_hh, b_hh):
        y = jnp.float32(0.0)
        for rev in (False, True, False, True):
            y += gru_recurrence(xg, w_hh, b_hh, reverse=rev,
                                use_pallas=on_tpu).astype(jnp.float32).sum()
        return y

    out["recurrence4_fwd_ms"] = round(_timeit(rec4, xg, w_hh, b_hh), 1)

    @jax.jit
    def rec4_grad(xg, w_hh, b_hh):
        return jax.grad(
            lambda a: rec4(a, w_hh, b_hh))(xg).astype(jnp.float32).sum()

    out["recurrence4_fwdbwd_ms"] = round(_timeit(rec4_grad, xg, w_hh, b_hh),
                                         1)

    # Hungarian matching + set loss at the step shapes
    pb = jnp.asarray(rng.normal(size=(B, M, 6)).astype(np.float32))
    pc = jnp.asarray(rng.normal(size=(B, M, 4)).astype(np.float32))

    @jax.jit
    def loss_only(pb, pc):
        outd = {"pred_boxes": jnp.abs(pb), "pred_classes": pc}
        tgt = {"boxes": batch["boxes"], "labels": batch["labels"],
               "valid_mask": batch["valid"]}
        return set_criterion(outd, tgt)["total_loss"]

    out["loss_hungarian_ms"] = round(_timeit(loss_only, pb, pc), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
