"""Measured decomposition of the scale-up train step (VERDICT round-3 #5).

``bench.py --scaleup`` reports one number (170 ms/step, 30.6% MFU at
batch=128 seq=5000 d=512 BiGRU); ``bench.py``'s prose attributes the gap
above the ~115 ms compute+stream floor to the recurrence's serial
latency. This tool MEASURES the decomposition instead of asserting it:
each component of the step is timed in isolation at the exact production
shape, with the axon-tunnel timing discipline (fresh inputs per call —
the tunnel memoizes (executable, inputs); scalar readback to sync —
``block_until_ready`` returns before remote completion; >= 8 reps).

Components:

- ``full_step``          the production fused train step (the 170 ms)
- ``fwd_loss``           forward + criterion only (no backward/optimizer)
- ``aug_featurize``      augmentation + featurization front end
- ``criterion``          Hungarian + CE/L1/GIoU on frozen model outputs
- ``bigru_fwd_res``      one fused bidirectional recurrence walk, layer
                         shape, residuals saved (the training fwd config)
- ``bigru_fwd_nores``    same walk without residual stores (inference)
- ``bigru_fwdbwd``       recurrence fwd + reverse-time BPTT walk (via VJP)
- ``gate_matmul``        one input-side gate projection [B*N,512]@[512,768]
- ``elementwise_pass``   one [B,N,3H] HBM read+write pass (the cost of the
                         fresh-input perturbation, subtracted from the
                         kernel rows)

Derived rows: recurrence serial overhead per walk, the MXU+HBM floor
implied by the measured matmul rate, and where the 170 ms goes. Writes
one JSON artifact (``--output``); optionally captures a ``jax.profiler``
trace (``--trace DIR``) — works only if the axon backend exports device
events.

Run on the real chip: ``python3 -m room_slam_tpu.tools.profile_scaleup
--output results/r4_scaleup_profile.json``.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, args_fn, n=10, warmup=3, label=""):
    """Median-free simple mean over n timed reps; args_fn(i) must return
    FRESH inputs (tunnel memoization) and fn must return an array whose
    first element we read back (tunnel sync)."""
    for i in range(warmup):
        out = fn(*args_fn(i))
        _ = float(jnp.ravel(out[0] if isinstance(out, tuple) else out)[0])
    t0 = time.perf_counter()
    for i in range(warmup, warmup + n):
        out = fn(*args_fn(i))
        _ = float(jnp.ravel(out[0] if isinstance(out, tuple) else out)[0])
    ms = (time.perf_counter() - t0) / n * 1000.0  # ms
    if label:
        print(f"  {label}: {ms:.2f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--output", default="results/r4_scaleup_profile.json")
    ap.add_argument("--trace", default=None,
                    help="also capture a jax.profiler trace here")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seq", type=int, default=5000,
                    help="production 5000; small values allow a CPU "
                         "smoke run (interpret-mode kernels)")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    from room_slam_tpu.config import (DataConfig, ExperimentConfig,
                                      ModelConfig, TrainConfig)
    from room_slam_tpu.data.augment import make_augment_batch
    from room_slam_tpu.data.features import featurize
    from room_slam_tpu.models.factory import build_model, init_params
    from room_slam_tpu.ops.gru_pallas import (_bigru_core, _bigru_fwd_pallas)
    from room_slam_tpu.ops.losses import set_criterion
    from room_slam_tpu.train.loop import (TrainState, _loss_weight_dict,
                                          batch_to_sample, make_optimizer,
                                          make_train_step)
    from room_slam_tpu.utils.profiling import device_trace

    jax.config.update("jax_default_matmul_precision", "bfloat16")

    B, L, M, D = args.batch, args.seq, 32, 512
    H = D // 2
    interp = jax.default_backend() != "tpu"
    cfg = ExperimentConfig(
        data=DataConfig(max_trace_len=L, max_colliders=M),
        model=ModelConfig(model_type="bigru", d_model=D, num_queries=M,
                          compute_dtype="bfloat16"),
        train=TrainConfig(batch_size=B, rng_impl="rbg"),
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
    n_keys = 4 * (args.reps + 3) + 16
    keys = jax.random.split(
        jax.random.key(0, impl=cfg.train.rng_impl), n_keys)
    jax.block_until_ready(keys)

    rows = {}

    # --- full production step (state threads -> inputs always fresh)
    st = [state]

    def run_step(k):
        st[0], losses = train_step(st[0], batch, k)
        return losses["total_loss"]

    rows["full_step_ms"] = _timeit(
        lambda k: run_step(k), lambda i: (keys[i],), n=args.reps, label="full_step")

    # --- forward + criterion only (no backward, no optimizer)
    aug_fn = make_augment_batch(cfg.data)
    lw = _loss_weight_dict(cfg)

    @jax.jit
    def fwd_loss(params, batch, key):
        k1, k2 = jax.random.split(key)
        sample = aug_fn(k1, batch_to_sample(batch), batch["rotation_k"])
        feats, mask = featurize(sample.raw, sample.length)
        out = model.apply(params, feats, mask, deterministic=False,
                          rngs={"dropout": k2})
        targets = {"boxes": sample.boxes, "labels": sample.labels,
                   "valid_mask": sample.valid}
        losses = set_criterion(out, targets, batch["weight"], lw)
        return losses["total_loss"]

    # train_step donates its state -> the original `state` buffers are
    # deleted after the full_step rows; use the live threaded state
    params_live = st[0].params
    rows["fwd_loss_ms"] = _timeit(
        lambda k: fwd_loss(params_live, batch, k),
        lambda i: (keys[args.reps + 3 + i],), n=args.reps, label="fwd_loss")

    # --- augmentation + featurize front end only
    @jax.jit
    def front(batch, key):
        sample = aug_fn(key, batch_to_sample(batch), batch["rotation_k"])
        feats, mask = featurize(sample.raw, sample.length)
        return feats

    rows["aug_featurize_ms"] = _timeit(
        lambda k: front(batch, k),
        lambda i: (keys[2 * (args.reps + 3) + i],), n=args.reps, label="aug_featurize")

    # --- criterion (Hungarian + losses) on frozen outputs; key-salted
    # boxes defeat memoization
    feats0, mask0 = jax.jit(featurize)(batch["raw"], batch["length"])
    out0 = jax.jit(
        lambda p, f, m: model.apply(p, f, m, deterministic=True))(
            params_live, feats0, mask0)
    out0 = {k: v for k, v in out0.items() if v is not None}
    targets0 = {"boxes": batch["boxes"], "labels": batch["labels"],
                "valid_mask": batch["valid"]}

    @jax.jit
    def crit(out, key):
        salt = jax.random.uniform(key, (), minval=0.999, maxval=1.001)
        out = dict(out, pred_boxes=out["pred_boxes"] * salt)
        return set_criterion(out, targets0, batch["weight"],
                             lw)["total_loss"]

    rows["criterion_ms"] = _timeit(
        lambda k: crit(out0, k),
        lambda i: (keys[3 * (args.reps + 3) + i],), n=args.reps, label="criterion")

    # --- recurrence kernel walks at the exact layer shape.
    # Fresh inputs per call via a runtime scalar multiply; its HBM pass is
    # measured separately (elementwise_pass) and reported alongside.
    H3 = 3 * H
    xg0 = jax.jit(lambda k: 0.1 * jax.random.normal(
        k, (B, L, H3), jnp.bfloat16))(jax.random.key(7))
    jax.block_until_ready(xg0)
    w_hh = jnp.asarray(rng.normal(size=(H, H3)) * 0.05, jnp.float32)
    b_hh = jnp.zeros((H3,), jnp.float32)
    cs = jnp.linspace(0.99, 1.01, n_keys)

    # NOTE: the big activations (xg0 ~1 GB, xin ~0.7 GB) must be jit
    # ARGUMENTS, not closure captures — a closed-over concrete array is
    # inlined into the HLO as a literal and the axon remote-compile
    # endpoint rejects the >1 GB request body (HTTP 413).
    @jax.jit
    def ew_pass(xg, c):
        return xg * c

    rows["elementwise_pass_ms"] = _timeit(
        ew_pass, lambda i: (xg0, cs[i]), n=args.reps, label="elementwise_pass")

    @jax.jit
    def k_fwd_res(xg, c):
        x = xg * c
        ysf, ysb, gf, hnf, gb, hnb = _bigru_fwd_pallas(
            x, x, w_hh, b_hh, w_hh, b_hh, interpret=interp,
            save_residuals=True)
        return ysf

    rows["bigru_fwd_res_ms"] = _timeit(
        k_fwd_res, lambda i: (xg0, cs[i]), n=args.reps, label="bigru_fwd_res")

    @jax.jit
    def k_fwd_nores(xg, c):
        x = xg * c
        ysf, ysb, *_ = _bigru_fwd_pallas(
            x, x, w_hh, b_hh, w_hh, b_hh, interpret=interp,
            save_residuals=False)
        return ysf

    rows["bigru_fwd_nores_ms"] = _timeit(
        k_fwd_nores, lambda i: (xg0, cs[i]), n=args.reps, label="bigru_fwd_nores")

    @jax.jit
    def k_fwdbwd(xg, c):
        x = xg * c

        def f(xf, xb, w1, bb1, w2, bb2):
            ysf, ysb = _bigru_core(xf, xb, w1, bb1, w2, bb2, interp)
            return jnp.sum(ysf.astype(jnp.float32)) + \
                jnp.sum(ysb.astype(jnp.float32))

        g = jax.grad(f, argnums=(0, 2))(x, x, w_hh, b_hh, w_hh, b_hh)
        return g[0]

    rows["bigru_fwdbwd_ms"] = _timeit(
        k_fwdbwd, lambda i: (xg0, cs[i]), n=args.reps, label="bigru_fwdbwd")

    # --- one input-side gate projection at the production shape
    xin = jax.jit(lambda k: 0.1 * jax.random.normal(
        k, (B * L, D), jnp.bfloat16))(jax.random.key(8))
    w_in = jnp.asarray(rng.normal(size=(D, H3)) * 0.05, jnp.bfloat16)

    @jax.jit
    def gate_mm(xi, c):
        return jnp.dot(xi * c, w_in,
                       preferred_element_type=jnp.float32)

    rows["gate_matmul_ms"] = _timeit(gate_mm, lambda i: (xin, cs[i]),
                                     n=args.reps, label="gate_matmul")

    # --- derived decomposition
    ew = rows["elementwise_pass_ms"]
    fwd_res = rows["bigru_fwd_res_ms"] - ew
    fwd_nores = rows["bigru_fwd_nores_ms"] - ew
    fwdbwd = rows["bigru_fwdbwd_ms"] - ew
    mm = rows["gate_matmul_ms"] - ew
    gate_flops = 2.0 * B * L * D * H3
    derived = {
        # per-walk times net of the perturbation pass
        "recurrence_fwd_walk_ms": round(fwd_res, 2),
        "recurrence_fwd_walk_inference_ms": round(fwd_nores, 2),
        "recurrence_bwd_walk_ms": round(fwdbwd - fwd_res, 2),
        "residual_store_cost_ms": round(fwd_res - fwd_nores, 2),
        # 2 layers x (fwd walk + bwd walk) in the real step
        "recurrence_total_2layers_ms": round(2 * fwdbwd, 2),
        "backward_etc_ms": round(
            rows["full_step_ms"] - rows["fwd_loss_ms"], 2),
        # None when the matmul is cheaper than the perturbation pass —
        # i.e. unmeasurable under the tunnel round-trip noise floor
        "gate_matmul_tflops": (round(gate_flops / (mm / 1e3) / 1e12, 1)
                               if mm > 0.5 else None),
        "per_kernel_timestep_us": {
            "fwd": round(fwd_res / L * 1e3, 3),
            "fwd_nores": round(fwd_nores / L * 1e3, 3),
            "bwd": round((fwdbwd - fwd_res) / L * 1e3, 3),
        },
    }

    result = {
        "config": {"batch": B, "seq": L, "d_model": D,
                   "stream_dtype": "bfloat16", "rng_impl": "rbg",
                   "platform": jax.devices()[0].platform},
        "measured_ms": {k: round(v, 2) for k, v in rows.items()},
        "derived": derived,
        "note": ("kernel rows are net of elementwise_pass_ms (the fresh-"
                 "input perturbation's own HBM pass); recurrence_total "
                 "assumes the step's 2 BiGRU layers each run one fwd and "
                 "one bwd walk at this shape"),
    }

    if args.trace:
        with device_trace(args.trace):
            for i in range(3):
                st[0], losses = train_step(st[0], batch, keys[-1 - i])
            jax.block_until_ready(losses["total_loss"])
        result["trace_dir"] = args.trace

    print(json.dumps(result, indent=1))
    with open(args.output, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
