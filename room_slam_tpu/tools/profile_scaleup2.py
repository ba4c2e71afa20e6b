"""Scan-amortized decomposition of the scale-up train step (round 5).

The round-4 decomposition (tools/profile_scaleup.py) timed each
component as a SOLO dispatch, so every row carries one tunnel round-trip
plus a fresh-input perturbation pass (~40 ms) — larger than most of the
components being measured, which made the sub-40 ms rows (criterion,
front end, dW einsum) unreadable and the "bwd walk = 8 us/step"
derivation suspect: the solo BPTT kernel bench
(results/r4_bwd_kernel_bench.json) puts the kernel itself at ~12 ms
(2.4 us/step), AT its HBM+FLOP floor.

This tool times every row as ONE ``lax.scan`` of K iterations with a
per-iteration input perturbation (10 MB elementwise, ~0.03 ms — three
orders below the old overhead) and a single scalar readback, so each row
resolves to ~0.5 ms. Ablation pairs then decompose the step exactly:

    optimizer        = full_step      - grads_only
    criterion total  = grads_only     - model_fwd_bwd
    model backward   = model_fwd_bwd  - model_fwd
    model forward    = model_fwd      - frontend
    front end        = frontend (augment + featurize)

plus kernel-level rows for one BiGRU layer's fused recurrence core
(fwd with/without residuals, fwd+BPTT via the custom VJP, the dW
einsum and the h_prev shift that the VJP adds around the kernel).

Run on the real chip:
    python3 -m room_slam_tpu.tools.profile_scaleup2 \
        --output results/r5_scaleup_profile.json
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seq", type=int, default=5000)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--kernels", action="store_true",
                    help="also time the Pallas core rows (wrapping the "
                         "fused kernels in the timing scan is heavy on "
                         "the remote-compile service; the solo kernel "
                         "decomposition lives in "
                         "results/r4_bwd_kernel_bench.json)")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    from room_slam_tpu.config import (DataConfig, ExperimentConfig,
                                      ModelConfig, TrainConfig)
    from room_slam_tpu.data.augment import make_augment_batch
    from room_slam_tpu.data.features import featurize
    from room_slam_tpu.models.factory import build_model, init_params
    from room_slam_tpu.ops.losses import set_criterion
    from room_slam_tpu.train.loop import (TrainState, _loss_weight_dict,
                                          batch_to_sample, make_optimizer,
                                          make_train_steps)

    jax.config.update("jax_default_matmul_precision", "bfloat16")
    B, L, M, K = args.batch, args.seq, 32, args.k
    cfg = ExperimentConfig(
        data=DataConfig(max_trace_len=L, max_colliders=M),
        model=ModelConfig(model_type="bigru", d_model=512, num_queries=M,
                          compute_dtype="bfloat16"),
        train=TrainConfig(batch_size=B, rng_impl="rbg"),
    )
    model = build_model(cfg.model)
    params = init_params(model, cfg.model, seq_len=256, batch=B)
    tx = make_optimizer(cfg)

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
    aug_fn = make_augment_batch(cfg.data)
    lw = _loss_weight_dict(cfg)

    def front(i, akey):
        sample = batch_to_sample(
            {**batch, "raw": batch["raw"] + i.astype(jnp.float32) * 1e-6})
        sample = aug_fn(akey, sample, batch["rotation_k"])
        feats, mask = featurize(sample.raw, sample.length)
        targets = {"boxes": sample.boxes, "labels": sample.labels,
                   "valid_mask": sample.valid}
        return feats, mask, targets

    def loss_fn(params, feats, mask, targets, dkey):
        out = model.apply(params, feats, mask, deterministic=False,
                          rngs={"dropout": dkey})
        losses = set_criterion(out, targets, batch["weight"], lw)
        return losses["total_loss"]

    def out_sum_fn(params, feats, mask, dkey):
        out = model.apply(params, feats, mask, deterministic=False,
                          rngs={"dropout": dkey})
        return sum(jnp.sum(v.astype(jnp.float32)) for v in out.values())

    rows = {}

    def scan_time(name, body_fn, seed):
        """body_fn(i, key) -> scalar; one scan of K iterations, timed on
        the second (fresh-keys) dispatch with a scalar readback."""
        @jax.jit
        def run(keys):
            def body(acc, ik):
                i, k = ik
                return acc + body_fn(i, k), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0), (jnp.arange(K), keys))
            return acc
        k1 = jax.random.split(
            jax.random.key(seed, impl=cfg.train.rng_impl), K)
        float(run(k1))                               # compile + warm
        k2 = jax.random.split(
            jax.random.key(seed + 1000, impl=cfg.train.rng_impl), K)
        t0 = time.perf_counter()
        float(run(k2))
        ms = (time.perf_counter() - t0) / K * 1000.0
        rows[name] = round(ms, 2)
        print(f"{name:24s} {ms:8.2f} ms")
        return ms

    # --- full production step (scan of the real donated train step).
    # The step donates its state, so it gets its own COPY of the params —
    # the original tree stays alive for the ablation rows below.
    pcopy = jax.tree_util.tree_map(jnp.copy, params)
    state = TrainState(pcopy, tx.init(pcopy), jnp.asarray(0))
    run_steps = make_train_steps(model, tx, cfg, augment=True)
    keys = jax.random.split(
        jax.random.key(7, impl=cfg.train.rng_impl), 3 * K)
    state, tl = run_steps(state, batch, keys[:K])
    float(tl[-1])
    t0 = time.perf_counter()
    state, tl = run_steps(state, batch, keys[K:2 * K])
    float(tl[-1])
    rows["full_step"] = round((time.perf_counter() - t0) / K * 1000, 2)
    print(f"{'full_step':24s} {rows['full_step']:8.2f} ms")

    def body_grads(i, key):
        akey, dkey = jax.random.split(key)
        feats, mask, targets = front(i, akey)
        g = jax.grad(loss_fn)(params, feats, mask, targets, dkey)
        # consume EVERY grad leaf: reducing only a subset lets XLA
        # dead-code-eliminate the other layers' dW einsums and the row
        # undercounts the backward
        return sum(jnp.sum(jnp.abs(v)) for v in
                   jax.tree_util.tree_leaves(g))

    def body_fwd_loss(i, key):
        akey, dkey = jax.random.split(key)
        feats, mask, targets = front(i, akey)
        return loss_fn(params, feats, mask, targets, dkey)

    def body_model_fwd(i, key):
        akey, dkey = jax.random.split(key)
        feats, mask, _ = front(i, akey)
        return out_sum_fn(params, feats, mask, dkey)

    def body_model_fwd_bwd(i, key):
        akey, dkey = jax.random.split(key)
        feats, mask, _ = front(i, akey)
        g = jax.grad(out_sum_fn)(params, feats, mask, dkey)
        return sum(jnp.sum(jnp.abs(v)) for v in
                   jax.tree_util.tree_leaves(g))

    def body_front(i, key):
        feats, mask, _ = front(i, key)
        return jnp.sum(feats[:, 0, 0])

    scan_time("grads_only", body_grads, 1)
    scan_time("fwd_loss", body_fwd_loss, 2)
    scan_time("model_fwd", body_model_fwd, 3)
    scan_time("model_fwd_bwd", body_model_fwd_bwd, 4)
    scan_time("frontend", body_front, 5)

    # --- kernel-level rows: one BiGRU layer's fused recurrence core at
    # the production per-direction shape [B, L, 3H], H = d/2
    if not args.kernels:
        emit(rows, args)
        return
    from room_slam_tpu.ops.gru_pallas import (_bigru_core,
                                              _bigru_fwd_pallas)

    H = cfg.model.d_model // 2
    xg0 = jnp.asarray(rng.normal(size=(B, L, 3 * H)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    wf = jnp.asarray(
        rng.normal(size=(H, 3 * H)).astype(np.float32)) * 0.05
    bf = jnp.zeros((3 * H,), jnp.float32)

    def body_core_res(i, key):
        xg = xg0 + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
        outs = _bigru_fwd_pallas(xg, xg, wf, bf, wf, bf,
                                 save_residuals=True)
        return jnp.sum(outs[0][0, 0].astype(jnp.float32))

    def body_core_nores(i, key):
        xg = xg0 + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
        outs = _bigru_fwd_pallas(xg, xg, wf, bf, wf, bf,
                                 save_residuals=False)
        return jnp.sum(outs[0][0, 0].astype(jnp.float32))

    def core_sum(xg):
        ysf, ysb = _bigru_core(xg, xg, wf, bf, wf, bf)
        return (jnp.sum(ysf.astype(jnp.float32))
                + jnp.sum(ysb.astype(jnp.float32)))

    def body_core_fwdbwd(i, key):
        xg = xg0 + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
        g = jax.grad(lambda x: core_sum(x))(xg)
        return jnp.sum(g[0, 0].astype(jnp.float32))

    # the two big non-kernel pieces the VJP adds around the BPTT kernel
    ys_tm = jnp.asarray(rng.normal(size=(L, B, H)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    dxg_tm = jnp.asarray(rng.normal(size=(L, B, 3 * H)).astype(np.float32)
                         ).astype(jnp.bfloat16)

    def body_dw_einsum(i, key):
        h_prev = ys_tm + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
        dw2 = jnp.einsum("nbh,nbg->hg", h_prev, dxg_tm[..., :2 * H],
                         preferred_element_type=jnp.float32)
        dwn = jnp.einsum("nbh,nbg->hg", h_prev, dxg_tm[..., 2 * H:],
                         preferred_element_type=jnp.float32)
        return jnp.sum(dw2[0]) + jnp.sum(dwn[0])

    def body_hprev(i, key):
        ys = ys_tm + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
        hp = jnp.concatenate(
            [jnp.zeros_like(ys[:1]), ys[:-1]], axis=0)
        return jnp.sum(hp[0, 0].astype(jnp.float32))

    scan_time("bigru_core_fwd_res", body_core_res, 6)
    scan_time("bigru_core_fwd_nores", body_core_nores, 7)
    scan_time("bigru_core_fwdbwd", body_core_fwdbwd, 8)
    scan_time("dw_einsum_2x", body_dw_einsum, 9)
    scan_time("hprev_build", body_hprev, 10)

    emit(rows, args)


def emit(rows, args):
    import jax
    derived = {
        "optimizer_ms": round(rows["full_step"] - rows["grads_only"], 2),
        "criterion_total_ms": round(
            rows["grads_only"] - rows["model_fwd_bwd"], 2),
        "criterion_fwd_ms": round(rows["fwd_loss"] - rows["model_fwd"], 2),
        "model_bwd_ms": round(
            rows["model_fwd_bwd"] - rows["model_fwd"], 2),
        "model_fwd_net_ms": round(rows["model_fwd"] - rows["frontend"], 2),
        "frontend_ms": rows["frontend"],
    }
    if "bigru_core_fwdbwd" in rows:
        derived["core_bwd_walk_ms"] = round(
            rows["bigru_core_fwdbwd"] - rows["bigru_core_fwd_res"], 2)
        derived["residual_store_ms"] = round(
            rows["bigru_core_fwd_res"] - rows["bigru_core_fwd_nores"], 2)
    print("\nderived:")
    for k, v in derived.items():
        print(f"  {k:28s} {v}")
    out = {"config": {"batch": args.batch, "seq": args.seq,
                      "d_model": 512,
                      "stream_dtype": "bfloat16", "rng_impl": "rbg",
                      "k_scan": args.k,
                      "platform": jax.devices()[0].platform},
           "measured_ms": rows, "derived": derived,
           "note": "every row is one lax.scan of k_scan iterations with "
                   "a per-iteration input perturbation and one scalar "
                   "readback — no per-row tunnel round-trip or "
                   "perturbation-pass bias (contrast r4_scaleup_profile)"}
    if args.output:
        with open(args.output, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
