"""Micro-benchmark of the fused BiGRU BPTT kernel (the MFU bottleneck).

``results/r4_scaleup_profile.json`` decomposed the 170 ms scale-up step:
the recurrence accounts for ~115 ms, and the BPTT walk (45 ms net) runs
~3.7x above its HBM+MXU floor (~12 ms) while the forward walk is AT its
floor. This tool isolates where those 45 ms go:

- ``bwd_kernel``        _bigru_bwd_pallas alone (the Pallas BPTT walk)
- ``bwd_kernel@BBxCC``  the same under a swept (batch_tile, chunk) plan
- ``dw_einsum``         the dW_hh reduction done outside the kernel
- ``hprev_build``       the shifted-ys concat feeding the kernel
- ``full_vjp``          the complete _bigru_core backward for reference

Axon-tunnel timing discipline throughout (fresh inputs via a runtime
scalar multiply, scalar readback to sync, big tensors as jit ARGUMENTS —
closure-captured arrays are inlined into HLO and the remote-compile
endpoint rejects >1 GB bodies).

Run: ``python3 -m room_slam_tpu.tools.bench_bigru_bwd``.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, args_fn, n=8, warmup=2, label=""):
    for i in range(warmup):
        out = fn(*args_fn(i))
        _ = float(jnp.ravel(out[0] if isinstance(out, (tuple, list))
                            else out)[0])
    t0 = time.perf_counter()
    for i in range(warmup, warmup + n):
        out = fn(*args_fn(i))
        _ = float(jnp.ravel(out[0] if isinstance(out, (tuple, list))
                            else out)[0])
    ms = (time.perf_counter() - t0) / n * 1000.0
    print(f"  {label}: {ms:.2f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--output", default="results/r4_bwd_kernel_bench.json")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seq", type=int, default=5000)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--tiles", default="128x4,64x8,64x4,32x16,32x8,16x32",
                    help="comma list of BBxCHUNK plans to sweep for the "
                         "bwd kernel (the auto plan picks 128x4)")
    args = ap.parse_args()

    from room_slam_tpu.ops.gru_pallas import (_bigru_bwd_pallas,
                                              _bigru_core)

    jax.config.update("jax_default_matmul_precision", "bfloat16")
    interp = jax.default_backend() != "tpu"

    B, N, H = args.batch, args.seq, args.hidden
    H3 = 3 * H
    dt = jnp.bfloat16

    @jax.jit
    def gen(k):
        ks = jax.random.split(k, 8)
        mk = lambda i, *s: 0.1 * jax.random.normal(ks[i], s, dt)  # noqa
        return dict(
            gf=jax.nn.sigmoid(mk(0, N, B, H3)), hnf=mk(1, N, B, H),
            hpf=mk(2, N, B, H), dyf=mk(3, B, N, H),
            gb=jax.nn.sigmoid(mk(4, N, B, H3)), hnb=mk(5, N, B, H),
            hpb=mk(6, N, B, H), dyb=mk(7, B, N, H))

    t = gen(jax.random.key(0, impl="rbg"))
    jax.block_until_ready(t)
    rng = np.random.default_rng(0)
    w_f = jnp.asarray(rng.normal(size=(H, H3)) * 0.05, jnp.float32)
    w_b = jnp.asarray(rng.normal(size=(H, H3)) * 0.05, jnp.float32)
    b_f = jnp.zeros((H3,), jnp.float32)
    b_b = jnp.zeros((H3,), jnp.float32)
    cs = jnp.linspace(0.99, 1.01, 4 * (args.reps + 2) + 8)

    rows = {}

    # --- the perturbation pass baseline (1 read + 1 write of gf)
    @jax.jit
    def ew(gf, c):
        return gf * c

    rows["elementwise_pass_ms"] = _timeit(
        ew, lambda i: (t["gf"], cs[i]), n=args.reps, label="elementwise_pass")

    # --- the bwd kernel under swept tile plans
    def run_tile(bb, chunk):
        @jax.jit
        def k(gf, hnf, hpf, dyf, gb, hnb, hpb, dyb, c):
            return _bigru_bwd_pallas(
                w_f, w_b, gf * c, hnf, hpf, dyf, gb, hnb, hpb, dyb,
                interpret=interp, tile=(bb, chunk))[0]

        return _timeit(
            k, lambda i: (t["gf"], t["hnf"], t["hpf"], t["dyf"],
                          t["gb"], t["hnb"], t["hpb"], t["dyb"], cs[i]),
            n=args.reps, label=f"bwd_kernel@{bb}x{chunk}")

    for spec in args.tiles.split(","):
        bb, chunk = (int(x) for x in spec.split("x"))
        rows[f"bwd_kernel@{bb}x{chunk}_ms"] = run_tile(bb, chunk)

    # --- kernel VARIANT: split the dgates_hh @ wt matmul into three
    # [bb,H]@[H,H] accumulated matmuls, removing the lane-axis concat
    # from the serial dh dependency chain (the concats for the OUTPUT
    # stores stay — they are off the critical path)
    import functools as _ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from room_slam_tpu.ops.rnn_pallas import _pad_tm

    def _bwd_kernel_split(wtf_ref, wtb_ref, gf_ref, hnf_ref, hpf_ref,
                          dyf_ref, gb_ref, hnb_ref, hpb_ref, dyb_ref,
                          dxf_ref, dhnf_ref, dxb_ref, dhnb_ref,
                          dhf_s, dhb_s, *, chunk: int, hidden: int):
        t_step = pl.program_id(1)

        @pl.when(t_step == 0)
        def _():
            dhf_s[:] = jnp.zeros_like(dhf_s)
            dhb_s[:] = jnp.zeros_like(dhb_s)

        Hh = hidden

        def cell_bwd(wt, g, hn, hp, dy, dh_in):
            r = g[:, :Hh]
            z = g[:, Hh:2 * Hh]
            n = g[:, 2 * Hh:]
            dh_t = dy + dh_in
            dz = dh_t * (hp - n)
            dn_pre = dh_t * (1.0 - z) * (1.0 - n * n)
            dr = dn_pre * hn
            dhn = dn_pre * r
            dz_pre = dz * z * (1.0 - z)
            dr_pre = dr * r * (1.0 - r)
            wd = wt.dtype
            dh_out = (dh_t * z
                      + jnp.dot(dr_pre.astype(wd), wt[:Hh],
                                preferred_element_type=jnp.float32)
                      + jnp.dot(dz_pre.astype(wd), wt[Hh:2 * Hh],
                                preferred_element_type=jnp.float32)
                      + jnp.dot(dhn.astype(wd), wt[2 * Hh:],
                                preferred_element_type=jnp.float32))
            return dr_pre, dz_pre, dn_pre, dhn, dh_out

        wtf, wtb = wtf_ref[:], wtb_ref[:]
        for tt in range(chunk - 1, -1, -1):
            drf, dzf, dnf, dhnf, dhf = cell_bwd(
                wtf, gf_ref[tt].astype(jnp.float32),
                hnf_ref[tt].astype(jnp.float32),
                hpf_ref[tt].astype(jnp.float32),
                dyf_ref[tt].astype(jnp.float32), dhf_s[:])
            drb, dzb, dnb, dhnb, dhb = cell_bwd(
                wtb, gb_ref[tt].astype(jnp.float32),
                hnb_ref[tt].astype(jnp.float32),
                hpb_ref[tt].astype(jnp.float32),
                dyb_ref[tt].astype(jnp.float32), dhb_s[:])
            dxf_ref[tt] = jnp.concatenate(
                [drf, dzf, dnf], axis=-1).astype(dxf_ref.dtype)
            dhnf_ref[tt] = dhnf.astype(dhnf_ref.dtype)
            dxb_ref[tt] = jnp.concatenate(
                [drb, dzb, dnb], axis=-1).astype(dxb_ref.dtype)
            dhnb_ref[tt] = dhnb.astype(dhnb_ref.dtype)
            dhf_s[:] = dhf
            dhb_s[:] = dhb

    def run_split(bb, chunk):
        @jax.jit
        def k(gf, hnf, hpf, dyf, gb, hnb, hpb, dyb, c):
            gfp = _pad_tm(gf * c, chunk, bb)
            pads = [_pad_tm(a, chunk, bb)
                    for a in (hnf, hpf, dyf, gb, hnb, hpb, dyb)]
            Np, Bp = gfp.shape[0], gfp.shape[1]
            nc = Np // chunk
            rev = lambda b2, i: (nc - 1 - i, b2, 0)  # noqa: E731
            kern = _ft.partial(_bwd_kernel_split, chunk=chunk, hidden=H)
            wspec = pl.BlockSpec((H3, H), lambda b2, i: (0, 0),
                                 memory_space=pltpu.VMEM)
            g3 = pl.BlockSpec((chunk, bb, H3), rev,
                              memory_space=pltpu.VMEM)
            g1 = pl.BlockSpec((chunk, bb, H), rev,
                              memory_space=pltpu.VMEM)
            out = pl.pallas_call(
                kern,
                grid=(Bp // bb, nc),
                in_specs=[wspec, wspec, g3, g1, g1, g1, g3, g1, g1, g1],
                out_specs=[g3, g1, g3, g1],
                out_shape=[
                    jax.ShapeDtypeStruct((Np, Bp, H3), dt),
                    jax.ShapeDtypeStruct((Np, Bp, H), dt),
                    jax.ShapeDtypeStruct((Np, Bp, H3), dt),
                    jax.ShapeDtypeStruct((Np, Bp, H), dt),
                ],
                scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32),
                                pltpu.VMEM((bb, H), jnp.float32)],
                interpret=interp,
            )(jnp.asarray(w_f.T).astype(dt), jnp.asarray(w_b.T).astype(dt),
              gfp, *pads)
            return out[0]

        return _timeit(
            k, lambda i: (t["gf"], t["hnf"], t["hpf"], dyf_t,
                          t["gb"], t["hnb"], t["hpb"], dyb_t, cs[i]),
            n=args.reps, label=f"bwd_split@{bb}x{chunk}")

    dyf_t = jax.jit(lambda a: jnp.swapaxes(a, 0, 1))(t["dyf"])
    dyb_t = jax.jit(lambda a: jnp.swapaxes(a, 0, 1))(t["dyb"])
    jax.block_until_ready((dyf_t, dyb_t))

    for spec in args.tiles.split(","):
        bb, chunk = (int(x) for x in spec.split("x"))
        rows[f"bwd_split@{bb}x{chunk}_ms"] = run_split(bb, chunk)

    # --- the dW einsum at the real shape (both directions)
    @jax.jit
    def dw(hpf, gf, c):
        d = jnp.einsum("nbh,nbg->hg", hpf * c, gf,
                       preferred_element_type=jnp.float32)
        return d

    rows["dw_einsum_ms"] = _timeit(
        dw, lambda i: (t["hpf"], t["gf"], cs[i]), n=args.reps,
        label="dw_einsum(one dir)")

    # --- h_prev build (shifted concat) at the real shape
    @jax.jit
    def hp(hnf, c):
        x = hnf * c
        return jnp.concatenate(
            [jnp.zeros((1, B, H), x.dtype), x[:-1]], axis=0)

    rows["hprev_build_ms"] = _timeit(
        hp, lambda i: (t["hnf"], cs[i]), n=args.reps,
        label="hprev_build(one dir)")

    # --- the complete library backward (kernel + hprev + dW/db) with
    # residuals as jit ARGUMENTS — core_bwd net minus
    # (bwd_kernel + 2x dw + 2x hprev) is the remaining materialization
    # overhead of the VJP wrapper (residuals are time-major end-to-end
    # since the time-major-ys VJP change)
    from room_slam_tpu.ops.gru_pallas import _bigru_core_bwd

    @jax.jit
    def core_bwd(ysf_t, ysb_t, gf, hnf, gb, hnb, dyf, dyb, c):
        res = (w_f, w_b, ysf_t * c, ysb_t, gf, hnf, gb, hnb)
        return _bigru_core_bwd(interp, res, (dyf, dyb))[0]

    rows["core_bwd_ms"] = _timeit(
        core_bwd, lambda i: (t["hnf"], t["hnb"], t["gf"], t["hnf"],
                             t["gb"], t["hnb"], t["dyf"], t["dyb"], cs[i]),
        n=args.reps, label="core_bwd")

    # --- full VJP for reference
    @jax.jit
    def vjp_full(xg, c):
        x = xg * c

        def f(xf, xb, w1, bb1, w2, bb2):
            ysf, ysb = _bigru_core(xf, xb, w1, bb1, w2, bb2, interp)
            return (jnp.sum(ysf.astype(jnp.float32))
                    + jnp.sum(ysb.astype(jnp.float32)))

        return jax.grad(f, argnums=(0, 2))(x, x, w_f, b_f, w_b, b_b)[0]

    xg_bm = jnp.swapaxes(t["gf"], 0, 1)  # [B, N, 3H]
    try:
        rows["full_vjp_ms"] = _timeit(
            vjp_full, lambda i: (xg_bm, cs[i]), n=args.reps,
            label="full_vjp")
    except Exception as e:  # OOM at the biggest shape: keep the rows
        print(f"  full_vjp: SKIPPED ({type(e).__name__})", flush=True)
        rows["full_vjp_ms"] = None

    result = {
        "config": {"batch": B, "seq": N, "hidden": H,
                   "stream_dtype": "bfloat16",
                   "platform": jax.devices()[0].platform},
        "measured_ms": {k: (None if v is None else round(v, 2))
                        for k, v in rows.items()},
        "note": ("all rows include one tunnel round-trip + the fresh-input"
                 " perturbation pass; subtract elementwise_pass_ms for "
                 "net kernel time. bwd floor at this shape ~12 ms "
                 "(6.5 GB HBM traffic + 503 GFLOP)."),
    }
    print(json.dumps(result, indent=1))
    with open(args.output, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
