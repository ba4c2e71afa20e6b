"""Pallas TPU kernel for the LSTM recurrence.

The sequential part of an LSTM is tiny per step (h @ W_hh for a [B, H] state)
but runs N=500..5000 times. A generic ``lax.scan`` round-trips the carry and
per-step outputs through layout shuffles each iteration; this kernel instead:

- keeps the (h, c) carry resident in VMEM scratch across the whole sequence
  (scratch persists across sequential TPU grid steps),
- streams precomputed input gates ``xg = x @ W_ih + b`` from HBM in chunks of
  ``chunk`` timesteps, double-buffered automatically by the Pallas pipeline,
- unrolls ``chunk`` steps per grid invocation so the per-step MXU matmul
  [BB, H] x [H, 4H] issues back-to-back,
- tiles the BATCH over the outer grid dimension: each grid row walks one
  batch tile of BB rows through the whole sequence, re-initializing the
  carry at t=0. BB doubles as the number of MXU rows the recurrence matmul
  fills, so ``_tile_plan`` picks the largest BB whose double-buffered
  streams fit the ~16 MB VMEM (this is what lets batch 32/64/128 run at
  all — a single (B, chunk, 4H) block overflows VMEM past B=8 at H=256 —
  and what lifts the scale-up MFU: a [8, H] matmul uses 8 of the MXU's
  128 rows).

Streamed tensors inherit ``xg``'s dtype: feed bfloat16 ``xg`` (see
``ModelConfig.compute_dtype``) and the activations/residuals stream at half
the HBM traffic and VMEM footprint, doubling the feasible batch tile. The
carry and all in-kernel math stay float32.

Blocks are TIME-MAJOR ([chunk, bb, *]): each timestep's slice is then a
fully (sublane, lane)-tiled [bb, *] slab. The batch-major alternative puts
time on the sublane dim, so every per-timestep access touches 1 of 8
sublanes — measured ~2x kernel wall time at the scale-up shape. The
[B, N, *] <-> [N, B, *] transposes live inside the jitted wrappers (XLA
fuses them with the surrounding gate matmuls); residuals stay time-major
end-to-end.

Training support: the differentiated path's kernel also emits the activated
gates and cell states; a custom VJP consumes them in a second Pallas kernel
that runs reverse-time BPTT with the (dh, dc) carry in VMEM (the inference
path uses a light kernel without residual outputs). dW_hh stays outside as
one large MXU matmul over the saved hidden states.

The input-side matmul for the whole sequence stays OUTSIDE the kernel as one
large MXU matmul (see models/lstm.py) — that part XLA already does at
speed-of-light.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 32  # default timesteps per grid step (small tensors / interpret)

# VMEM working budget for the streamed blocks + resident weights. v5e has
# ~16 MB/core; leave headroom for Mosaic temporaries of the unrolled loop.
# 12 MB (vs the earlier conservative 10) is what lets batch 128 run as ONE
# 128-row tile at chunk=8 — full MXU row occupancy for the recurrence
# matmul instead of two half-filled 64-row tiles (measured compile-safe;
# the Mosaic temporaries of an 8-step unroll fit the remaining ~4 MB).
# 13 MB keeps the scale-up BiGRU BPTT on a single 128-row tile after the
# linearized walk added its stream-dtype coefficient arrays (the in-loop
# temporaries SHRANK — the elementwise chain moved into the preamble,
# whose H-sliced transients are bounded).
_VMEM_BUDGET = 13 << 20


def _tile_plan(batch: int, stream_cols: int, elt_bytes: int,
               w_bytes: int) -> Tuple[int, int]:
    """Pick (batch_tile, chunk) so resident weights + double-buffered
    streams fit VMEM, maximizing batch_tile (= MXU rows of the recurrence
    matmul), then chunk (pipeline granularity).

    ``stream_cols`` is the total per-timestep element count across every
    streamed input/output block (e.g. LSTM fwd with residuals: xg 4H +
    ys H + cs H + gates 4H = 10H).
    """
    bp = batch if batch < 8 else -(-batch // 8) * 8
    cands = [d for d in (128, 96, 64, 48, 32, 24, 16, 8)
             if d <= bp and bp % d == 0] or [bp]
    avail = max(_VMEM_BUDGET - w_bytes, 1 << 20)
    best = None
    for chunk in (32, 16, 8, 4):
        per_row = 2 * chunk * stream_cols * elt_bytes  # double-buffered
        for bb in cands:  # descending: first fit is the largest tile
            if bb * per_row <= avail:
                if best is None or (bb, chunk) > best:
                    best = (bb, chunk)
                break
    return best if best is not None else (cands[-1], 8)


def _pad_tm(x: jnp.ndarray, chunk: int, bb: int) -> jnp.ndarray:
    """Pad a TIME-MAJOR [N, B, C] tensor so N % chunk == 0, B % bb == 0."""
    n, b = x.shape[0], x.shape[1]
    pn, pb = (-n) % chunk, (-b) % bb
    if pn or pb:
        x = jnp.pad(x, ((0, pn), (0, pb), (0, 0)))
    return x


def _lstm_chunk_kernel(w_ref, xg_ref, ys_ref, cs_ref, gates_ref,
                       h_s, c_s, *, chunk: int, hidden: int,
                       save_residuals: bool = True):
    """One grid step: advance one batch tile over ``chunk`` timesteps.
    Blocks are TIME-MAJOR [chunk, bb, *] so each timestep's slice is a
    fully (sublane, lane)-tiled [bb, *] slab — batch-major [bb, chunk, *]
    puts time on the sublane dim and every slice then touches 1 of 8
    sublanes (measured ~2x kernel wall time at the scale-up shape).
    ``save_residuals=False`` (inference) skips the cell-state and gate
    outputs — 3x less HBM write traffic."""
    t_step = pl.program_id(1)  # time chunk within this batch tile

    @pl.when(t_step == 0)
    def _():
        h_s[:] = jnp.zeros_like(h_s)
        c_s[:] = jnp.zeros_like(c_s)

    w = w_ref[:]
    H = hidden
    for t in range(chunk):
        # stream-dtype w -> MXU bf16 path in mixed precision (f32 accum)
        g = xg_ref[t].astype(jnp.float32) + jnp.dot(
            h_s[:].astype(w.dtype), w, preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(g[:, :H])
        f = jax.nn.sigmoid(g[:, H:2 * H])
        gg = jnp.tanh(g[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(g[:, 3 * H:])
        c = f * c_s[:] + i * gg
        h = o * jnp.tanh(c)
        h_s[:] = h
        c_s[:] = c
        ys_ref[t] = h.astype(ys_ref.dtype)
        if save_residuals:
            cs_ref[t] = c.astype(cs_ref.dtype)
            gates_ref[t] = jnp.concatenate(
                [i, f, gg, o], axis=-1).astype(gates_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "save_residuals", "tile",
                     "ys_time_major"))
def _lstm_fwd_pallas(xg: jnp.ndarray, w_hh: jnp.ndarray,
                     interpret: bool = False, save_residuals: bool = True,
                     tile: Optional[Tuple[int, int]] = None,
                     ys_time_major: bool = False):
    """Forward-time recurrence. xg [B, N, 4H] -> ys [B, N, H] ([N, B, H]
    when ``ys_time_major`` — the kernel's native layout, used by the VJP
    so the BPTT path skips the batch<->time round trip); residuals
    (cs, gates) TIME-MAJOR [N, B, *] (consumed only by the BPTT kernel /
    dW einsum); None when save_residuals=False (inference)."""
    B, N0, H4 = xg.shape
    H = H4 // 4
    cols = (H4 + 6 * H) if save_residuals else (H4 + H)
    bb, chunk = tile or _tile_plan(
        B, cols, xg.dtype.itemsize, w_hh.size * w_hh.dtype.itemsize)
    xg_t = _pad_tm(jnp.swapaxes(xg, 0, 1), chunk, bb)  # [Np, Bp, 4H]
    N, Bp = xg_t.shape[0], xg_t.shape[1]
    grid = (Bp // bb, N // chunk)

    kernel = functools.partial(_lstm_chunk_kernel, chunk=chunk, hidden=H,
                               save_residuals=save_residuals)
    block_in = [
        pl.BlockSpec((H, H4), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, bb, H4), lambda b, i: (i, b, 0),
                     memory_space=pltpu.VMEM),
    ]
    ys_spec = pl.BlockSpec((chunk, bb, H), lambda b, i: (i, b, 0),
                           memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((bb, H), jnp.float32),
        pltpu.VMEM((bb, H), jnp.float32),
    ]
    # Recurrence weights travel in the stream dtype so the in-kernel dot
    # uses the MXU bf16 path in mixed-precision mode (f32 accumulate; the
    # f32 path is bit-identical to before).
    w_in = w_hh if xg.dtype == jnp.float32 else w_hh.astype(xg.dtype)
    if save_residuals:
        ys, cs, gates = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=block_in,
            out_specs=[
                ys_spec,
                pl.BlockSpec((chunk, bb, H), lambda b, i: (i, b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, bb, H4), lambda b, i: (i, b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N, Bp, H), xg.dtype),
                jax.ShapeDtypeStruct((N, Bp, H), xg.dtype),
                jax.ShapeDtypeStruct((N, Bp, H4), xg.dtype),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
        )(w_in, xg_t)
        if ys_time_major:
            return ys[:N0, :B], cs[:N0, :B], gates[:N0, :B]
        return (jnp.swapaxes(ys[:N0, :B], 0, 1), cs[:N0, :B],
                gates[:N0, :B])

    def kernel_light(w_ref, xg_ref, ys_ref, h_s, c_s):
        kernel(w_ref, xg_ref, ys_ref, None, None, h_s, c_s)

    ys = pl.pallas_call(
        kernel_light,
        grid=grid,
        in_specs=block_in,
        out_specs=ys_spec,
        out_shape=jax.ShapeDtypeStruct((N, Bp, H), xg.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(w_in, xg_t)
    if ys_time_major:
        return ys[:N0, :B], None, None
    return jnp.swapaxes(ys[:N0, :B], 0, 1), None, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _lstm_core(xg: jnp.ndarray, w_hh: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    # primal path (inference): light kernel, no residual outputs
    ys, _, _ = _lstm_fwd_pallas(xg, w_hh, interpret, save_residuals=False)
    return ys


def _lstm_core_fwd(xg, w_hh, interpret):
    # differentiated path: also emit cell states + activated gates for
    # BPTT; ys residual stays TIME-MAJOR (the BPTT path is time-major
    # end-to-end, so saving the public layout costs two transposes)
    ys_t, cs, gates = _lstm_fwd_pallas(xg, w_hh, interpret,
                                       save_residuals=True,
                                       ys_time_major=True)
    return jnp.swapaxes(ys_t, 0, 1), (w_hh, ys_t, cs, gates)


def _lstm_bwd_chunk_kernel(wt_ref, gates_ref, cs_ref, cprev_ref, dys_ref,
                           dg_ref, dh_s, dc_s, *, chunk: int, hidden: int):
    """Reverse-time BPTT chunk: carry (dh, dc) lives in VMEM scratch; the
    grid walks chunks back-to-front and steps walk timesteps in reverse."""
    t_step = pl.program_id(1)

    @pl.when(t_step == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = jnp.zeros_like(dc_s)

    wt = wt_ref[:]
    H = hidden
    # The BPTT cell is LINEAR in the cotangents (dh, dc): every
    # elementwise factor — including the tanh, the chain's costliest
    # VPU op — depends only on saved residuals, so the whole chunk's
    # coefficients vectorize OUTSIDE the serial walk. Per timestep the
    # chain is adds + muls + one MXU dot. Coefficients are built from
    # H-sized slices (bounded VMEM transients) and stored in the STREAM
    # dtype — the cotangents already stream at that precision (f32 in
    # full-precision mode, e.g. the golden tests).
    def _sl(i2):
        return gates_ref[:][..., i2 * H:(i2 + 1) * H].astype(jnp.float32)

    i = _sl(0)
    f = _sl(1)
    gg = _sl(2)
    o = _sl(3)
    tanh_c = jnp.tanh(cs_ref[:].astype(jnp.float32))
    cd = gates_ref.dtype
    c_c = (o * (1.0 - tanh_c * tanh_c)).astype(cd)  # dc_t += dh_t * c_c
    c4 = jnp.concatenate([                          # [c_ifg | c_o]
        gg * i * (1.0 - i),
        cprev_ref[:].astype(jnp.float32) * f * (1.0 - f),
        i * (1.0 - gg * gg),
        tanh_c * o * (1.0 - o),
    ], axis=-1).astype(cd)                          # [chunk, bb, 4H]
    for t in range(chunk - 1, -1, -1):
        dh_t = dys_ref[t].astype(jnp.float32) + dh_s[:]
        dc_t = dc_s[:] + dh_t * c_c[t].astype(jnp.float32)
        c4t = c4[t].astype(jnp.float32)
        dgates = jnp.concatenate(
            [dc_t, dc_t, dc_t, dh_t], axis=-1) * c4t
        dg_ref[t] = dgates.astype(dg_ref.dtype)
        dh_s[:] = jnp.dot(dgates.astype(wt.dtype), wt,
                          preferred_element_type=jnp.float32)
        dc_s[:] = dc_t * gates_ref[t][:, H:2 * H].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def _lstm_bwd_pallas(w_hh, gates, cs, c_prev, dys, interpret: bool = False,
                     tile: Optional[Tuple[int, int]] = None):
    """Fused reverse-time BPTT -> dgates TIME-MAJOR [N, B, 4H]. All
    activation arguments are time-major [N, B, *]; dys arrives batch-major
    [B, N, H] (the cotangent of the public output)."""
    N0, B, H = cs.shape
    H4 = 4 * H
    # gates + dgates (4H each) + cs + c_prev + dys, plus the chunk-wide
    # stream-dtype coefficient arrays of the linearized walk (c4 4H +
    # c_c H, single-buffered -> 5H/2 double-buffered-equivalents)
    cols = 2 * H4 + 3 * H + (5 * H) // 2
    bb, chunk = tile or _tile_plan(
        B, cols, cs.dtype.itemsize, w_hh.size * w_hh.dtype.itemsize)
    gates = _pad_tm(gates, chunk, bb)
    cs = _pad_tm(cs, chunk, bb)
    c_prev = _pad_tm(c_prev, chunk, bb)
    dys = _pad_tm(jnp.swapaxes(dys, 0, 1).astype(cs.dtype), chunk, bb)
    N, Bp = cs.shape[0], cs.shape[1]
    nc = N // chunk
    rev = lambda b, i: (nc - 1 - i, b, 0)  # noqa: E731

    kernel = functools.partial(_lstm_bwd_chunk_kernel, chunk=chunk,
                               hidden=H)
    dgates = pl.pallas_call(
        kernel,
        grid=(Bp // bb, nc),
        in_specs=[
            pl.BlockSpec((H4, H), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, bb, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, bb, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, bb, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, bb, H), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, bb, H4), rev,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Bp, H4), cs.dtype),
        scratch_shapes=[
            pltpu.VMEM((bb, H), jnp.float32),
            pltpu.VMEM((bb, H), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(w_hh.T).astype(cs.dtype) if cs.dtype != jnp.float32
      else jnp.asarray(w_hh.T), gates, cs, c_prev, dys)
    return dgates[:N0, :B]


def _lstm_core_bwd(interpret, res, dys):
    """Reverse-time BPTT over the saved activations — fused Pallas kernel."""
    w_hh, ys_t, cs, gates = res
    N, B, H = ys_t.shape

    h_prev = jnp.concatenate(
        [jnp.zeros((1, B, H), ys_t.dtype), ys_t[:-1]], axis=0)
    c_prev = jnp.concatenate(
        [jnp.zeros((1, B, H), cs.dtype), cs[:-1]], axis=0)
    dxg_t = _lstm_bwd_pallas(w_hh, gates, cs, c_prev, dys,
                             interpret=interpret)
    # dW_hh = sum_t h_{t-1}^T dgates_t — one large MXU matmul (f32 accum
    # even when activations stream in bf16)
    dw = jnp.einsum("nbh,nbg->hg", h_prev, dxg_t,
                    preferred_element_type=jnp.float32).astype(w_hh.dtype)
    return jnp.swapaxes(dxg_t, 0, 1), dw


_lstm_core.defvjp(_lstm_core_fwd, _lstm_core_bwd)


def lstm_recurrence_pallas(
    xg: jnp.ndarray, w_hh: jnp.ndarray, reverse: bool = False,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in replacement for ops.rnn.lstm_recurrence_scan.

    ``reverse=True`` (the backward half of a BiLSTM) is handled by flipping
    the time axis around the forward-time kernel; flips are free-ish layout
    ops and keep one kernel for both directions.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if reverse:
        return jnp.flip(
            _lstm_core(jnp.flip(xg, axis=1), w_hh, interpret), axis=1)
    return _lstm_core(xg, w_hh, interpret)


# ---------------------------------------------------------------------------
# Fused bidirectional kernel: both directions of a BiLSTM layer advance in
# one grid walk (two (h, c) carries in scratch, two weight sets resident),
# halving the sequential kernel-step count. At the small flagship shape
# (B=32, H=64, N=500) per-step cost is dominated by fixed per-step
# machinery rather than arithmetic, so the second direction comes nearly
# free there; at large shapes it is throughput-neutral (see the BiGRU
# twin in gru_pallas.py). The backward-in-time direction uses the same
# flip trick: the caller pre-flips its gate stream and unflips the output.
# ---------------------------------------------------------------------------


def _bilstm_fwd_kernel(wf_ref, wb_ref, xgf_ref, xgb_ref,
                       ysf_ref, ysb_ref, csf_ref, gf_ref, csb_ref, gb_ref,
                       hf_s, cf_s, hb_s, cb_s, *, chunk: int, hidden: int,
                       save_residuals: bool = True):
    t_step = pl.program_id(1)

    @pl.when(t_step == 0)
    def _():
        hf_s[:] = jnp.zeros_like(hf_s)
        cf_s[:] = jnp.zeros_like(cf_s)
        hb_s[:] = jnp.zeros_like(hb_s)
        cb_s[:] = jnp.zeros_like(cb_s)

    H = hidden

    def cell(w, g, h, c):
        # stream-dtype w -> MXU bf16 path in mixed precision (f32 accum)
        g = g + jnp.dot(h.astype(w.dtype), w,
                        preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(g[:, :H])
        f = jax.nn.sigmoid(g[:, H:2 * H])
        gg = jnp.tanh(g[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(g[:, 3 * H:])
        c_new = f * c + i * gg
        h_new = o * jnp.tanh(c_new)
        return h_new, c_new, i, f, gg, o

    wf, wb = wf_ref[:], wb_ref[:]
    for t in range(chunk):
        hf, cf, i_f, f_f, g_f, o_f = cell(
            wf, xgf_ref[t].astype(jnp.float32), hf_s[:], cf_s[:])
        hb, cb, i_b, f_b, g_b, o_b = cell(
            wb, xgb_ref[t].astype(jnp.float32), hb_s[:], cb_s[:])
        hf_s[:] = hf
        cf_s[:] = cf
        hb_s[:] = hb
        cb_s[:] = cb
        ysf_ref[t] = hf.astype(ysf_ref.dtype)
        ysb_ref[t] = hb.astype(ysb_ref.dtype)
        if save_residuals:
            csf_ref[t] = cf.astype(csf_ref.dtype)
            gf_ref[t] = jnp.concatenate(
                [i_f, f_f, g_f, o_f], axis=-1).astype(gf_ref.dtype)
            csb_ref[t] = cb.astype(csb_ref.dtype)
            gb_ref[t] = jnp.concatenate(
                [i_b, f_b, g_b, o_b], axis=-1).astype(gb_ref.dtype)


def _bilstm_bwd_kernel(wtf_ref, wtb_ref,
                       gf_ref, csf_ref, cpf_ref, dyf_ref,
                       gb_ref, csb_ref, cpb_ref, dyb_ref,
                       dgf_ref, dgb_ref,
                       dhf_s, dcf_s, dhb_s, dcb_s, *, chunk: int,
                       hidden: int):
    t_step = pl.program_id(1)

    @pl.when(t_step == 0)
    def _():
        dhf_s[:] = jnp.zeros_like(dhf_s)
        dcf_s[:] = jnp.zeros_like(dcf_s)
        dhb_s[:] = jnp.zeros_like(dhb_s)
        dcb_s[:] = jnp.zeros_like(dcb_s)

    H = hidden

    # Chunk-vectorized linearization (see _lstm_bwd_chunk_kernel): the
    # tanh and all residual-only factors move out of the serial walk;
    # the two directions' independent chains interleave for ILP.
    # Coefficients live in the stream dtype, built from H-sized slices.
    def coefs(g_ref, cs_ref2, cp_ref2):
        def _sl(i2):
            return g_ref[:][..., i2 * H:(i2 + 1) * H].astype(jnp.float32)

        i, f, gg, o = _sl(0), _sl(1), _sl(2), _sl(3)
        tanh_c = jnp.tanh(cs_ref2[:].astype(jnp.float32))
        cd = g_ref.dtype
        c_c = (o * (1.0 - tanh_c * tanh_c)).astype(cd)
        c4 = jnp.concatenate([
            gg * i * (1.0 - i),
            cp_ref2[:].astype(jnp.float32) * f * (1.0 - f),
            i * (1.0 - gg * gg),
            tanh_c * o * (1.0 - o),
        ], axis=-1).astype(cd)                    # [chunk, bb, 4H]
        return c4, c_c

    c4f, ccf = coefs(gf_ref, csf_ref, cpf_ref)
    c4b, ccb = coefs(gb_ref, csb_ref, cpb_ref)
    wtf, wtb = wtf_ref[:], wtb_ref[:]
    for t in range(chunk - 1, -1, -1):
        dhf_t = dyf_ref[t].astype(jnp.float32) + dhf_s[:]
        dhb_t = dyb_ref[t].astype(jnp.float32) + dhb_s[:]
        dcf_t = dcf_s[:] + dhf_t * ccf[t].astype(jnp.float32)
        dcb_t = dcb_s[:] + dhb_t * ccb[t].astype(jnp.float32)
        dgf = jnp.concatenate(
            [dcf_t, dcf_t, dcf_t, dhf_t], axis=-1) \
            * c4f[t].astype(jnp.float32)
        dgb = jnp.concatenate(
            [dcb_t, dcb_t, dcb_t, dhb_t], axis=-1) \
            * c4b[t].astype(jnp.float32)
        dgf_ref[t] = dgf.astype(dgf_ref.dtype)
        dgb_ref[t] = dgb.astype(dgb_ref.dtype)
        dhf_s[:] = jnp.dot(dgf.astype(wtf.dtype), wtf,
                           preferred_element_type=jnp.float32)
        dcf_s[:] = dcf_t * gf_ref[t][:, H:2 * H].astype(jnp.float32)
        dhb_s[:] = jnp.dot(dgb.astype(wtb.dtype), wtb,
                           preferred_element_type=jnp.float32)
        dcb_s[:] = dcb_t * gb_ref[t][:, H:2 * H].astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "save_residuals", "tile",
                     "ys_time_major"))
def _bilstm_fwd_pallas(xgf, xgb, w_f, w_b, interpret: bool = False,
                       save_residuals: bool = True,
                       tile: Optional[Tuple[int, int]] = None,
                       ys_time_major: bool = False):
    """Both gate streams [B, N, 4H] (xgb pre-flipped in time) ->
    (ysf, ysb) [B, N, H] + time-major residuals per direction."""
    B, N0, H4 = xgf.shape
    H = H4 // 4
    cols = 2 * ((H4 + 6 * H) if save_residuals else (H4 + H))
    bb, chunk = tile or _tile_plan(
        B, cols, xgf.dtype.itemsize, 2 * w_f.size * w_f.dtype.itemsize)
    if xgf.dtype != jnp.float32:
        w_f, w_b = w_f.astype(xgf.dtype), w_b.astype(xgf.dtype)
    xgf_t = _pad_tm(jnp.swapaxes(xgf, 0, 1), chunk, bb)
    xgb_t = _pad_tm(jnp.swapaxes(xgb, 0, 1), chunk, bb)
    N, Bp = xgf_t.shape[0], xgf_t.shape[1]
    grid = (Bp // bb, N // chunk)
    kernel = functools.partial(_bilstm_fwd_kernel, chunk=chunk, hidden=H,
                               save_residuals=save_residuals)
    wspec = pl.BlockSpec((H, H4), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((chunk, bb, H4), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec((chunk, bb, H), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [wspec, wspec, xspec, xspec]
    scratch = [pltpu.VMEM((bb, H), jnp.float32) for _ in range(4)]
    if save_residuals:
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[yspec, yspec, yspec, xspec, yspec, xspec],
            out_shape=[
                jax.ShapeDtypeStruct((N, Bp, H), xgf.dtype),
                jax.ShapeDtypeStruct((N, Bp, H), xgf.dtype),
                jax.ShapeDtypeStruct((N, Bp, H), xgf.dtype),
                jax.ShapeDtypeStruct((N, Bp, H4), xgf.dtype),
                jax.ShapeDtypeStruct((N, Bp, H), xgf.dtype),
                jax.ShapeDtypeStruct((N, Bp, H4), xgf.dtype),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
        )(w_f, w_b, xgf_t, xgb_t)
        ysf, ysb, csf, gf, csb, gb = outs
        if ys_time_major:
            return (ysf[:N0, :B], ysb[:N0, :B],
                    csf[:N0, :B], gf[:N0, :B], csb[:N0, :B], gb[:N0, :B])
        return (jnp.swapaxes(ysf[:N0, :B], 0, 1),
                jnp.swapaxes(ysb[:N0, :B], 0, 1),
                csf[:N0, :B], gf[:N0, :B], csb[:N0, :B], gb[:N0, :B])

    def kernel_light(wf_ref, wb_ref, xgf_ref, xgb_ref, ysf_ref, ysb_ref,
                     hf_s, cf_s, hb_s, cb_s):
        kernel(wf_ref, wb_ref, xgf_ref, xgb_ref, ysf_ref, ysb_ref,
               None, None, None, None, hf_s, cf_s, hb_s, cb_s)

    ysf, ysb = pl.pallas_call(
        kernel_light,
        grid=grid,
        in_specs=in_specs,
        out_specs=[yspec, yspec],
        out_shape=[
            jax.ShapeDtypeStruct((N, Bp, H), xgf.dtype),
            jax.ShapeDtypeStruct((N, Bp, H), xgf.dtype),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(w_f, w_b, xgf_t, xgb_t)
    if ys_time_major:
        return ysf[:N0, :B], ysb[:N0, :B], None, None, None, None
    return (jnp.swapaxes(ysf[:N0, :B], 0, 1),
            jnp.swapaxes(ysb[:N0, :B], 0, 1), None, None, None, None)


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def _bilstm_bwd_pallas(w_f, w_b, gf, csf, cpf, dyf, gb, csb, cpb, dyb,
                       interpret: bool = False,
                       tile: Optional[Tuple[int, int]] = None):
    N0, B, H = csf.shape
    H4 = 4 * H
    # two directions; +5H/2 per dir for the linearized walk's
    # stream-dtype coefficient arrays (single-buffered)
    cols = 2 * (2 * H4 + 3 * H + (5 * H) // 2)
    bb, chunk = tile or _tile_plan(
        B, cols, csf.dtype.itemsize, 2 * w_f.size * w_f.dtype.itemsize)
    gf = _pad_tm(gf, chunk, bb)
    csf = _pad_tm(csf, chunk, bb)
    cpf = _pad_tm(cpf, chunk, bb)
    gb = _pad_tm(gb, chunk, bb)
    csb = _pad_tm(csb, chunk, bb)
    cpb = _pad_tm(cpb, chunk, bb)
    dyf = _pad_tm(jnp.swapaxes(dyf, 0, 1).astype(csf.dtype), chunk, bb)
    dyb = _pad_tm(jnp.swapaxes(dyb, 0, 1).astype(csf.dtype), chunk, bb)
    N, Bp = csf.shape[0], csf.shape[1]
    nc = N // chunk
    rev = lambda b, i: (nc - 1 - i, b, 0)  # noqa: E731

    kernel = functools.partial(_bilstm_bwd_kernel, chunk=chunk, hidden=H)
    wspec = pl.BlockSpec((H4, H), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM)
    g4 = pl.BlockSpec((chunk, bb, H4), rev, memory_space=pltpu.VMEM)
    g1 = pl.BlockSpec((chunk, bb, H), rev, memory_space=pltpu.VMEM)
    dgf, dgb = pl.pallas_call(
        kernel,
        grid=(Bp // bb, nc),
        in_specs=[wspec, wspec, g4, g1, g1, g1, g4, g1, g1, g1],
        out_specs=[g4, g4],
        out_shape=[
            jax.ShapeDtypeStruct((N, Bp, H4), csf.dtype),
            jax.ShapeDtypeStruct((N, Bp, H4), csf.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32)
                        for _ in range(4)],
        interpret=interpret,
    )(jnp.asarray(w_f.T).astype(csf.dtype) if csf.dtype != jnp.float32
      else jnp.asarray(w_f.T),
      jnp.asarray(w_b.T).astype(csf.dtype) if csf.dtype != jnp.float32
      else jnp.asarray(w_b.T), gf, csf, cpf, dyf,
      gb, csb, cpb, dyb)
    return dgf[:N0, :B], dgb[:N0, :B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _bilstm_core(xgf, xgb, w_f, w_b, interpret: bool = False):
    ysf, ysb, *_ = _bilstm_fwd_pallas(xgf, xgb, w_f, w_b, interpret,
                                      save_residuals=False)
    return ysf, ysb


def _bilstm_core_fwd(xgf, xgb, w_f, w_b, interpret):
    # time-major ys residuals (see _lstm_core_fwd)
    ysf_t, ysb_t, csf, gf, csb, gb = _bilstm_fwd_pallas(
        xgf, xgb, w_f, w_b, interpret, save_residuals=True,
        ys_time_major=True)
    outs = (jnp.swapaxes(ysf_t, 0, 1), jnp.swapaxes(ysb_t, 0, 1))
    return outs, (w_f, w_b, ysf_t, ysb_t, csf, gf, csb, gb)


def _bilstm_core_bwd(interpret, res, dys):
    w_f, w_b, ysf_t, ysb_t, csf, gf, csb, gb = res
    dyf, dyb = dys
    N, B, H = ysf_t.shape

    def prevs(ys_t, cs):
        hp = jnp.concatenate(
            [jnp.zeros((1, B, H), ys_t.dtype), ys_t[:-1]], axis=0)
        cp = jnp.concatenate(
            [jnp.zeros((1, B, H), cs.dtype), cs[:-1]], axis=0)
        return hp, cp

    hpf, cpf = prevs(ysf_t, csf)
    hpb, cpb = prevs(ysb_t, csb)
    dgf_t, dgb_t = _bilstm_bwd_pallas(
        w_f, w_b, gf, csf, cpf, dyf, gb, csb, cpb, dyb,
        interpret=interpret)
    dwf = jnp.einsum("nbh,nbg->hg", hpf, dgf_t,
                     preferred_element_type=jnp.float32).astype(w_f.dtype)
    dwb = jnp.einsum("nbh,nbg->hg", hpb, dgb_t,
                     preferred_element_type=jnp.float32).astype(w_b.dtype)
    return (jnp.swapaxes(dgf_t, 0, 1), jnp.swapaxes(dgb_t, 0, 1),
            dwf, dwb)


_bilstm_core.defvjp(_bilstm_core_fwd, _bilstm_core_bwd)


def bilstm_recurrence_pallas(
    xg_f: jnp.ndarray, xg_b: jnp.ndarray,
    w_f: jnp.ndarray, w_b: jnp.ndarray,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused BiLSTM layer recurrence: forward direction over ``xg_f`` and
    BACKWARD-in-time direction over ``xg_b`` in one kernel walk; returns
    (ys_fwd, ys_bwd) in original time order."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ysf, ysb = _bilstm_core(xg_f, jnp.flip(xg_b, axis=1),
                            w_f, w_b, interpret)
    return ysf, jnp.flip(ysb, axis=1)
