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
_VMEM_BUDGET = 12 << 20


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
    for chunk in (32, 16, 8):
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
        g = xg_ref[t].astype(jnp.float32) + jnp.dot(
            h_s[:], w, preferred_element_type=jnp.float32)
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
    jax.jit, static_argnames=("interpret", "save_residuals", "tile"))
def _lstm_fwd_pallas(xg: jnp.ndarray, w_hh: jnp.ndarray,
                     interpret: bool = False, save_residuals: bool = True,
                     tile: Optional[Tuple[int, int]] = None):
    """Forward-time recurrence. xg [B, N, 4H] -> ys [B, N, H]; residuals
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
        )(w_hh, xg_t)
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
    )(w_hh, xg_t)
    return jnp.swapaxes(ys[:N0, :B], 0, 1), None, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _lstm_core(xg: jnp.ndarray, w_hh: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    # primal path (inference): light kernel, no residual outputs
    ys, _, _ = _lstm_fwd_pallas(xg, w_hh, interpret, save_residuals=False)
    return ys


def _lstm_core_fwd(xg, w_hh, interpret):
    # differentiated path: also emit cell states + activated gates for BPTT
    ys, cs, gates = _lstm_fwd_pallas(xg, w_hh, interpret,
                                     save_residuals=True)
    return ys, (w_hh, ys, cs, gates)


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
    for t in range(chunk - 1, -1, -1):
        g = gates_ref[t].astype(jnp.float32)
        i = g[:, :H]
        f = g[:, H:2 * H]
        gg = g[:, 2 * H:3 * H]
        o = g[:, 3 * H:]
        tanh_c = jnp.tanh(cs_ref[t].astype(jnp.float32))
        dh_t = dys_ref[t].astype(jnp.float32) + dh_s[:]
        do = dh_t * tanh_c
        dc_t = dc_s[:] + dh_t * o * (1.0 - tanh_c * tanh_c)
        dgates = jnp.concatenate([
            dc_t * gg * i * (1.0 - i),
            dc_t * cprev_ref[t].astype(jnp.float32) * f * (1.0 - f),
            dc_t * i * (1.0 - gg * gg),
            do * o * (1.0 - o),
        ], axis=-1)
        dg_ref[t] = dgates.astype(dg_ref.dtype)
        dh_s[:] = jnp.dot(dgates, wt, preferred_element_type=jnp.float32)
        dc_s[:] = dc_t * f


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def _lstm_bwd_pallas(w_hh, gates, cs, c_prev, dys, interpret: bool = False,
                     tile: Optional[Tuple[int, int]] = None):
    """Fused reverse-time BPTT -> dgates TIME-MAJOR [N, B, 4H]. All
    activation arguments are time-major [N, B, *]; dys arrives batch-major
    [B, N, H] (the cotangent of the public output)."""
    N0, B, H = cs.shape
    H4 = 4 * H
    cols = 2 * H4 + 3 * H  # gates + dgates (4H each) + cs + c_prev + dys
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
    )(jnp.asarray(w_hh.T), gates, cs, c_prev, dys)
    return dgates[:N0, :B]


def _lstm_core_bwd(interpret, res, dys):
    """Reverse-time BPTT over the saved activations — fused Pallas kernel."""
    w_hh, ys, cs, gates = res
    B, N, H = ys.shape

    # ys is the public (batch-major) output; residuals are time-major
    ys_t = jnp.swapaxes(ys, 0, 1)
    h_prev = jnp.concatenate(
        [jnp.zeros((1, B, H), ys.dtype), ys_t[:-1]], axis=0)
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
