"""Pallas TPU kernel for the LSTM recurrence.

The sequential part of an LSTM is tiny per step (h @ W_hh for a [B, H] state)
but runs N=500..3000 times. A generic ``lax.scan`` round-trips the carry and
per-step outputs through layout shuffles each iteration; this kernel instead:

- keeps the (h, c) carry resident in VMEM scratch across the whole sequence
  (scratch persists across sequential TPU grid steps),
- streams precomputed input gates ``xg = x @ W_ih + b`` from HBM in chunks of
  CHUNK timesteps, double-buffered automatically by the Pallas pipeline,
- unrolls CHUNK steps per grid invocation so the per-step MXU matmul
  [B, H] x [H, 4H] issues back-to-back.

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
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 32  # timesteps per grid step


def _lstm_chunk_kernel(w_ref, xg_ref, ys_ref, cs_ref, gates_ref,
                       h_s, c_s, *, chunk: int, hidden: int,
                       save_residuals: bool = True):
    """One grid step: advance the recurrence over ``chunk`` timesteps.
    ``save_residuals=False`` (inference) skips the cell-state and gate
    outputs — 3x less HBM write traffic."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        h_s[:] = jnp.zeros_like(h_s)
        c_s[:] = jnp.zeros_like(c_s)

    w = w_ref[:]
    H = hidden
    for t in range(chunk):
        g = xg_ref[:, t, :] + jnp.dot(
            h_s[:], w, preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(g[:, :H])
        f = jax.nn.sigmoid(g[:, H:2 * H])
        gg = jnp.tanh(g[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(g[:, 3 * H:])
        c = f * c_s[:] + i * gg
        h = o * jnp.tanh(c)
        h_s[:] = h
        c_s[:] = c
        ys_ref[:, t, :] = h
        if save_residuals:
            cs_ref[:, t, :] = c
            gates_ref[:, t, :] = jnp.concatenate([i, f, gg, o], axis=-1)


def _pad_time(x: jnp.ndarray, chunk: int) -> Tuple[jnp.ndarray, int]:
    n = x.shape[1]
    pad = (-n) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x, n


@functools.partial(jax.jit,
                   static_argnames=("interpret", "save_residuals"))
def _lstm_fwd_pallas(xg: jnp.ndarray, w_hh: jnp.ndarray,
                     interpret: bool = False, save_residuals: bool = True):
    """Forward-time recurrence. xg [B, N, 4H] -> (ys, cs, gates); cs/gates
    are None when save_residuals=False (inference)."""
    B, N0, H4 = xg.shape
    H = H4 // 4
    xg_p, N0 = _pad_time(xg, CHUNK)
    N = xg_p.shape[1]
    grid = (N // CHUNK,)

    kernel = functools.partial(_lstm_chunk_kernel, chunk=CHUNK, hidden=H,
                               save_residuals=save_residuals)
    block_in = [
        pl.BlockSpec((H, H4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, CHUNK, H4), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    ys_spec = pl.BlockSpec((B, CHUNK, H), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((B, H), jnp.float32),
        pltpu.VMEM((B, H), jnp.float32),
    ]
    if save_residuals:
        ys, cs, gates = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=block_in,
            out_specs=[
                ys_spec,
                pl.BlockSpec((B, CHUNK, H), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, CHUNK, H4), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, N, H), xg.dtype),
                jax.ShapeDtypeStruct((B, N, H), xg.dtype),
                jax.ShapeDtypeStruct((B, N, H4), xg.dtype),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
        )(w_hh, xg_p)
        return ys[:, :N0], cs[:, :N0], gates[:, :N0]

    def kernel_light(w_ref, xg_ref, ys_ref, h_s, c_s):
        kernel(w_ref, xg_ref, ys_ref, None, None, h_s, c_s)

    ys = pl.pallas_call(
        kernel_light,
        grid=grid,
        in_specs=block_in,
        out_specs=ys_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, H), xg.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(w_hh, xg_p)
    return ys[:, :N0], None, None


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
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = jnp.zeros_like(dc_s)

    wt = wt_ref[:]
    H = hidden
    for t in range(chunk - 1, -1, -1):
        g = gates_ref[:, t, :]
        i = g[:, :H]
        f = g[:, H:2 * H]
        gg = g[:, 2 * H:3 * H]
        o = g[:, 3 * H:]
        tanh_c = jnp.tanh(cs_ref[:, t, :])
        dh_t = dys_ref[:, t, :] + dh_s[:]
        do = dh_t * tanh_c
        dc_t = dc_s[:] + dh_t * o * (1.0 - tanh_c * tanh_c)
        dgates = jnp.concatenate([
            dc_t * gg * i * (1.0 - i),
            dc_t * cprev_ref[:, t, :] * f * (1.0 - f),
            dc_t * i * (1.0 - gg * gg),
            do * o * (1.0 - o),
        ], axis=-1)
        dg_ref[:, t, :] = dgates
        dh_s[:] = jnp.dot(dgates, wt, preferred_element_type=jnp.float32)
        dc_s[:] = dc_t * f


@functools.partial(jax.jit, static_argnames=("interpret",))
def _lstm_bwd_pallas(w_hh, gates, cs, c_prev, dys, interpret: bool = False):
    """Fused reverse-time BPTT -> dgates [B, N, 4H]."""
    B, N0, H = cs.shape
    H4 = 4 * H
    gates, _ = _pad_time(gates, CHUNK)
    cs, _ = _pad_time(cs, CHUNK)
    c_prev, _ = _pad_time(c_prev, CHUNK)
    dys, _ = _pad_time(dys, CHUNK)
    N = cs.shape[1]
    nc = N // CHUNK
    rev = lambda i: (0, nc - 1 - i, 0)  # noqa: E731

    kernel = functools.partial(_lstm_bwd_chunk_kernel, chunk=CHUNK,
                               hidden=H)
    dgates = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((H4, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, CHUNK, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, CHUNK, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, CHUNK, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, CHUNK, H), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, CHUNK, H4), rev,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, H4), cs.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(w_hh.T), gates, cs, c_prev, dys)
    return dgates[:, :N0]


def _lstm_core_bwd(interpret, res, dys):
    """Reverse-time BPTT over the saved activations — fused Pallas kernel
    with a lax.scan fallback in interpret mode."""
    w_hh, ys, cs, gates = res
    B, N, H = ys.shape

    h_prev = jnp.concatenate(
        [jnp.zeros((B, 1, H), ys.dtype), ys[:, :-1]], axis=1)
    c_prev = jnp.concatenate(
        [jnp.zeros((B, 1, H), cs.dtype), cs[:, :-1]], axis=1)
    dxg = _lstm_bwd_pallas(w_hh, gates, cs, c_prev, dys,
                           interpret=interpret)
    # dW_hh = sum_t h_{t-1}^T dgates_t — one large MXU matmul
    dw = jnp.einsum("bnh,bng->hg", h_prev, dxg)
    return dxg, dw


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
