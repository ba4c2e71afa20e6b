"""LSTM recurrence primitives.

The gate matmul against the *inputs* is hoisted out of the time loop and runs
as one big MXU matmul over the whole sequence; only the small
hidden-to-hidden recurrence stays sequential. Two implementations share one
signature:

- ``lstm_recurrence_scan``: ``lax.scan`` — portable (CPU tests, autodiff).
- ``room_slam_tpu.ops.rnn_pallas.lstm_recurrence_pallas``: fused Pallas TPU
  kernel that keeps the carry in VMEM and streams gate chunks from HBM.

Gate order follows torch's ``nn.LSTM`` (i, f, g, o) so reference-shaped
checkpoints can be imported (ref model: src/benchmark/model.py:16-23).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lstm_cell_step(gates: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray,
                   w_hh: jnp.ndarray):
    """One LSTM step. gates = x_t @ W_ih + b (precomputed), [B, 4H]."""
    H = h.shape[-1]
    g = gates + h @ w_hh
    i = jax.nn.sigmoid(g[..., :H])
    f = jax.nn.sigmoid(g[..., H: 2 * H])
    gg = jnp.tanh(g[..., 2 * H: 3 * H])
    o = jax.nn.sigmoid(g[..., 3 * H:])
    c_new = f * c + i * gg
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_recurrence_scan(
    xg: jnp.ndarray, w_hh: jnp.ndarray, reverse: bool = False
) -> jnp.ndarray:
    """Run the LSTM recurrence over a precomputed gate sequence.

    Args:
        xg: ``[B, N, 4H]`` = x @ W_ih + b_ih + b_hh for every timestep.
        w_hh: ``[H, 4H]`` hidden-to-hidden weights.
        reverse: process the sequence back-to-front (outputs stay aligned
            with input positions — the backward half of a BiLSTM).

    Returns:
        hidden states ``[B, N, H]``.
    """
    H = w_hh.shape[0]
    # Carry stays f32 even for bf16 gate streams (matching the Pallas
    # kernel: streamed tensors inherit xg's dtype, recurrence math is f32).
    # zeros_like on a slice of xg (not jnp.zeros) so the carry inherits
    # xg's varying axes under shard_map — required when the recurrence
    # runs inside a manual-collective region (parallel/pipeline.py).
    h0 = jnp.zeros_like(xg[:, 0, :H], dtype=jnp.float32)
    c0 = h0

    def step(carry, g):
        h, c = carry
        h, c = lstm_cell_step(g.astype(jnp.float32), h, c, w_hh)
        return (h, c), h.astype(xg.dtype)

    xs = jnp.swapaxes(xg, 0, 1)  # [N, B, 4H]
    _, ys = jax.lax.scan(step, (h0, c0), xs, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)


def lstm_recurrence(
    xg: jnp.ndarray,
    w_hh: jnp.ndarray,
    reverse: bool = False,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Dispatch between the scan and Pallas implementations."""
    if use_pallas:
        from room_slam_tpu.ops import rnn_pallas

        return rnn_pallas.lstm_recurrence_pallas(xg, w_hh, reverse=reverse)
    return lstm_recurrence_scan(xg, w_hh, reverse=reverse)


def gru_recurrence_scan(
    xg: jnp.ndarray,
    w_hh: jnp.ndarray,
    b_hh: jnp.ndarray,
    reverse: bool = False,
) -> jnp.ndarray:
    """GRU recurrence with torch ``nn.GRU`` numerics (gate order r, z, n).

    Args:
        xg: ``[B, N, 3H]`` = x @ W_ih + b_ih, precomputed for all timesteps.
        w_hh: ``[H, 3H]``; b_hh: ``[3H]`` (kept separate from b_ih because
            torch applies the reset gate to ``W_hn h + b_hn`` only).
        reverse: backward direction of a BiGRU.

    Returns:
        hidden states ``[B, N, H]``; the last valid state is the caller's
        business (take ``[:, -1]`` / ``[:, 0]``).
    """
    H = w_hh.shape[0]
    # f32 carry regardless of the gate-stream dtype; zeros_like so the
    # carry inherits xg's varying axes (see lstm_recurrence_scan)
    h0 = jnp.zeros_like(xg[:, 0, :H], dtype=jnp.float32)

    def step(h, g):
        g = g.astype(jnp.float32)
        hg = h @ w_hh + b_hh
        r = jax.nn.sigmoid(g[..., :H] + hg[..., :H])
        z = jax.nn.sigmoid(g[..., H:2 * H] + hg[..., H:2 * H])
        n = jnp.tanh(g[..., 2 * H:] + r * hg[..., 2 * H:])
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new.astype(xg.dtype)

    xs = jnp.swapaxes(xg, 0, 1)
    _, ys = jax.lax.scan(step, h0, xs, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)


def gru_recurrence(
    xg: jnp.ndarray,
    w_hh: jnp.ndarray,
    b_hh: jnp.ndarray,
    reverse: bool = False,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Dispatch between the scan and Pallas GRU implementations."""
    if use_pallas:
        from room_slam_tpu.ops import gru_pallas

        return gru_pallas.gru_recurrence_pallas(xg, w_hh, b_hh,
                                                reverse=reverse)
    return gru_recurrence_scan(xg, w_hh, b_hh, reverse=reverse)
