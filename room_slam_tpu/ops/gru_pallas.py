"""Pallas TPU kernels for the GRU recurrence (the scale-up BiGRU family).

Same design as the LSTM kernels (rnn_pallas.py): the input-side matmul for
the whole sequence stays outside as one MXU matmul; the kernel keeps the
hidden carry in VMEM scratch and streams per-chunk inputs, and a custom VJP
runs reverse-time BPTT as a second kernel over saved activations.

torch ``nn.GRU`` numerics (gate order r, z, n; the reset gate multiplies
``W_hn h + b_hn`` only — see ops/rnn.py:gru_recurrence_scan).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from room_slam_tpu.ops.rnn_pallas import CHUNK, _pad_time


def _gru_fwd_kernel(w_ref, b_ref, xg_ref, ys_ref, gates_ref, hn_ref,
                    h_s, *, chunk: int, hidden: int,
                    save_residuals: bool = True):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        h_s[:] = jnp.zeros_like(h_s)

    w = w_ref[:]
    b = b_ref[:]
    H = hidden
    for t in range(chunk):
        hg = jnp.dot(h_s[:], w, preferred_element_type=jnp.float32) + b
        g = xg_ref[:, t, :]
        r = jax.nn.sigmoid(g[:, :H] + hg[:, :H])
        z = jax.nn.sigmoid(g[:, H:2 * H] + hg[:, H:2 * H])
        hn = hg[:, 2 * H:]
        n = jnp.tanh(g[:, 2 * H:] + r * hn)
        h = (1.0 - z) * n + z * h_s[:]
        h_s[:] = h
        ys_ref[:, t, :] = h
        if save_residuals:
            gates_ref[:, t, :] = jnp.concatenate([r, z, n], axis=-1)
            hn_ref[:, t, :] = hn


def _gru_bwd_kernel(wt_ref, gates_ref, hn_ref, hprev_ref, dys_ref,
                    dxg_ref, dhn_ref, dh_s, *, chunk: int, hidden: int):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)

    wt = wt_ref[:]
    H = hidden
    for t in range(chunk - 1, -1, -1):
        g = gates_ref[:, t, :]
        r = g[:, :H]
        z = g[:, H:2 * H]
        n = g[:, 2 * H:]
        hn = hn_ref[:, t, :]
        hp = hprev_ref[:, t, :]
        dh_t = dys_ref[:, t, :] + dh_s[:]
        dz = dh_t * (hp - n)
        dn_pre = dh_t * (1.0 - z) * (1.0 - n * n)
        dr = dn_pre * hn
        dhn = dn_pre * r
        dz_pre = dz * z * (1.0 - z)
        dr_pre = dr * r * (1.0 - r)
        dxg_ref[:, t, :] = jnp.concatenate([dr_pre, dz_pre, dn_pre],
                                           axis=-1)
        dhn_ref[:, t, :] = dhn
        dgates_hh = jnp.concatenate([dr_pre, dz_pre, dhn], axis=-1)
        dh_s[:] = dh_t * z + jnp.dot(
            dgates_hh, wt, preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "save_residuals"))
def _gru_fwd_pallas(xg, w_hh, b_hh, interpret: bool = False,
                    save_residuals: bool = True):
    B, N0, H3 = xg.shape
    H = H3 // 3
    xg_p, N0 = _pad_time(xg, CHUNK)
    N = xg_p.shape[1]
    grid = (N // CHUNK,)
    kernel = functools.partial(_gru_fwd_kernel, chunk=CHUNK, hidden=H,
                               save_residuals=save_residuals)
    in_specs = [
        pl.BlockSpec((H, H3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, CHUNK, H3), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    ys_spec = pl.BlockSpec((B, CHUNK, H), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((B, H), jnp.float32)]
    b2d = b_hh.reshape(1, H3)
    if save_residuals:
        ys, gates, hn = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                ys_spec,
                pl.BlockSpec((B, CHUNK, H3), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, CHUNK, H), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, N, H), xg.dtype),
                jax.ShapeDtypeStruct((B, N, H3), xg.dtype),
                jax.ShapeDtypeStruct((B, N, H), xg.dtype),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
        )(w_hh, b2d, xg_p)
        return ys[:, :N0], gates[:, :N0], hn[:, :N0]

    def kernel_light(w_ref, b_ref, xg_ref, ys_ref, h_s):
        kernel(w_ref, b_ref, xg_ref, ys_ref, None, None, h_s)

    ys = pl.pallas_call(
        kernel_light,
        grid=grid,
        in_specs=in_specs,
        out_specs=ys_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, H), xg.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(w_hh, b2d, xg_p)
    return ys[:, :N0], None, None


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gru_bwd_pallas(w_hh, gates, hn, h_prev, dys, interpret: bool = False):
    B, N0, H = hn.shape
    H3 = 3 * H
    gates, _ = _pad_time(gates, CHUNK)
    hn, _ = _pad_time(hn, CHUNK)
    h_prev, _ = _pad_time(h_prev, CHUNK)
    dys, _ = _pad_time(dys, CHUNK)
    N = hn.shape[1]
    nc = N // CHUNK
    rev = lambda i: (0, nc - 1 - i, 0)  # noqa: E731

    kernel = functools.partial(_gru_bwd_kernel, chunk=CHUNK, hidden=H)
    dxg, dhn = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((H3, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, CHUNK, H3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, CHUNK, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, CHUNK, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, CHUNK, H), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, CHUNK, H3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, CHUNK, H), rev, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, H3), hn.dtype),
            jax.ShapeDtypeStruct((B, N, H), hn.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(w_hh.T), gates, hn, h_prev, dys)
    return dxg[:, :N0], dhn[:, :N0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gru_core(xg, w_hh, b_hh, interpret: bool = False):
    ys, _, _ = _gru_fwd_pallas(xg, w_hh, b_hh, interpret,
                               save_residuals=False)
    return ys


def _gru_core_fwd(xg, w_hh, b_hh, interpret):
    ys, gates, hn = _gru_fwd_pallas(xg, w_hh, b_hh, interpret,
                                    save_residuals=True)
    return ys, (w_hh, ys, gates, hn)


def _gru_core_bwd(interpret, res, dys):
    w_hh, ys, gates, hn = res
    B, N, H = ys.shape
    h_prev = jnp.concatenate(
        [jnp.zeros((B, 1, H), ys.dtype), ys[:, :-1]], axis=1)
    dxg, dhn = _gru_bwd_pallas(w_hh, gates, hn, h_prev, dys,
                               interpret=interpret)
    # hidden-side gate grads: [dr_pre, dz_pre, d(hn_part)]
    dgates_hh = jnp.concatenate([dxg[..., : 2 * H], dhn], axis=-1)
    dw = jnp.einsum("bnh,bng->hg", h_prev, dgates_hh)
    db = jnp.sum(dgates_hh, axis=(0, 1))
    return dxg, dw, db


_gru_core.defvjp(_gru_core_fwd, _gru_core_bwd)


def gru_recurrence_pallas(
    xg: jnp.ndarray, w_hh: jnp.ndarray, b_hh: jnp.ndarray,
    reverse: bool = False, interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in replacement for ops.rnn.gru_recurrence_scan."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if reverse:
        return jnp.flip(
            _gru_core(jnp.flip(xg, axis=1), w_hh, b_hh, interpret), axis=1)
    return _gru_core(xg, w_hh, b_hh, interpret)
