"""Pallas TPU kernels for the GRU recurrence (the scale-up BiGRU family).

Same design as the LSTM kernels (rnn_pallas.py): the input-side matmul for
the whole sequence stays outside as one MXU matmul; the kernel keeps the
hidden carry in VMEM scratch and streams per-chunk inputs; the batch tiles
over the outer grid dimension (``_tile_plan`` sizes the tile to VMEM, and
the tile is the number of MXU rows the recurrence matmul fills); a custom
VJP runs reverse-time BPTT as a second kernel over saved activations.
Streamed tensors inherit ``xg``'s dtype (bfloat16 halves VMEM/HBM traffic;
carry and math stay float32).

Layout: the kernels are TIME-MAJOR — streamed blocks are [chunk, bb, H*],
so each timestep's slice is a full (sublane, lane)-tiled [bb, H*] slab.
With the batch-major [bb, chunk, H*] layout Mosaic tiles (chunk, H) as
(sublane, lane) and every per-timestep access touches 1 of 8 sublanes;
measured on the v5e this costs ~50% of the kernel's wall time at the
scale-up shape (B=128, N=5000, H=256). The [B, N, *] <-> [N, B, *]
transposes live inside the jitted wrappers where XLA fuses them with the
surrounding gate matmuls; residuals stay time-major end-to-end (the BPTT
kernel and the dW einsum consume them as [N, B, *]).

torch ``nn.GRU`` numerics (gate order r, z, n; the reset gate multiplies
``W_hn h + b_hn`` only — see ops/rnn.py:gru_recurrence_scan).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from room_slam_tpu.ops.rnn_pallas import _pad_tm, _tile_plan


def _gru_fwd_kernel(w_ref, b_ref, xg_ref, ys_ref, gates_ref, hn_ref,
                    h_s, *, chunk: int, hidden: int,
                    save_residuals: bool = True):
    t_step = pl.program_id(1)

    @pl.when(t_step == 0)
    def _():
        h_s[:] = jnp.zeros_like(h_s)

    w = w_ref[:]
    b = b_ref[:]
    H = hidden
    for t in range(chunk):
        # w arrives in the stream dtype (bf16 in mixed-precision mode):
        # casting the f32 carry to match runs the dot on the MXU's native
        # bf16 path (~4x the f32 issue rate) with f32 accumulation.
        hg = jnp.dot(h_s[:].astype(w.dtype), w,
                     preferred_element_type=jnp.float32) + b
        g = xg_ref[t].astype(jnp.float32)
        r = jax.nn.sigmoid(g[:, :H] + hg[:, :H])
        z = jax.nn.sigmoid(g[:, H:2 * H] + hg[:, H:2 * H])
        hn = hg[:, 2 * H:]
        n = jnp.tanh(g[:, 2 * H:] + r * hn)
        h = (1.0 - z) * n + z * h_s[:]
        h_s[:] = h
        ys_ref[t] = h.astype(ys_ref.dtype)
        if save_residuals:
            gates_ref[t] = jnp.concatenate(
                [r, z, n], axis=-1).astype(gates_ref.dtype)
            hn_ref[t] = hn.astype(hn_ref.dtype)


def _gru_bwd_kernel(wt_ref, gates_ref, hn_ref, hprev_ref, dys_ref,
                    dxg_ref, dhn_ref, dh_s, *, chunk: int, hidden: int):
    t_step = pl.program_id(1)

    @pl.when(t_step == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)

    wt = wt_ref[:]
    H = hidden
    # The BPTT cell is LINEAR in the cotangent: every elementwise factor
    # depends only on saved residuals, so the whole chunk's coefficients
    # vectorize OUTSIDE the serial walk — the per-timestep latency chain
    # shrinks to adds + muls + one MXU dot. Coefficients are built from
    # H-sized slices (bounded VMEM transients) and stored in the STREAM
    # dtype — the cotangents already stream at that precision, so this
    # adds no new floor (f32 in full-precision mode, e.g. golden tests).
    # Known precision trade (ADVICE r4): in bf16 mode the coefficients
    # are rounded BEFORE the per-step multiply, where the old kernel kept
    # each per-step product in f32 until the store — one extra bf16
    # rounding on the gate cotangents. tests/test_rnn_pallas.py bounds
    # the bf16-stream gradient error; if that test ever tightens/regress-
    # es, keep `c` in f32 (the _tile_plan cols budget already covers it).
    def _sl(ref, i):
        return ref[:][..., i * H:(i + 1) * H].astype(jnp.float32)

    r = _sl(gates_ref, 0)
    z = _sl(gates_ref, 1)
    n = _sl(gates_ref, 2)
    a = (1.0 - z) * (1.0 - n * n)                 # dn_pre = dh_t * a
    c = jnp.concatenate([
        a * hn_ref[:].astype(jnp.float32) * r * (1.0 - r),
        (hprev_ref[:].astype(jnp.float32) - n) * z * (1.0 - z),
        a,
    ], axis=-1).astype(gates_ref.dtype)           # [chunk, bb, 3H]
    for t in range(chunk - 1, -1, -1):
        dh_t = dys_ref[t].astype(jnp.float32) + dh_s[:]
        dh3 = jnp.concatenate([dh_t, dh_t, dh_t], axis=-1)
        dx = dh3 * c[t].astype(jnp.float32)       # [dr_pre, dz_pre, dn_pre]
        dxg_ref[t] = dx.astype(dxg_ref.dtype)
        dhn = dx[:, 2 * H:] * gates_ref[t][:, :H].astype(jnp.float32)
        dhn_ref[t] = dhn.astype(dhn_ref.dtype)
        dg_hh = jnp.concatenate([dx[:, :2 * H], dhn], axis=-1)
        dh_s[:] = dh_t * gates_ref[t][:, H:2 * H].astype(jnp.float32) \
            + jnp.dot(dg_hh.astype(wt.dtype), wt,
                      preferred_element_type=jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "save_residuals", "tile",
                     "ys_time_major"))
def _gru_fwd_pallas(xg, w_hh, b_hh, interpret: bool = False,
                    save_residuals: bool = True,
                    tile: Optional[Tuple[int, int]] = None,
                    ys_time_major: bool = False):
    """xg [B, N, 3H] -> ys [B, N, H] ([N, B, H] when ``ys_time_major``);
    residuals (gates, hn) TIME-MAJOR [N, B, *] (consumed only by the
    BPTT kernel / dW einsum)."""
    B, N0, H3 = xg.shape
    H = H3 // 3
    cols = (2 * H3 + 2 * H) if save_residuals else (H3 + H)
    bb, chunk = tile or _tile_plan(
        B, cols, xg.dtype.itemsize, w_hh.size * w_hh.dtype.itemsize)
    xg_t = _pad_tm(jnp.swapaxes(xg, 0, 1), chunk, bb)  # [Np, Bp, 3H]
    N, Bp = xg_t.shape[0], xg_t.shape[1]
    grid = (Bp // bb, N // chunk)
    kernel = functools.partial(_gru_fwd_kernel, chunk=chunk, hidden=H,
                               save_residuals=save_residuals)
    in_specs = [
        pl.BlockSpec((H, H3), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H3), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, bb, H3), lambda b, i: (i, b, 0),
                     memory_space=pltpu.VMEM),
    ]
    ys_spec = pl.BlockSpec((chunk, bb, H), lambda b, i: (i, b, 0),
                           memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((bb, H), jnp.float32)]
    b2d = b_hh.reshape(1, H3)
    # Recurrence weights travel in the stream dtype so the in-kernel dot
    # uses the MXU bf16 path in mixed-precision mode (f32 accumulate; the
    # f32 path is bit-identical to before).
    w_in = w_hh if xg.dtype == jnp.float32 else w_hh.astype(xg.dtype)
    if save_residuals:
        ys, gates, hn = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                ys_spec,
                pl.BlockSpec((chunk, bb, H3), lambda b, i: (i, b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, bb, H), lambda b, i: (i, b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N, Bp, H), xg.dtype),
                jax.ShapeDtypeStruct((N, Bp, H3), xg.dtype),
                jax.ShapeDtypeStruct((N, Bp, H), xg.dtype),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
        )(w_in, b2d, xg_t)
        if ys_time_major:
            return ys[:N0, :B], gates[:N0, :B], hn[:N0, :B]
        return (jnp.swapaxes(ys[:N0, :B], 0, 1), gates[:N0, :B],
                hn[:N0, :B])

    def kernel_light(w_ref, b_ref, xg_ref, ys_ref, h_s):
        kernel(w_ref, b_ref, xg_ref, ys_ref, None, None, h_s)

    ys = pl.pallas_call(
        kernel_light,
        grid=grid,
        in_specs=in_specs,
        out_specs=ys_spec,
        out_shape=jax.ShapeDtypeStruct((N, Bp, H), xg.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(w_in, b2d, xg_t)
    if ys_time_major:
        return ys[:N0, :B], None, None
    return jnp.swapaxes(ys[:N0, :B], 0, 1), None, None


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def _gru_bwd_pallas(w_hh, gates, hn, h_prev, dys, interpret: bool = False,
                    tile: Optional[Tuple[int, int]] = None):
    """All activation arguments and outputs TIME-MAJOR [N, B, *]; dys
    arrives batch-major [B, N, H] (the cotangent of the public output)."""
    N0, B, H = hn.shape
    H3 = 3 * H
    # gates + dxg (3H each) + hn + h_prev + dys + dhn, plus the
    # chunk-wide stream-dtype coefficient array of the linearized walk
    # (3H, single-buffered -> 3H/2 double-buffered-equivalents)
    cols = 2 * H3 + 4 * H + (3 * H) // 2
    bb, chunk = tile or _tile_plan(
        B, cols, hn.dtype.itemsize, w_hh.size * w_hh.dtype.itemsize)
    gates = _pad_tm(gates, chunk, bb)
    hn = _pad_tm(hn, chunk, bb)
    h_prev = _pad_tm(h_prev, chunk, bb)
    dys = _pad_tm(jnp.swapaxes(dys, 0, 1).astype(hn.dtype), chunk, bb)
    N, Bp = hn.shape[0], hn.shape[1]
    nc = N // chunk
    rev = lambda b, i: (nc - 1 - i, b, 0)  # noqa: E731

    kernel = functools.partial(_gru_bwd_kernel, chunk=chunk, hidden=H)
    dxg, dhn = pl.pallas_call(
        kernel,
        grid=(Bp // bb, nc),
        in_specs=[
            pl.BlockSpec((H3, H), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, bb, H3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, bb, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, bb, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, bb, H), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, bb, H3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, bb, H), rev, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, Bp, H3), hn.dtype),
            jax.ShapeDtypeStruct((N, Bp, H), hn.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(w_hh.T).astype(hn.dtype) if hn.dtype != jnp.float32
      else jnp.asarray(w_hh.T), gates, hn, h_prev, dys)
    return dxg[:N0, :B], dhn[:N0, :B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gru_core(xg, w_hh, b_hh, interpret: bool = False):
    ys, _, _ = _gru_fwd_pallas(xg, w_hh, b_hh, interpret,
                               save_residuals=False)
    return ys


def _gru_core_fwd(xg, w_hh, b_hh, interpret):
    # time-major ys residual: the whole BPTT path is time-major, so
    # saving the public batch-major output costs two [N,B,H] transposes
    ys_t, gates, hn = _gru_fwd_pallas(xg, w_hh, b_hh, interpret,
                                      save_residuals=True,
                                      ys_time_major=True)
    return jnp.swapaxes(ys_t, 0, 1), (w_hh, ys_t, gates, hn)


def _gru_core_bwd(interpret, res, dys):
    w_hh, ys_t, gates, hn = res
    N, B, H = ys_t.shape
    h_prev = jnp.concatenate(
        [jnp.zeros((1, B, H), ys_t.dtype), ys_t[:-1]], axis=0)
    dxg_t, dhn = _gru_bwd_pallas(w_hh, gates, hn, h_prev, dys,
                                 interpret=interpret)
    # hidden-side gate grads [dr_pre, dz_pre, d(hn_part)] as two einsums
    # (no [N,B,3H] concat materialization); f32 accumulation even when
    # activations stream in bf16
    dw2 = jnp.einsum("nbh,nbg->hg", h_prev, dxg_t[..., : 2 * H],
                     preferred_element_type=jnp.float32)
    dwn = jnp.einsum("nbh,nbg->hg", h_prev, dhn,
                     preferred_element_type=jnp.float32)
    dw = jnp.concatenate([dw2, dwn], axis=-1).astype(w_hh.dtype)
    db = jnp.concatenate([
        jnp.sum(dxg_t[..., : 2 * H].astype(jnp.float32), axis=(0, 1)),
        jnp.sum(dhn.astype(jnp.float32), axis=(0, 1)),
    ]).astype(w_hh.dtype)
    return jnp.swapaxes(dxg_t, 0, 1), dw, db


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


# ---------------------------------------------------------------------------
# Fused bidirectional kernel: both directions of a BiGRU layer advance in
# ONE grid walk (two carries in scratch, two weight sets resident), halving
# the number of sequential kernel steps. Measured on the v5e at the
# scale-up shape this is throughput-NEUTRAL (195.4 vs 195.9 ms/step):
# with time-major blocks the per-step cost is VPU/store work that scales
# with the work done, not fixed launch latency, so the second direction is
# not free. Kept because it halves kernel launches and pipeline setup and
# is never slower; exactness vs the scan reference is pinned by
# tests/test_rnn_pallas.py::test_bigru_fused_parity. The backward-in-time
# direction is handled by the same flip trick as the single-direction
# path: the caller passes its gate stream pre-flipped, both chains run
# forward over their own data, and the caller unflips that output.
# ---------------------------------------------------------------------------


def _bigru_fwd_kernel(wf_ref, bf_ref, wb_ref, bb_ref, xgf_ref, xgb_ref,
                      ysf_ref, ysb_ref, gf_ref, hnf_ref, gb_ref, hnb_ref,
                      hf_s, hb_s, *, chunk: int, hidden: int,
                      save_residuals: bool = True):
    t_step = pl.program_id(1)

    @pl.when(t_step == 0)
    def _():
        hf_s[:] = jnp.zeros_like(hf_s)
        hb_s[:] = jnp.zeros_like(hb_s)

    H = hidden

    def cell(w, b, g, h):
        # stream-dtype w -> MXU bf16 path in mixed precision (f32 accum)
        hg = jnp.dot(h.astype(w.dtype), w,
                     preferred_element_type=jnp.float32) + b
        r = jax.nn.sigmoid(g[:, :H] + hg[:, :H])
        z = jax.nn.sigmoid(g[:, H:2 * H] + hg[:, H:2 * H])
        hn = hg[:, 2 * H:]
        n = jnp.tanh(g[:, 2 * H:] + r * hn)
        return (1.0 - z) * n + z * h, r, z, n, hn

    wf, bf = wf_ref[:], bf_ref[:]
    wb, bb_ = wb_ref[:], bb_ref[:]
    for t in range(chunk):
        hf, rf, zf, nf, hnf = cell(wf, bf, xgf_ref[t].astype(jnp.float32),
                                   hf_s[:])
        hb, rb, zb, nb, hnb = cell(wb, bb_, xgb_ref[t].astype(jnp.float32),
                                   hb_s[:])
        hf_s[:] = hf
        hb_s[:] = hb
        ysf_ref[t] = hf.astype(ysf_ref.dtype)
        ysb_ref[t] = hb.astype(ysb_ref.dtype)
        if save_residuals:
            gf_ref[t] = jnp.concatenate(
                [rf, zf, nf], axis=-1).astype(gf_ref.dtype)
            hnf_ref[t] = hnf.astype(hnf_ref.dtype)
            gb_ref[t] = jnp.concatenate(
                [rb, zb, nb], axis=-1).astype(gb_ref.dtype)
            hnb_ref[t] = hnb.astype(hnb_ref.dtype)


def _bigru_bwd_kernel(wtf_ref, wtb_ref, gf_ref, hnf_ref, hpf_ref, dyf_ref,
                      gb_ref, hnb_ref, hpb_ref, dyb_ref,
                      dxf_ref, dhnf_ref, dxb_ref, dhnb_ref,
                      dhf_s, dhb_s, *, chunk: int, hidden: int):
    t_step = pl.program_id(1)

    @pl.when(t_step == 0)
    def _():
        dhf_s[:] = jnp.zeros_like(dhf_s)
        dhb_s[:] = jnp.zeros_like(dhb_s)

    H = hidden

    # Chunk-vectorized linearization (see _gru_bwd_kernel): the serial
    # walk per timestep is adds + muls + one dot per direction; the two
    # directions' independent chains interleave for ILP. Coefficients
    # live in the stream dtype, built from H-sized slices.
    def coefs(g_ref, hn_ref2, hp_ref2):
        def _sl(i):
            return g_ref[:][..., i * H:(i + 1) * H].astype(jnp.float32)

        r, z, n = _sl(0), _sl(1), _sl(2)
        a = (1.0 - z) * (1.0 - n * n)
        return jnp.concatenate([
            a * hn_ref2[:].astype(jnp.float32) * r * (1.0 - r),
            (hp_ref2[:].astype(jnp.float32) - n) * z * (1.0 - z),
            a,
        ], axis=-1).astype(g_ref.dtype)

    cf = coefs(gf_ref, hnf_ref, hpf_ref)
    cb = coefs(gb_ref, hnb_ref, hpb_ref)
    wtf, wtb = wtf_ref[:], wtb_ref[:]
    for t in range(chunk - 1, -1, -1):
        dhf_t = dyf_ref[t].astype(jnp.float32) + dhf_s[:]
        dhb_t = dyb_ref[t].astype(jnp.float32) + dhb_s[:]
        dxf = jnp.concatenate(                    # [dr_pre, dz_pre, dn_pre]
            [dhf_t, dhf_t, dhf_t], axis=-1) * cf[t].astype(jnp.float32)
        dxb = jnp.concatenate(
            [dhb_t, dhb_t, dhb_t], axis=-1) * cb[t].astype(jnp.float32)
        dxf_ref[t] = dxf.astype(dxf_ref.dtype)
        dxb_ref[t] = dxb.astype(dxb_ref.dtype)
        dhnf = dxf[:, 2 * H:] * gf_ref[t][:, :H].astype(jnp.float32)
        dhnb = dxb[:, 2 * H:] * gb_ref[t][:, :H].astype(jnp.float32)
        dhnf_ref[t] = dhnf.astype(dhnf_ref.dtype)
        dhnb_ref[t] = dhnb.astype(dhnb_ref.dtype)
        dgf = jnp.concatenate([dxf[:, :2 * H], dhnf], axis=-1)
        dgb = jnp.concatenate([dxb[:, :2 * H], dhnb], axis=-1)
        dhf_s[:] = dhf_t * gf_ref[t][:, H:2 * H].astype(jnp.float32) \
            + jnp.dot(dgf.astype(wtf.dtype), wtf,
                      preferred_element_type=jnp.float32)
        dhb_s[:] = dhb_t * gb_ref[t][:, H:2 * H].astype(jnp.float32) \
            + jnp.dot(dgb.astype(wtb.dtype), wtb,
                      preferred_element_type=jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "save_residuals", "tile",
                     "ys_time_major"))
def _bigru_fwd_pallas(xgf, xgb, w_f, b_f, w_b, b_b,
                      interpret: bool = False, save_residuals: bool = True,
                      tile: Optional[Tuple[int, int]] = None,
                      ys_time_major: bool = False):
    """Both gate streams [B, N, 3H] (xgb pre-flipped in time by the
    caller) -> (ysf, ysb) [B, N, H] + time-major residuals per direction.

    ``ys_time_major`` skips the output transpose and returns ysf/ysb as
    [N, B, H] (the kernel's native layout) — the VJP saves them this way
    so the BPTT path never pays the batch<->time round trip."""
    B, N0, H3 = xgf.shape
    H = H3 // 3
    cols = 2 * ((2 * H3 + 2 * H) if save_residuals else (H3 + H))
    bb, chunk = tile or _tile_plan(
        B, cols, xgf.dtype.itemsize, 2 * w_f.size * w_f.dtype.itemsize)
    xgf_t = _pad_tm(jnp.swapaxes(xgf, 0, 1), chunk, bb)
    xgb_t = _pad_tm(jnp.swapaxes(xgb, 0, 1), chunk, bb)
    N, Bp = xgf_t.shape[0], xgf_t.shape[1]
    grid = (Bp // bb, N // chunk)
    kernel = functools.partial(_bigru_fwd_kernel, chunk=chunk, hidden=H,
                               save_residuals=save_residuals)
    wspec = pl.BlockSpec((H, H3), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, H3), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((chunk, bb, H3), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec((chunk, bb, H), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((chunk, bb, H3), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [wspec, bspec, wspec, bspec, xspec, xspec]
    scratch = [pltpu.VMEM((bb, H), jnp.float32),
               pltpu.VMEM((bb, H), jnp.float32)]
    if xgf.dtype != jnp.float32:
        w_f, w_b = w_f.astype(xgf.dtype), w_b.astype(xgf.dtype)
    args = (w_f, b_f.reshape(1, H3), w_b, b_b.reshape(1, H3), xgf_t, xgb_t)
    if save_residuals:
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[yspec, yspec, gspec, yspec, gspec, yspec],
            out_shape=[
                jax.ShapeDtypeStruct((N, Bp, H), xgf.dtype),
                jax.ShapeDtypeStruct((N, Bp, H), xgf.dtype),
                jax.ShapeDtypeStruct((N, Bp, H3), xgf.dtype),
                jax.ShapeDtypeStruct((N, Bp, H), xgf.dtype),
                jax.ShapeDtypeStruct((N, Bp, H3), xgf.dtype),
                jax.ShapeDtypeStruct((N, Bp, H), xgf.dtype),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
        )(*args)
        ysf, ysb, gf, hnf, gb, hnb = outs
        if ys_time_major:
            return (ysf[:N0, :B], ysb[:N0, :B],
                    gf[:N0, :B], hnf[:N0, :B], gb[:N0, :B], hnb[:N0, :B])
        return (jnp.swapaxes(ysf[:N0, :B], 0, 1),
                jnp.swapaxes(ysb[:N0, :B], 0, 1),
                gf[:N0, :B], hnf[:N0, :B], gb[:N0, :B], hnb[:N0, :B])

    def kernel_light(wf_ref, bf_ref, wb_ref, bb_ref, xgf_ref, xgb_ref,
                     ysf_ref, ysb_ref, hf_s, hb_s):
        kernel(wf_ref, bf_ref, wb_ref, bb_ref, xgf_ref, xgb_ref,
               ysf_ref, ysb_ref, None, None, None, None, hf_s, hb_s)

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
    )(*args)
    if ys_time_major:
        return ysf[:N0, :B], ysb[:N0, :B], None, None, None, None
    return (jnp.swapaxes(ysf[:N0, :B], 0, 1),
            jnp.swapaxes(ysb[:N0, :B], 0, 1), None, None, None, None)


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def _bigru_bwd_pallas(w_f, w_b, gf, hnf, hpf, dyf, gb, hnb, hpb, dyb,
                      interpret: bool = False,
                      tile: Optional[Tuple[int, int]] = None):
    """Fused reverse-time BPTT for both directions. Activation args
    time-major [N, B, *]; dyf/dyb batch-major [B, N, H]."""
    N0, B, H = hnf.shape
    H3 = 3 * H
    # two directions; +3H/2 per dir for the linearized walk's
    # stream-dtype coefficient arrays (single-buffered)
    cols = 2 * (2 * H3 + 4 * H + (3 * H) // 2)
    bb, chunk = tile or _tile_plan(
        B, cols, hnf.dtype.itemsize, 2 * w_f.size * w_f.dtype.itemsize)
    pads = [_pad_tm(a, chunk, bb) for a in (gf, hnf, hpf)]
    padsb = [_pad_tm(a, chunk, bb) for a in (gb, hnb, hpb)]
    dyf = _pad_tm(jnp.swapaxes(dyf, 0, 1).astype(hnf.dtype), chunk, bb)
    dyb = _pad_tm(jnp.swapaxes(dyb, 0, 1).astype(hnf.dtype), chunk, bb)
    N, Bp = pads[0].shape[0], pads[0].shape[1]
    nc = N // chunk
    rev = lambda b, i: (nc - 1 - i, b, 0)  # noqa: E731

    kernel = functools.partial(_bigru_bwd_kernel, chunk=chunk, hidden=H)
    wspec = pl.BlockSpec((H3, H), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM)
    g3 = pl.BlockSpec((chunk, bb, H3), rev, memory_space=pltpu.VMEM)
    g1 = pl.BlockSpec((chunk, bb, H), rev, memory_space=pltpu.VMEM)
    dxf, dhnf, dxb, dhnb = pl.pallas_call(
        kernel,
        grid=(Bp // bb, nc),
        in_specs=[wspec, wspec, g3, g1, g1, g1, g3, g1, g1, g1],
        out_specs=[g3, g1, g3, g1],
        out_shape=[
            jax.ShapeDtypeStruct((N, Bp, H3), hnf.dtype),
            jax.ShapeDtypeStruct((N, Bp, H), hnf.dtype),
            jax.ShapeDtypeStruct((N, Bp, H3), hnf.dtype),
            jax.ShapeDtypeStruct((N, Bp, H), hnf.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32),
                        pltpu.VMEM((bb, H), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(w_f.T).astype(hnf.dtype) if hnf.dtype != jnp.float32
      else jnp.asarray(w_f.T),
      jnp.asarray(w_b.T).astype(hnf.dtype) if hnf.dtype != jnp.float32
      else jnp.asarray(w_b.T), pads[0], pads[1], pads[2],
      dyf, padsb[0], padsb[1], padsb[2], dyb)
    return dxf[:N0, :B], dhnf[:N0, :B], dxb[:N0, :B], dhnb[:N0, :B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _bigru_core(xgf, xgb, w_f, b_f, w_b, b_b, interpret: bool = False):
    ysf, ysb, *_ = _bigru_fwd_pallas(xgf, xgb, w_f, b_f, w_b, b_b,
                                     interpret, save_residuals=False)
    return ysf, ysb


def _bigru_core_fwd(xgf, xgb, w_f, b_f, w_b, b_b, interpret):
    # residual ys stay TIME-MAJOR (the kernel's native layout): the BPTT
    # path consumes everything time-major, and the profiler measured the
    # batch<->time round trips of the old batch-major residuals as real
    # HBM wall time (results/r4_bwd_kernel_bench.json)
    ysf_t, ysb_t, gf, hnf, gb, hnb = _bigru_fwd_pallas(
        xgf, xgb, w_f, b_f, w_b, b_b, interpret, save_residuals=True,
        ys_time_major=True)
    outs = (jnp.swapaxes(ysf_t, 0, 1), jnp.swapaxes(ysb_t, 0, 1))
    return outs, (w_f, w_b, ysf_t, ysb_t, gf, hnf, gb, hnb)


def _bigru_core_bwd(interpret, res, dys):
    w_f, w_b, ysf_t, ysb_t, gf, hnf, gb, hnb = res
    dyf, dyb = dys
    N, B, H = ysf_t.shape

    def hprev(ys_t):
        return jnp.concatenate(
            [jnp.zeros((1, B, H), ys_t.dtype), ys_t[:-1]], axis=0)

    hpf, hpb = hprev(ysf_t), hprev(ysb_t)
    dxf_t, dhnf, dxb_t, dhnb = _bigru_bwd_pallas(
        w_f, w_b, gf, hnf, hpf, dyf, gb, hnb, hpb, dyb,
        interpret=interpret)

    def wgrads(hp, dx_t, dhn, w):
        # two einsums instead of materializing the [N,B,3H] concat of
        # (dr_pre, dz_pre, dhn): dw's gate axis is just their stack
        dw2 = jnp.einsum("nbh,nbg->hg", hp, dx_t[..., : 2 * H],
                         preferred_element_type=jnp.float32)
        dwn = jnp.einsum("nbh,nbg->hg", hp, dhn,
                         preferred_element_type=jnp.float32)
        dw = jnp.concatenate([dw2, dwn], axis=-1).astype(w.dtype)
        db = jnp.concatenate([
            jnp.sum(dx_t[..., : 2 * H].astype(jnp.float32), axis=(0, 1)),
            jnp.sum(dhn.astype(jnp.float32), axis=(0, 1)),
        ]).astype(w.dtype)
        return dw, db

    dwf, dbf = wgrads(hpf, dxf_t, dhnf, w_f)
    dwb, dbb = wgrads(hpb, dxb_t, dhnb, w_b)
    return (jnp.swapaxes(dxf_t, 0, 1), jnp.swapaxes(dxb_t, 0, 1),
            dwf, dbf, dwb, dbb)


_bigru_core.defvjp(_bigru_core_fwd, _bigru_core_bwd)


def bigru_recurrence_pallas(
    xg_f: jnp.ndarray, xg_b: jnp.ndarray,
    w_f: jnp.ndarray, b_f: jnp.ndarray,
    w_b: jnp.ndarray, b_b: jnp.ndarray,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused BiGRU layer recurrence: forward direction over ``xg_f`` and
    BACKWARD-in-time direction over ``xg_b``, in one kernel walk.

    Returns (ys_fwd, ys_bwd) in original time order. Equivalent to
    ``gru_recurrence_pallas(xg_f, ...)`` +
    ``gru_recurrence_pallas(xg_b, ..., reverse=True)`` but ~halves the
    sequential kernel-step count (per-step serial latency, not
    arithmetic, dominates the recurrence's wall time).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ysf, ysb = _bigru_core(xg_f, jnp.flip(xg_b, axis=1),
                           w_f, b_f, w_b, b_b, interpret)
    return ysf, jnp.flip(ysb, axis=1)


# ---------------------------------------------------------------------------
# Fully-fused BiGRU LAYER VJP (round 5): the backward kernel also computes
# the INPUT-SIDE gradients — dX projections (dxg @ W_ih^T) per timestep and
# the dW_ih / dW_hh / bias accumulations — so the gate-cotangent stream
# dxg [N, B, 3H] never round-trips HBM and the post-kernel einsums
# disappear. Motivation (results/r5_scaleup_profile.json): the scale-up
# step's backward is 108 of 165 ms; the BPTT walk itself runs at its
# ~12 ms HBM+FLOP floor, and most of the rest is the dX matmuls + dW
# einsums re-reading the kernel's outputs. Inside the kernel those dots
# issue in the VLIW slots the serial dh-chain leaves idle (measured MXU
# occupancy of the walk ~22%), so the work largely hides under the
# latency floor that cannot be removed. dW/db accumulate in f32 VMEM
# blocks with constant index maps (TPU grids run sequentially, so the
# block stays resident and read-modify-write is the standard reduction
# pattern). Numerics match the unfused path: dxg crosses to the dots in
# the stream dtype exactly as the old HBM round-trip stored it.
# ---------------------------------------------------------------------------


def _bigru_bwd_fused_kernel(
        wtf_ref, wtb_ref, wxtf_ref, wxtb_ref,
        gf_ref, hnf_ref, hpf_ref, dyf_ref,
        gb_ref, hnb_ref, hpb_ref, dyb_ref,
        xf_ref, xb_ref,
        dxf_ref, dxb_ref,
        dwhf_ref, dwhb_ref, dwxf_ref, dwxb_ref,
        dbif_ref, dbib_ref, dbhf_ref, dbhb_ref,
        dhf_s, dhb_s, *, chunk: int, hidden: int):
    b_step = pl.program_id(0)
    t_step = pl.program_id(1)

    @pl.when(t_step == 0)
    def _():
        dhf_s[:] = jnp.zeros_like(dhf_s)
        dhb_s[:] = jnp.zeros_like(dhb_s)

    @pl.when((b_step == 0) & (t_step == 0))
    def _():
        for r in (dwhf_ref, dwhb_ref, dwxf_ref, dwxb_ref,
                  dbif_ref, dbib_ref, dbhf_ref, dbhb_ref):
            r[...] = jnp.zeros_like(r)

    H = hidden

    def coefs(g_ref, hn_ref2, hp_ref2):
        def _sl(i):
            return g_ref[:][..., i * H:(i + 1) * H].astype(jnp.float32)

        r, z, n = _sl(0), _sl(1), _sl(2)
        a = (1.0 - z) * (1.0 - n * n)
        return jnp.concatenate([
            a * hn_ref2[:].astype(jnp.float32) * r * (1.0 - r),
            (hp_ref2[:].astype(jnp.float32) - n) * z * (1.0 - z),
            a,
        ], axis=-1).astype(g_ref.dtype)

    cf = coefs(gf_ref, hnf_ref, hpf_ref)
    cb = coefs(gb_ref, hnb_ref, hpb_ref)
    wtf, wtb = wtf_ref[:], wtb_ref[:]
    wxtf, wxtb = wxtf_ref[:], wxtb_ref[:]
    sd = gf_ref.dtype                              # stream dtype

    def acc(ref, val):
        ref[...] += val

    for t in range(chunk - 1, -1, -1):
        dhf_t = dyf_ref[t].astype(jnp.float32) + dhf_s[:]
        dhb_t = dyb_ref[t].astype(jnp.float32) + dhb_s[:]
        dxf3 = jnp.concatenate(
            [dhf_t, dhf_t, dhf_t], axis=-1) * cf[t].astype(jnp.float32)
        dxb3 = jnp.concatenate(
            [dhb_t, dhb_t, dhb_t], axis=-1) * cb[t].astype(jnp.float32)
        dhnf = dxf3[:, 2 * H:] * gf_ref[t][:, :H].astype(jnp.float32)
        dhnb = dxb3[:, 2 * H:] * gb_ref[t][:, :H].astype(jnp.float32)
        dgf = jnp.concatenate([dxf3[:, :2 * H], dhnf], axis=-1)
        dgb = jnp.concatenate([dxb3[:, :2 * H], dhnb], axis=-1)
        # stream-dtype crossings: identical rounding to the unfused path,
        # where dxg/dg were stored to HBM in the stream dtype before the
        # dX matmul and dW einsums consumed them
        dxf3_s = dxf3.astype(sd)
        dxb3_s = dxb3.astype(sd)
        dgf_s = dgf.astype(sd)
        dgb_s = dgb.astype(sd)
        # input-side gradients, off the dependence chain (nothing below
        # consumes them) — they fill the MXU while the dh chain stalls
        dxf_ref[t] = jnp.dot(
            dxf3_s, wxtf, preferred_element_type=jnp.float32).astype(
                dxf_ref.dtype)
        dxb_ref[t] = jnp.dot(
            dxb3_s, wxtb, preferred_element_type=jnp.float32).astype(
                dxb_ref.dtype)
        dims = (((0,), (0,)), ((), ()))            # contract the batch dim
        acc(dwhf_ref, jax.lax.dot_general(
            hpf_ref[t], dgf_s, dims, preferred_element_type=jnp.float32))
        acc(dwhb_ref, jax.lax.dot_general(
            hpb_ref[t], dgb_s, dims, preferred_element_type=jnp.float32))
        acc(dwxf_ref, jax.lax.dot_general(
            xf_ref[t], dxf3_s, dims, preferred_element_type=jnp.float32))
        acc(dwxb_ref, jax.lax.dot_general(
            xb_ref[t], dxb3_s, dims, preferred_element_type=jnp.float32))
        acc(dbif_ref, jnp.sum(dxf3, axis=0, keepdims=True))
        acc(dbib_ref, jnp.sum(dxb3, axis=0, keepdims=True))
        acc(dbhf_ref, jnp.sum(dgf, axis=0, keepdims=True))
        acc(dbhb_ref, jnp.sum(dgb, axis=0, keepdims=True))
        # the serial chain
        dhf_s[:] = dhf_t * gf_ref[t][:, H:2 * H].astype(jnp.float32) \
            + jnp.dot(dgf_s, wtf, preferred_element_type=jnp.float32)
        dhb_s[:] = dhb_t * gb_ref[t][:, H:2 * H].astype(jnp.float32) \
            + jnp.dot(dgb_s, wtb, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def _bigru_bwd_fused_pallas(w_f, w_b, wx_f, wx_b,
                            gf, hnf, hpf, dyf, gb, hnb, hpb, dyb,
                            x_t, xb_t,
                            interpret: bool = False,
                            tile: Optional[Tuple[int, int]] = None):
    """Fused reverse-time BPTT + input-side gradients for both directions.

    Activation args time-major [N, B, *] (``xb_t`` pre-flipped);
    dyf/dyb batch-major [B, N, H]. Returns (dxf_t, dxb_t) [N, B, D] and
    the eight weight/bias gradient accumulators (f32).
    """
    N0, B, H = hnf.shape
    H3 = 3 * H
    D = x_t.shape[-1]
    HD = -(-D // H)                     # D in H-sized column units
    # streams per direction: gates 3H + hn/hp/dy 3H + coefs 3H/2 + x ~HD*H
    # + dx out ~HD*H
    cols = 2 * (2 * H3 + 2 * H + (3 * H) // 2 + 2 * HD * H)
    fixed = (2 * w_f.size * max(w_f.dtype.itemsize, hnf.dtype.itemsize)
             + 2 * wx_f.size * hnf.dtype.itemsize
             + 2 * (H * H3 + D * H3 + 2 * H3) * 4)   # f32 accumulators
    bb, chunk = tile or _tile_plan(B, cols, hnf.dtype.itemsize, fixed)
    pads = [_pad_tm(a, chunk, bb) for a in (gf, hnf, hpf)]
    padsb = [_pad_tm(a, chunk, bb) for a in (gb, hnb, hpb)]
    dyf = _pad_tm(jnp.swapaxes(dyf, 0, 1).astype(hnf.dtype), chunk, bb)
    dyb = _pad_tm(jnp.swapaxes(dyb, 0, 1).astype(hnf.dtype), chunk, bb)
    x_p = _pad_tm(x_t, chunk, bb)
    xb_p = _pad_tm(xb_t, chunk, bb)
    N, Bp = pads[0].shape[0], pads[0].shape[1]
    nc = N // chunk
    rev = lambda b, i: (nc - 1 - i, b, 0)  # noqa: E731
    zero2 = lambda b, i: (0, 0)            # noqa: E731

    kernel = functools.partial(_bigru_bwd_fused_kernel, chunk=chunk,
                               hidden=H)
    sd = hnf.dtype
    wspec = pl.BlockSpec((H3, H), zero2, memory_space=pltpu.VMEM)
    wxspec = pl.BlockSpec((H3, D), zero2, memory_space=pltpu.VMEM)
    g3 = pl.BlockSpec((chunk, bb, H3), rev, memory_space=pltpu.VMEM)
    g1 = pl.BlockSpec((chunk, bb, H), rev, memory_space=pltpu.VMEM)
    gx = pl.BlockSpec((chunk, bb, D), rev, memory_space=pltpu.VMEM)
    awh = pl.BlockSpec((H, H3), zero2, memory_space=pltpu.VMEM)
    awx = pl.BlockSpec((D, H3), zero2, memory_space=pltpu.VMEM)
    ab = pl.BlockSpec((1, H3), zero2, memory_space=pltpu.VMEM)
    f32 = jnp.float32
    outs = pl.pallas_call(
        kernel,
        grid=(Bp // bb, nc),
        in_specs=[wspec, wspec, wxspec, wxspec,
                  g3, g1, g1, g1, g3, g1, g1, g1, gx, gx],
        out_specs=[gx, gx, awh, awh, awx, awx, ab, ab, ab, ab],
        out_shape=[
            jax.ShapeDtypeStruct((N, Bp, D), sd),
            jax.ShapeDtypeStruct((N, Bp, D), sd),
            jax.ShapeDtypeStruct((H, H3), f32),
            jax.ShapeDtypeStruct((H, H3), f32),
            jax.ShapeDtypeStruct((D, H3), f32),
            jax.ShapeDtypeStruct((D, H3), f32),
            jax.ShapeDtypeStruct((1, H3), f32),
            jax.ShapeDtypeStruct((1, H3), f32),
            jax.ShapeDtypeStruct((1, H3), f32),
            jax.ShapeDtypeStruct((1, H3), f32),
        ],
        scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32),
                        pltpu.VMEM((bb, H), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(w_f.T).astype(sd), jnp.asarray(w_b.T).astype(sd),
      jnp.asarray(wx_f.T).astype(sd), jnp.asarray(wx_b.T).astype(sd),
      pads[0], pads[1], pads[2], dyf,
      padsb[0], padsb[1], padsb[2], dyb, x_p, xb_p)
    (dxf, dxb, dwhf, dwhb, dwxf, dwxb,
     dbif, dbib, dbhf, dbhb) = outs
    return (dxf[:N0, :B], dxb[:N0, :B], dwhf, dwhb, dwxf, dwxb,
            dbif[0], dbib[0], dbhf[0], dbhb[0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _bigru_layer_core(x, wih_f, bih_f, whh_f, bhh_f,
                      wih_b, bih_b, whh_b, bhh_b,
                      interpret: bool = False):
    """One BiGRU layer (gate matmuls + fused recurrence) with a VJP that
    runs the fully-fused backward kernel. ``x`` is the layer input in the
    STREAM dtype [B, N, D]; weights stay in their parameter dtype.
    Returns (ys_fwd, ys_bwd) batch-major, original time order."""
    sd = x.dtype
    xg_f = x @ wih_f.astype(sd) + bih_f.astype(sd)
    xg_b = jnp.flip(x, axis=1) @ wih_b.astype(sd) + bih_b.astype(sd)
    ysf, ysb, *_ = _bigru_fwd_pallas(xg_f, xg_b, whh_f, bhh_f, whh_b,
                                     bhh_b, interpret,
                                     save_residuals=False)
    return ysf, jnp.flip(ysb, axis=1)


def _bigru_layer_core_fwd(x, wih_f, bih_f, whh_f, bhh_f,
                          wih_b, bih_b, whh_b, bhh_b, interpret):
    sd = x.dtype
    xg_f = x @ wih_f.astype(sd) + bih_f.astype(sd)
    xg_b = jnp.flip(x, axis=1) @ wih_b.astype(sd) + bih_b.astype(sd)
    ysf_t, ysb_t, gf, hnf, gb, hnb = _bigru_fwd_pallas(
        xg_f, xg_b, whh_f, bhh_f, whh_b, bhh_b, interpret,
        save_residuals=True, ys_time_major=True)
    outs = (jnp.swapaxes(ysf_t, 0, 1),
            jnp.flip(jnp.swapaxes(ysb_t, 0, 1), axis=1))
    res = (x, wih_f, whh_f, wih_b, whh_b, ysf_t, ysb_t, gf, hnf, gb, hnb)
    return outs, res


def _bigru_layer_core_bwd(interpret, res, dys):
    x, wih_f, whh_f, wih_b, whh_b, ysf_t, ysb_t, gf, hnf, gb, hnb = res
    dyf, dyb_unflipped = dys
    dyb = jnp.flip(dyb_unflipped, axis=1)          # back to kernel time
    N, B, H = ysf_t.shape

    def hprev(ys_t):
        return jnp.concatenate(
            [jnp.zeros((1, B, H), ys_t.dtype), ys_t[:-1]], axis=0)

    x_t = jnp.swapaxes(x, 0, 1)                    # [N, B, D] stream dtype
    xb_t = jnp.flip(x_t, axis=0)
    (dxf_t, dxb_t, dwhf, dwhb, dwxf, dwxb,
     dbif, dbib, dbhf, dbhb) = _bigru_bwd_fused_pallas(
        whh_f, whh_b, wih_f, wih_b, gf, hnf, hprev(ysf_t), dyf,
        gb, hnb, hprev(ysb_t), dyb, x_t, xb_t, interpret=interpret)
    dx = (jnp.swapaxes(dxf_t, 0, 1)
          + jnp.flip(jnp.swapaxes(dxb_t, 0, 1), axis=1)).astype(x.dtype)
    pd = wih_f.dtype
    return (dx,
            dwxf.astype(pd), dbif.astype(pd),
            dwhf.astype(pd), dbhf.astype(pd),
            dwxb.astype(pd), dbib.astype(pd),
            dwhb.astype(pd), dbhb.astype(pd))


_bigru_layer_core.defvjp(_bigru_layer_core_fwd, _bigru_layer_core_bwd)


def bigru_layer_pallas(
    x: jnp.ndarray,
    wih_f: jnp.ndarray, bih_f: jnp.ndarray,
    whh_f: jnp.ndarray, bhh_f: jnp.ndarray,
    wih_b: jnp.ndarray, bih_b: jnp.ndarray,
    whh_b: jnp.ndarray, bhh_b: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Full BiGRU layer (both gate matmuls + fused bidirectional
    recurrence) with the fully-fused backward kernel. ``x`` must already
    be in the stream dtype. Returns concat([ys_fwd, ys_bwd], -1).

    MEASURED NEGATIVE at the production scale-up shape and NOT adopted:
    the round-5 A/B (results/r5_fused_layer_ab.json, B=128 N=5000 H=256
    D=512 bf16) reads 71.0 ms/layer-fwdbwd vs 61.4 for the unfused path
    (gate matmuls left to XLA + bigru_recurrence_pallas) — computing the
    dX/dW matmul family inside the serial dh-chain kernel is 15.6% slower
    than XLA's own batched MXU einsums. Kept in-tree, parity-tested
    (tests/test_rnn_pallas.py), as the measured answer to "fuse the whole
    layer": don't."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ysf, ysb = _bigru_layer_core(x, wih_f, bih_f, whh_f, bhh_f,
                                 wih_b, bih_b, whh_b, bhh_b, interpret)
    return jnp.concatenate([ysf, ysb], axis=-1)
