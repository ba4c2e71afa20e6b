"""Pallas LSTM kernels vs the lax.scan reference (interpret mode on CPU).

On TPU the same comparisons hold to f32 accumulation noise: at (B=32, N=500)
both implementations sit ~1e-3 relative from the float64 ground truth and
~4e-4 from each other (measured; neither is 'more correct').
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from room_slam_tpu.ops.rnn import gru_recurrence_scan, lstm_recurrence_scan
from room_slam_tpu.ops.rnn_pallas import lstm_recurrence_pallas


@pytest.mark.parametrize("shape", [(2, 17, 8), (4, 64, 16), (3, 100, 32)])
@pytest.mark.parametrize("reverse", [False, True])
def test_forward_parity(shape, reverse, rng):
    B, N, H = shape
    xg = jnp.asarray(rng.normal(size=(B, N, 4 * H)).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.1)
    ref = lstm_recurrence_scan(xg, w, reverse=reverse)
    got = lstm_recurrence_pallas(xg, w, reverse=reverse, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("reverse", [False, True])
def test_gradient_parity(reverse, rng):
    B, N, H = 3, 70, 16
    xg = jnp.asarray(rng.normal(size=(B, N, 4 * H)).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.1)

    def loss(fn):
        return lambda a, b: jnp.sum(jnp.sin(fn(a, b, reverse)))

    g_ref = jax.grad(loss(lstm_recurrence_scan), (0, 1))(xg, w)
    g_pal = jax.grad(
        loss(lambda a, b, r: lstm_recurrence_pallas(a, b, r,
                                                    interpret=True)),
        (0, 1))(xg, w)
    for a, b in zip(g_ref, g_pal):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
        assert rel < 1e-4, rel


@pytest.mark.parametrize("reverse", [False, True])
def test_gru_forward_and_grad_parity(reverse, rng):
    from room_slam_tpu.ops.gru_pallas import gru_recurrence_pallas

    B, N, H = 3, 70, 16
    xg = jnp.asarray(rng.normal(size=(B, N, 3 * H)).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.normal(size=(H, 3 * H)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(3 * H,)).astype(np.float32) * 0.1)

    ref = gru_recurrence_scan(xg, w, b, reverse=reverse)
    got = gru_recurrence_pallas(xg, w, b, reverse=reverse, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    def loss(fn):
        return lambda a, ww, bb: jnp.sum(jnp.sin(fn(a, ww, bb, reverse)))

    g_ref = jax.grad(loss(gru_recurrence_scan), (0, 1, 2))(xg, w, b)
    g_pal = jax.grad(loss(
        lambda a, ww, bb, r: gru_recurrence_pallas(a, ww, bb, r,
                                                   interpret=True)),
        (0, 1, 2))(xg, w, b)
    for a, bb in zip(g_ref, g_pal):
        rel = float(jnp.abs(a - bb).max() / (jnp.abs(a).max() + 1e-9))
        assert rel < 1e-4, rel


def test_batch_tiling_parity(rng, monkeypatch):
    """Force a multi-tile batch grid (grid dim 0) and check both kernels
    and the end-to-end VJP agree with the scan reference, including a
    batch size that doesn't divide the tile (pad rows must stay inert)."""
    import room_slam_tpu.ops.rnn_pallas as rp

    monkeypatch.setattr(rp, "_tile_plan", lambda *a, **k: (2, 8))
    B, N, H = 5, 43, 16  # B=5 pads to 6 -> 3 batch tiles; N pads to 48
    xg = jnp.asarray(rng.normal(size=(B, N, 4 * H)).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.1)
    ref = lstm_recurrence_scan(xg, w, reverse=True)
    got = lstm_recurrence_pallas(xg, w, reverse=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    g_ref = jax.grad(lambda a: jnp.sum(lstm_recurrence_scan(a, w) ** 2))(xg)
    g_pal = jax.grad(lambda a: jnp.sum(
        lstm_recurrence_pallas(a, w, interpret=True) ** 2))(xg)
    rel = float(jnp.abs(g_ref - g_pal).max() / (jnp.abs(g_ref).max() + 1e-9))
    assert rel < 1e-4, rel

    import room_slam_tpu.ops.gru_pallas as gp

    xg3 = jnp.asarray(rng.normal(size=(B, N, 3 * H)).astype(np.float32) * 0.5)
    w3 = jnp.asarray(rng.normal(size=(H, 3 * H)).astype(np.float32) * 0.1)
    b3 = jnp.asarray(rng.normal(size=(3 * H,)).astype(np.float32) * 0.1)
    ref = gru_recurrence_scan(xg3, w3, b3)
    got = gp.gru_recurrence_pallas(xg3, w3, b3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    g_ref = jax.grad(
        lambda a: jnp.sum(gru_recurrence_scan(a, w3, b3) ** 2))(xg3)
    g_pal = jax.grad(lambda a: jnp.sum(
        gp.gru_recurrence_pallas(a, w3, b3, interpret=True) ** 2))(xg3)
    rel = float(jnp.abs(g_ref - g_pal).max() / (jnp.abs(g_ref).max() + 1e-9))
    assert rel < 1e-4, rel


def test_bf16_stream_parity(rng):
    """bfloat16 xg streams everything in bf16 (carry/math stay f32): outputs
    and grads track the f32 scan reference to bf16 resolution."""
    B, N, H = 3, 70, 16
    xg32 = jnp.asarray(rng.normal(size=(B, N, 4 * H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.1)
    ref = lstm_recurrence_scan(xg32, w)
    got = lstm_recurrence_pallas(xg32.astype(jnp.bfloat16), w,
                                 interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               rtol=0.05, atol=0.03)
    g_ref = jax.grad(lambda a: jnp.sum(lstm_recurrence_scan(a, w) ** 2))(xg32)
    g_pal = jax.grad(lambda a: jnp.sum(
        lstm_recurrence_pallas(a.astype(jnp.bfloat16), w,
                               interpret=True).astype(jnp.float32) ** 2))(
        xg32)
    rel = float(jnp.abs(g_ref - g_pal).max() / (jnp.abs(g_ref).max() + 1e-9))
    assert rel < 0.1, rel


def test_tile_plan_vmem_budget():
    """The plan never exceeds the VMEM budget and fills the MXU when it can."""
    from room_slam_tpu.ops.rnn_pallas import _VMEM_BUDGET, _tile_plan

    for batch, cols, elt, wb in [(8, 2560, 4, 786432), (32, 2560, 4, 786432),
                                 (64, 2048, 2, 786432), (128, 2048, 2, 786432),
                                 (3, 160, 4, 4096), (20, 1024, 4, 65536)]:
        bb, chunk = _tile_plan(batch, cols, elt, wb)
        assert bb * 2 * chunk * cols * elt <= _VMEM_BUDGET, (batch, bb, chunk)
        bp = batch if batch < 8 else -(-batch // 8) * 8
        assert bp % bb == 0, (batch, bb)
    # bf16 streams at the scale-up shape (H=256 GRU) should reach a
    # 64-row-or-better tile — the whole point of the tiling
    bb, _ = _tile_plan(128, 8 * 256, 2, 786432)
    assert bb >= 64, bb


def test_padding_region_inert(rng):
    """N not divisible by the chunk: padded timesteps must not leak into
    outputs or gradients."""
    B, H = 2, 8
    w = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.1)
    for N in (1, 31, 33, 65):
        xg = jnp.asarray(
            rng.normal(size=(B, N, 4 * H)).astype(np.float32) * 0.5)
        ref = lstm_recurrence_scan(xg, w)
        got = lstm_recurrence_pallas(xg, w, interpret=True)
        assert got.shape == (B, N, H)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
        g1 = jax.grad(lambda a: jnp.sum(lstm_recurrence_scan(a, w) ** 2))(xg)
        g2 = jax.grad(lambda a: jnp.sum(
            lstm_recurrence_pallas(a, w, interpret=True) ** 2))(xg)
        rel = float(jnp.abs(g1 - g2).max() / (jnp.abs(g1).max() + 1e-9))
        assert rel < 1e-4, (N, rel)


def test_bigru_fused_parity(rng):
    """Fused bidirectional kernel == two single-direction recurrences,
    forward values and all six gradients (interpret mode)."""
    from room_slam_tpu.ops.gru_pallas import bigru_recurrence_pallas

    B, N, H = 3, 53, 16
    xgf = jnp.asarray(rng.normal(size=(B, N, 3 * H)).astype(np.float32) * .5)
    xgb = jnp.asarray(rng.normal(size=(B, N, 3 * H)).astype(np.float32) * .5)
    wf = jnp.asarray(rng.normal(size=(H, 3 * H)).astype(np.float32) * 0.1)
    bf = jnp.asarray(rng.normal(size=(3 * H,)).astype(np.float32) * 0.1)
    wb = jnp.asarray(rng.normal(size=(H, 3 * H)).astype(np.float32) * 0.1)
    bb = jnp.asarray(rng.normal(size=(3 * H,)).astype(np.float32) * 0.1)

    ref_f = gru_recurrence_scan(xgf, wf, bf, reverse=False)
    ref_b = gru_recurrence_scan(xgb, wb, bb, reverse=True)
    got_f, got_b = bigru_recurrence_pallas(xgf, xgb, wf, bf, wb, bb,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref_f),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b),
                               rtol=1e-5, atol=1e-6)

    def loss_ref(xgf, xgb, wf, bf, wb, bb):
        a = gru_recurrence_scan(xgf, wf, bf, reverse=False)
        b = gru_recurrence_scan(xgb, wb, bb, reverse=True)
        return jnp.sum(jnp.sin(a) * jnp.cos(b))

    def loss_fused(xgf, xgb, wf, bf, wb, bb):
        a, b = bigru_recurrence_pallas(xgf, xgb, wf, bf, wb, bb,
                                       interpret=True)
        return jnp.sum(jnp.sin(a) * jnp.cos(b))

    argnums = (0, 1, 2, 3, 4, 5)
    g_ref = jax.grad(loss_ref, argnums)(xgf, xgb, wf, bf, wb, bb)
    g_fus = jax.grad(loss_fused, argnums)(xgf, xgb, wf, bf, wb, bb)
    for i, (a, b) in enumerate(zip(g_ref, g_fus)):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
        assert rel < 1e-4, (i, rel)


def test_bigru_fused_bf16_stream(rng):
    """bf16 gate streams through the fused kernel: f32 outputs follow from
    the caller's cast; values near the f32 fused result."""
    from room_slam_tpu.ops.gru_pallas import bigru_recurrence_pallas

    B, N, H = 2, 40, 16
    xgf = jnp.asarray(rng.normal(size=(B, N, 3 * H)).astype(np.float32) * .5)
    xgb = jnp.asarray(rng.normal(size=(B, N, 3 * H)).astype(np.float32) * .5)
    wf = jnp.asarray(rng.normal(size=(H, 3 * H)).astype(np.float32) * 0.1)
    bf = jnp.zeros((3 * H,), jnp.float32)
    wb = jnp.asarray(rng.normal(size=(H, 3 * H)).astype(np.float32) * 0.1)
    bb = jnp.zeros((3 * H,), jnp.float32)

    f32_f, f32_b = bigru_recurrence_pallas(xgf, xgb, wf, bf, wb, bb,
                                           interpret=True)
    b16_f, b16_b = bigru_recurrence_pallas(
        xgf.astype(jnp.bfloat16), xgb.astype(jnp.bfloat16),
        wf, bf, wb, bb, interpret=True)
    assert b16_f.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(b16_f, dtype=np.float32), np.asarray(f32_f),
        rtol=0.05, atol=0.05)
    np.testing.assert_allclose(
        np.asarray(b16_b, dtype=np.float32), np.asarray(f32_b),
        rtol=0.05, atol=0.05)


def test_bilstm_fused_parity(rng):
    """Fused bidirectional LSTM kernel == two single-direction
    recurrences, forward values and all four gradients (interpret)."""
    from room_slam_tpu.ops.rnn_pallas import bilstm_recurrence_pallas

    B, N, H = 3, 53, 16
    xgf = jnp.asarray(rng.normal(size=(B, N, 4 * H)).astype(np.float32) * .5)
    xgb = jnp.asarray(rng.normal(size=(B, N, 4 * H)).astype(np.float32) * .5)
    wf = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.1)
    wb = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.1)

    ref_f = lstm_recurrence_scan(xgf, wf, reverse=False)
    ref_b = lstm_recurrence_scan(xgb, wb, reverse=True)
    got_f, got_b = bilstm_recurrence_pallas(xgf, xgb, wf, wb,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref_f),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b),
                               rtol=1e-5, atol=1e-6)

    def loss_ref(xgf, xgb, wf, wb):
        a = lstm_recurrence_scan(xgf, wf, reverse=False)
        b = lstm_recurrence_scan(xgb, wb, reverse=True)
        return jnp.sum(jnp.sin(a) * jnp.cos(b))

    def loss_fused(xgf, xgb, wf, wb):
        a, b = bilstm_recurrence_pallas(xgf, xgb, wf, wb, interpret=True)
        return jnp.sum(jnp.sin(a) * jnp.cos(b))

    g_ref = jax.grad(loss_ref, (0, 1, 2, 3))(xgf, xgb, wf, wb)
    g_fus = jax.grad(loss_fused, (0, 1, 2, 3))(xgf, xgb, wf, wb)
    for i, (a, b) in enumerate(zip(g_ref, g_fus)):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
        assert rel < 1e-4, (i, rel)


def test_bigru_layer_fused_vjp_parity(rng):
    """Fully-fused LAYER VJP (gate matmuls + recurrence + in-kernel
    dX/dW/db) == the composed reference, forward and all nine gradients
    (interpret mode, f32)."""
    from room_slam_tpu.ops.gru_pallas import bigru_layer_pallas

    B, N, H, D = 3, 53, 16, 24
    x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32) * 0.5)
    ws = {}
    for d in ("f", "b"):
        ws[f"wih_{d}"] = jnp.asarray(
            rng.normal(size=(D, 3 * H)).astype(np.float32) * 0.1)
        ws[f"bih_{d}"] = jnp.asarray(
            rng.normal(size=(3 * H,)).astype(np.float32) * 0.1)
        ws[f"whh_{d}"] = jnp.asarray(
            rng.normal(size=(H, 3 * H)).astype(np.float32) * 0.1)
        ws[f"bhh_{d}"] = jnp.asarray(
            rng.normal(size=(3 * H,)).astype(np.float32) * 0.1)
    args = (x, ws["wih_f"], ws["bih_f"], ws["whh_f"], ws["bhh_f"],
            ws["wih_b"], ws["bih_b"], ws["whh_b"], ws["bhh_b"])

    def ref(x, wif, bif, whf, bhf, wib, bib, whb, bhb):
        a = gru_recurrence_scan(x @ wif + bif, whf, bhf, reverse=False)
        b = gru_recurrence_scan(x @ wib + bib, whb, bhb, reverse=True)
        return jnp.concatenate([a, b], axis=-1)

    def fused(*a):
        return bigru_layer_pallas(*a, interpret=True)

    np.testing.assert_allclose(np.asarray(fused(*args)),
                               np.asarray(ref(*args)),
                               rtol=1e-5, atol=1e-6)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a)))

    argnums = tuple(range(9))
    g_ref = jax.grad(loss(ref), argnums)(*args)
    g_fus = jax.grad(loss(fused), argnums)(*args)
    for i, (a, b) in enumerate(zip(g_ref, g_fus)):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
        assert rel < 1e-4, (i, rel)


def test_bigru_layer_fused_vjp_bf16(rng):
    """bf16-stream mode of the fused layer: outputs and grads track the
    f32 reference to bf16 resolution."""
    from room_slam_tpu.ops.gru_pallas import bigru_layer_pallas

    B, N, H, D = 2, 40, 16, 16
    x32 = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32) * 0.5)
    wif = jnp.asarray(rng.normal(size=(D, 3 * H)).astype(np.float32) * .1)
    bif = jnp.zeros((3 * H,), jnp.float32)
    whf = jnp.asarray(rng.normal(size=(H, 3 * H)).astype(np.float32) * .1)
    bhf = jnp.zeros((3 * H,), jnp.float32)

    def ref(x):
        a = gru_recurrence_scan(x @ wif + bif, whf, bhf, reverse=False)
        b = gru_recurrence_scan(x @ wif + bif, whf, bhf, reverse=True)
        return jnp.sum(jnp.sin(jnp.concatenate([a, b], -1)))

    def fused(x):
        return jnp.sum(jnp.sin(bigru_layer_pallas(
            x.astype(jnp.bfloat16), wif, bif, whf, bhf,
            wif, bif, whf, bhf, interpret=True).astype(jnp.float32)))

    g_ref = jax.grad(ref)(x32)
    g_fus = jax.grad(fused)(x32)
    rel = float(jnp.abs(g_ref - g_fus).max() / (jnp.abs(g_ref).max()))
    assert rel < 0.08, rel
