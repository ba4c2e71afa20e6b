"""Learned per-candidate quality scorer (ops/qscore.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from room_slam_tpu.ops.qscore import (N_FEATURES, candidate_features,
                                      mlp_apply, mlp_init, quality_scale)


def _setup(rng, Q=12, L=200):
    boxes = np.abs(rng.normal(size=(Q, 6))).astype(np.float32) + 0.2
    logits = rng.normal(size=(Q, 4)).astype(np.float32)
    obj = rng.normal(size=(Q,)).astype(np.float32)
    raw = rng.normal(size=(L, 4)).astype(np.float32)
    raw[:, 3] = np.cumsum(np.abs(raw[:, 3]) * 0.05)
    return boxes, logits, obj, raw


def test_features_shape_and_finite(rng):
    boxes, logits, obj, raw = _setup(rng)
    f = np.asarray(candidate_features(
        jnp.asarray(boxes), jnp.asarray(logits), jnp.asarray(obj),
        jnp.asarray(raw), jnp.asarray(raw.shape[0])))
    assert f.shape == (12, N_FEATURES)
    assert np.isfinite(f).all()
    # masked length: features must ignore padded points
    f2 = np.asarray(candidate_features(
        jnp.asarray(boxes), jnp.asarray(logits), jnp.asarray(obj),
        jnp.asarray(np.concatenate([raw, 99 * np.ones_like(raw)])),
        jnp.asarray(raw.shape[0])))
    np.testing.assert_allclose(f, f2, rtol=1e-5, atol=1e-5)


def test_quality_scale_in_unit_interval_and_jits(rng):
    boxes, logits, obj, raw = _setup(rng)
    params = mlp_init(jax.random.key(0))
    s = np.asarray(jax.jit(
        lambda b, lg, o, r, n: quality_scale(params, b, lg, o, r, n)
    )(jnp.asarray(boxes), jnp.asarray(logits), jnp.asarray(obj),
      jnp.asarray(raw), jnp.asarray(raw.shape[0])))
    assert s.shape == (12,)
    assert ((s > 0) & (s < 1)).all()


def test_qscore_auto_gate_reranks_per_capture_confidence(rng, tmp_path):
    """Confidence-gated qscore (``qscore_auto`` — the round-5c lever):
    realbench.apply_operating_point reranks PER CAPTURE only when the
    model's own max candidate confidence reads below tau — the same
    signal and semantics as the adopted ttopt auto-gate. A confident
    (memorized-room) capture must keep its raw confidence ranking
    bit-identically; an unconfident one in the same pooled batch gets
    the learned rescoring."""
    import json

    from room_slam_tpu.tools.realbench import apply_operating_point

    params = mlp_init(jax.random.key(2))
    wpath = tmp_path / "qscore.json"
    wpath.write_text(json.dumps(
        {k: np.asarray(v).tolist() for k, v in params.items()}))

    boxes = np.asarray([
        [0.0, 1.0, 0.0, 1.0, 2.0, 1.0],
        [4.0, 1.0, 4.0, 1.0, 2.0, 1.0],   # far apart: both survive NMS
    ], np.float32)
    confident = np.zeros((2, 4), np.float32)
    confident[:, 0] = 8.0                  # max prob ~0.999 > tau
    vague = np.zeros((2, 4), np.float32)   # max prob 0.25 < tau
    raw = rng.normal(size=(100, 4)).astype(np.float32)
    raw[:, 3] = np.cumsum(np.abs(raw[:, 3]) * 0.05)
    cached = {
        "pred_boxes": np.stack([boxes, boxes]),
        "pred_logits": np.stack([confident, vague]),
        "raw": np.stack([raw] * 2),
        "length": np.asarray([100, 100], np.int32),
    }
    plain = {"threshold": 0.0, "nms": 0.1}
    gated = {"threshold": 0.0, "nms": 0.1,
             "qscore": str(wpath), "qscore_auto": 0.5}
    d0 = apply_operating_point(cached, plain)
    d1 = apply_operating_point(cached, gated)
    c0 = {i: np.sort(d0["conf"][d0["img"] == i]) for i in (0, 1)}
    c1 = {i: np.sort(d1["conf"][d1["img"] == i]) for i in (0, 1)}
    assert len(c1[0]) == 2 and len(c1[1]) == 2
    # capture 0 (confident): gate holds — raw ranking, bit-identical
    np.testing.assert_allclose(c1[0], c0[0], atol=1e-6)
    # capture 1 (unconfident): gate fires — quality_scale in (0, 1)
    # strictly rescales every confidence
    assert (c1[1] < c0[1] - 1e-6).all(), (c1[1], c0[1])


def test_mlp_learns_a_separable_rule(rng):
    # sanity: the tiny MLP can learn to separate on one feature
    import optax

    X = rng.normal(size=(512, N_FEATURES)).astype(np.float32)
    y = (X[:, 0] > 0).astype(np.float32)
    params = mlp_init(jax.random.key(1))
    tx = optax.adam(1e-2)
    opt = tx.init(params)
    Xj, yj = jnp.asarray(X), jnp.asarray(y)

    @jax.jit
    def step(p, o):
        def loss_fn(p):
            return jnp.mean(optax.sigmoid_binary_cross_entropy(
                mlp_apply(p, Xj), yj))

        loss, g = jax.value_and_grad(loss_fn)(p)
        g = {k: (jnp.zeros_like(v) if k in ("mu", "sigma") else g[k])
             for k, v in p.items()}
        upd, o = tx.update(g, o)
        return optax.apply_updates(p, upd), o, loss

    for _ in range(300):
        params, opt, loss = step(params, opt)
    pred = np.asarray(mlp_apply(params, Xj)) > 0
    assert (pred == (y > 0.5)).mean() > 0.95
