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
