"""Hungarian matcher exactness vs scipy (fixed shapes to bound compile time)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from room_slam_tpu.ops.hungarian import hungarian_match, solve_square


def test_square_exact(rng):
    n = 30
    for _ in range(20):
        c = (rng.normal(size=(n, n)) * rng.uniform(0.1, 50)).astype(
            np.float32)
        ri, ci = linear_sum_assignment(c)
        ours = np.asarray(solve_square(jnp.asarray(c)))
        assert len(set(ours.tolist())) == n  # permutation
        ref = c[ri, ci].sum()
        got = c[ours, np.arange(n)].sum()
        assert abs(ref - got) <= 1e-3 * max(1.0, abs(ref))


def test_rectangular_with_mask(rng):
    Q, M = 30, 50
    for trial in range(20):
        nv = int(rng.integers(0, 20))
        c = (rng.normal(size=(Q, M)) * 5).astype(np.float32)
        valid = np.zeros(M, bool)
        valid[rng.permutation(M)[:nv]] = True
        rows, matched = hungarian_match(jnp.asarray(c), jnp.asarray(valid))
        rows, matched = np.asarray(rows), np.asarray(matched)
        assert matched.sum() == nv
        assert np.array_equal(matched, valid)
        if nv == 0:
            continue
        assert len(set(rows[valid].tolist())) == nv  # distinct predictions
        sub = c[:, valid]
        ri, ci = linear_sum_assignment(sub)
        ref = sub[ri, ci].sum()
        got = c[rows[valid], np.where(valid)[0]].sum()
        assert abs(ref - got) <= 1e-3 * max(1.0, abs(ref)), trial


def test_more_objects_than_queries(rng):
    Q, M = 5, 12
    c = (rng.normal(size=(Q, M)) * 5).astype(np.float32)
    valid = np.ones(M, bool)
    rows, matched = hungarian_match(jnp.asarray(c), jnp.asarray(valid))
    rows, matched = np.asarray(rows), np.asarray(matched)
    assert matched.sum() == Q  # only Q can match
    ri, ci = linear_sum_assignment(c)
    ref = c[ri, ci].sum()
    got = c[rows[matched], np.where(matched)[0]].sum()
    assert abs(ref - got) <= 2e-3 * max(1.0, abs(ref))


def test_matcher_reproduces_reference_costs(rng):
    """End-to-end match() on the reference cost construction
    (class -prob + 5 * L1; ref train.py:44-53)."""
    from room_slam_tpu.ops.losses import match, match_cost
    from scipy.special import softmax

    B, Q, M, C = 3, 30, 50, 4
    pb = rng.normal(size=(B, Q, 6)).astype(np.float32)
    pl = rng.normal(size=(B, Q, C)).astype(np.float32)
    gb = rng.normal(size=(B, M, 6)).astype(np.float32)
    gl = rng.integers(0, C, size=(B, M)).astype(np.int32)
    gv = rng.random((B, M)) < 0.2
    gl = np.where(gv, gl, -1)

    cost = np.asarray(match_cost(
        jnp.asarray(pb), jnp.asarray(pl), jnp.asarray(gb),
        jnp.asarray(jnp.where(jnp.asarray(gv), gl, 0))))
    rows, matched = match(
        jnp.asarray(pb), jnp.asarray(pl), jnp.asarray(gb),
        jnp.asarray(gl), jnp.asarray(gv))
    rows, matched = np.asarray(rows), np.asarray(matched)

    for b in range(B):
        nv = gv[b].sum()
        if nv == 0:
            assert matched[b].sum() == 0
            continue
        # reference-style cost on the valid submatrix
        prob = softmax(pl[b], axis=-1)
        cc = -prob[:, gl[b, gv[b]]]
        cbx = np.abs(pb[b][:, None, :] - gb[b][gv[b]][None]).sum(-1)
        sub = 1.0 * cc + 5.0 * cbx
        ri, ci = linear_sum_assignment(sub)
        ref = sub[ri, ci].sum()
        got = sub[rows[b][gv[b]], np.arange(nv)].sum()
        assert abs(ref - got) <= 1e-3 * max(1.0, abs(ref))
