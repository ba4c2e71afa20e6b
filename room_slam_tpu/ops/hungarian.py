"""Exact linear-sum-assignment (Hungarian) matching inside ``jit``.

The reference syncs every batch item to the CPU and calls
``scipy.optimize.linear_sum_assignment`` (ref: src/benchmark/train.py:56-57) —
a device->host round-trip per training step. Here the classic O(n^3)
shortest-augmenting-path Hungarian algorithm (Jonker-Volgenant style row
addition with potentials) runs as ``lax`` control flow, vmapped over the
batch, so matching stays on device and fuses into the train step.

Matrices are tiny (Q=30..80 queries x M<=50 objects); exactness — not speed —
is the requirement, since matching decides which pairs the losses see.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e30)
# Cost placed on (dummy row, valid column) entries when the problem is padded
# to square. Kept at a power of two well above any real cost so float32
# arithmetic with it is exact-ish and it never wins an argmin against a real
# row (see hungarian_match).
_BIG = jnp.float32(32768.0)


def solve_square(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve the square assignment problem exactly.

    Args:
        cost: ``[n, n]`` float32 cost matrix (finite).

    Returns:
        ``row_for_col [n]`` int32: row assigned to each column. The assignment
        minimizes ``sum_j cost[row_for_col[j], j]``.

    Implementation: the standard augmenting-path Hungarian algorithm with
    row/column potentials (u, v). Arrays are 1-indexed with a virtual column
    0, the textbook formulation, expressed as lax loops with fixed shapes.
    """
    n = cost.shape[0]
    cols = jnp.arange(n + 1)

    def add_row(i, carry):
        """Insert row i (1-indexed) via one shortest augmenting path."""
        u, v, p, way = carry
        minv = jnp.full((n + 1,), _INF, dtype=cost.dtype)
        used = jnp.zeros((n + 1,), dtype=bool)
        p = p.at[0].set(i)
        j0 = jnp.int32(0)

        def cond(state):
            _, _, p, _, _, _, j0 = state
            return p[j0] != 0

        def body(state):
            u, v, p, minv, used, way, j0 = state
            used = used.at[j0].set(True)
            i0 = p[j0]
            # relax every unused real column with row i0
            a_row = jnp.concatenate(
                [jnp.full((1,), _INF, cost.dtype), cost[i0 - 1]])
            cur = a_row - u[i0] - v
            scan_mask = (~used) & (cols >= 1)
            better = scan_mask & (cur < minv)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            # pick the column with the smallest tentative distance
            masked = jnp.where(scan_mask, minv, _INF)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # update potentials
            add_u = jnp.where(used, delta, 0.0)
            u = u.at[p].add(add_u)  # p[j] distinct for used j; +0 elsewhere
            v = v - jnp.where(used, delta, 0.0)
            minv = minv - jnp.where(used, 0.0, delta)
            return u, v, p, minv, used, way, j1

        u, v, p, minv, used, way, j0 = jax.lax.while_loop(
            cond, body, (u, v, p, minv, used, way, j0))

        # unwind the augmenting path
        def aug_cond(state):
            j0, _ = state
            return j0 != 0

        def aug_body(state):
            j0, p = state
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return j1, p

        _, p = jax.lax.while_loop(aug_cond, aug_body, (j0, p))
        return u, v, p, way

    u = jnp.zeros((n + 1,), dtype=cost.dtype)
    v = jnp.zeros((n + 1,), dtype=cost.dtype)
    p = jnp.zeros((n + 1,), dtype=jnp.int32)
    way = jnp.zeros((n + 1,), dtype=jnp.int32)
    u, v, p, way = jax.lax.fori_loop(1, n + 1, add_row, (u, v, p, way))
    return p[1:] - 1  # 0-indexed row per column


@jax.jit
def hungarian_match(
    cost: jnp.ndarray, valid_cols: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Match predictions (rows) to valid ground-truth objects (columns).

    Reproduces ``scipy.linear_sum_assignment`` on the ``[Q, num_valid]``
    submatrix (ref: train.py:44-57) at fixed shape:

    - invalid columns get constant cost 0 (a constant column cannot change
      which rows the valid columns prefer),
    - if ``M > Q``, dummy rows with cost ``_BIG`` on valid columns are added
      so the square problem reproduces rectangular semantics: a valid column
      assigned a dummy row is "unmatched" (only possible when num_valid > Q).

    Args:
        cost: ``[Q, M]`` float32.
        valid_cols: ``[M]`` bool.

    Returns:
        row_for_col: ``[M]`` int32 — matched prediction index per column
            (clipped to [0, Q) even for unmatched columns; see mask).
        matched: ``[M]`` bool — True where a valid column got a real row.
    """
    Q, M = cost.shape
    n = max(Q, M)
    c = jnp.where(valid_cols[None, :], cost, 0.0)
    sq = jnp.zeros((n, n), dtype=cost.dtype)
    sq = sq.at[:Q, :M].set(c)
    if n > Q:
        sq = sq.at[Q:, :M].set(jnp.where(valid_cols[None, :], _BIG, 0.0))
    row_for_col = solve_square(sq)[:M]
    matched = valid_cols & (row_for_col < Q)
    return jnp.minimum(row_for_col, Q - 1), matched


def hungarian_match_batch(
    cost: jnp.ndarray, valid_cols: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """vmapped hungarian_match: cost ``[B, Q, M]``, valid ``[B, M]``."""
    return jax.vmap(hungarian_match)(cost, valid_cols)


def solve_rect(cost: jnp.ndarray, n_rows: jnp.ndarray | None = None
               ) -> jnp.ndarray:
    """Rectangular assignment: cost ``[n, m]`` with n <= m; every row gets a
    distinct column; returns ``col_for_row [n]`` (0-indexed).

    Same augmenting-path algorithm as solve_square but iterating only over
    the n rows — the sequential chain is O(n * m) instead of O(m^2), which
    matters because in set prediction the GT side (n) is far smaller than
    the query side (m).

    ``n_rows`` (traced) optionally limits insertion to the first n_rows rows;
    ``col_for_row`` beyond that is garbage the caller must mask. This is the
    big lever: the sequential augmenting-path loop runs num_valid (~8) times
    instead of max_colliders (50) times.
    """
    n, m = cost.shape
    cols = jnp.arange(m + 1)
    upper = (n + 1) if n_rows is None else (
        jnp.minimum(n_rows, n).astype(jnp.int32) + 1)

    def add_row(i, carry):
        u, v, p, way = carry
        minv = jnp.full((m + 1,), _INF, dtype=cost.dtype)
        used = jnp.zeros((m + 1,), dtype=bool)
        p = p.at[0].set(i)
        j0 = jnp.int32(0)

        def cond(state):
            _, _, p, _, _, _, j0 = state
            return p[j0] != 0

        def body(state):
            u, v, p, minv, used, way, j0 = state
            used = used.at[j0].set(True)
            i0 = p[j0]
            a_row = jnp.concatenate(
                [jnp.full((1,), _INF, cost.dtype), cost[i0 - 1]])
            cur = a_row - u[i0] - v
            scan_mask = (~used) & (cols >= 1)
            better = scan_mask & (cur < minv)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(scan_mask, minv, _INF)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            u = u.at[p].add(jnp.where(used, delta, 0.0))
            v = v - jnp.where(used, delta, 0.0)
            minv = minv - jnp.where(used, 0.0, delta)
            return u, v, p, minv, used, way, j1

        u, v, p, minv, used, way, j0 = jax.lax.while_loop(
            cond, body, (u, v, p, minv, used, way, j0))

        def aug_cond(state):
            j0, _ = state
            return j0 != 0

        def aug_body(state):
            j0, p = state
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return j1, p

        _, p = jax.lax.while_loop(aug_cond, aug_body, (j0, p))
        return u, v, p, way

    u = jnp.zeros((n + 1,), dtype=cost.dtype)
    v = jnp.zeros((m + 1,), dtype=cost.dtype)
    p = jnp.zeros((m + 1,), dtype=jnp.int32)
    way = jnp.zeros((m + 1,), dtype=jnp.int32)
    u, v, p, way = jax.lax.fori_loop(1, upper, add_row, (u, v, p, way))
    # invert: p[j] = row assigned to column j -> col_for_row
    col_for_row = jnp.zeros((n + 1,), dtype=jnp.int32)
    col_for_row = col_for_row.at[p].set(cols)
    return col_for_row[1: n + 1] - 1


def hungarian_match_fast(
    cost: jnp.ndarray, valid_cols: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fast-path matcher for the training loss: same contract as
    ``hungarian_match``, ~an order of magnitude shorter sequential chain.

    Strategy: compact the valid GT columns to the front (stable), keep
    K = min(M, Q) of them, and solve the TRANSPOSED rectangular problem —
    K GT rows against Q prediction columns — so the sequential augmenting-
    path loop runs K times, not max(Q, M) times. Invalid compacted rows get
    constant cost 0; a constant row is indifferent to its column, so valid
    rows' assignments remain optimal.

    Exactness caveat: if num_valid > Q (more objects than queries — never the
    case for the benchmark data where num_valid <= 11 << Q=30), the K kept
    columns are the first Q valid by position rather than the globally
    optimal subset; ``hungarian_match`` keeps the exact semantics.
    """
    Q, M = cost.shape
    K = min(M, Q)
    # stable valid-first ordering of columns
    order = jnp.argsort(~valid_cols, stable=True)  # [M]
    sel = order[:K]
    sub_valid = valid_cols[sel]                     # [K]
    sub = jnp.take(cost, sel, axis=1).T             # [K, Q] transposed
    sub = jnp.where(sub_valid[:, None], sub, 0.0)

    # only insert the valid rows — invalid rows' assignments are never read
    n_valid = jnp.sum(sub_valid).astype(jnp.int32)
    col_for_row = solve_rect(sub, n_rows=n_valid)   # [K] pred per GT row
    # scatter back to original column positions
    row_for_col = jnp.zeros((M,), dtype=jnp.int32)
    row_for_col = row_for_col.at[sel].set(col_for_row)
    kept = jnp.zeros((M,), dtype=bool).at[sel].set(sub_valid)
    matched = valid_cols & kept
    return jnp.clip(row_for_col, 0, Q - 1), matched
