"""Pipeline parallelism: GPipe-style microbatch streaming over a 'stage' axis.

The dp/tp/sp paths (parallel/mesh.py) let XLA insert every collective from
sharding annotations alone. Pipeline parallelism is the one strategy that
cannot be expressed that way — the schedule (which stage computes which
microbatch at which tick) IS the program — so this module writes it
explicitly with ``shard_map`` + ``lax.ppermute``:

- the stacked per-layer parameters shard their leading (layer) dim over
  'stage', so each device holds exactly one layer's weights;
- the batch splits into M microbatches that stream through the stages,
  neighbor-to-neighbor over ICI (``ppermute`` shift by +1) — never through
  host memory;
- the tick loop is a ``lax.scan`` of M + S - 1 steps, so reverse-mode AD
  derives the backward pipeline (reverse ppermutes, reverse schedule)
  automatically — no hand-written backward pass;
- composition with data parallelism is free: on a ('data', 'stage') mesh
  the same program runs with the batch additionally sharded over 'data'.

This is bubble-inclusive GPipe (bubble fraction (S-1)/(M+S-1)); pick
M >= ~4*S to amortize. The payload here is a stack of identical
recurrence layers (the scale-up BiGRU/BiLSTM encoder, whose per-layer
weights at d_model=512 are ~4 MB/stage) but ``pipeline_apply`` takes any
homogeneous ``stage_fn(params_s, x) -> y`` with x/y of one shape.

No reference analog (the reference is single-device, SURVEY.md section
2.3).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8 top-level API; the experimental path is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_pipeline_mesh(
    mesh_shape: Tuple[int, int] = (1, 0),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'stage') mesh. ``stage=0`` = all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n_data, n_stage = mesh_shape
    if n_stage <= 0:
        n_stage = len(devices) // max(n_data, 1)
    use = n_data * n_stage
    arr = np.array(devices[:use]).reshape(n_data, n_stage)
    return Mesh(arr, axis_names=("data", "stage"))


def stack_stage_params(per_stage_params: Sequence[Any]) -> Any:
    """Stack S per-stage parameter pytrees along a new leading dim, ready to
    shard with ``P('stage')`` (each device then holds its own layer)."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *per_stage_params)


def shard_pipeline_params(stacked: Any, mesh: Mesh) -> Any:
    """Place stacked [S, ...] stage params with the layer dim over 'stage'."""
    def put(x):
        spec = P("stage") if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, stacked)


def pipeline_apply(
    stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    mesh: Mesh,
    num_microbatches: int,
) -> jnp.ndarray:
    """Run ``x`` through S sequential stages with microbatch pipelining.

    Args:
        stage_fn: ``(params_s, x_mb) -> y_mb`` for ONE stage; input and
            output must share x's trailing shape (homogeneous pipeline).
        stacked_params: pytree with leading dim S on every leaf (layer s's
            weights at index s), sharded over 'stage'.
        x: [B, ...] batch (sharded over 'data' if the mesh has one).
        mesh: ('data', 'stage') mesh from make_pipeline_mesh.
        num_microbatches: M; per-data-shard batch must divide by it.

    Returns:
        [B, ...] output of the final stage, same sharding as ``x``.
    """
    S = mesh.shape["stage"]
    M = num_microbatches
    S_params = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if S_params != S:
        # without this, shard_map would hand each device a [S_params/S, ...]
        # shard and body's p[0] would silently run only the first layer of
        # each shard — wrong results instead of a loud failure
        raise ValueError(
            f"stacked_params has {S_params} stages but the mesh 'stage' "
            f"axis has {S} devices; they must match (one layer per device)")

    def body(params, xs):
        # local views: params [1, ...] (this stage's layer), xs the local
        # batch shard [B_local, ...]
        params = jax.tree_util.tree_map(lambda p: p[0], params)
        s = jax.lax.axis_index("stage")
        B = xs.shape[0]
        mb = B // M
        x_mbs = xs.reshape((M, mb) + xs.shape[1:])
        buf = jnp.zeros_like(x_mbs[0])          # activation in flight
        out = jnp.zeros_like(x_mbs)             # filled on the last stage
        if hasattr(jax.lax, "pcast"):
            # jax >= 0.8 varying-manner types: the scan carries BECOME
            # stage-varying (ppermute, axis_index masking), so the initial
            # zeros must be marked stage-varying too
            buf = jax.lax.pcast(buf, ("stage",), to="varying")
            out = jax.lax.pcast(out, ("stage",), to="varying")

        def tick(carry, t):
            buf, out = carry
            # stage 0 reads microbatch t from the input; later stages use
            # the activation ppermuted in at the end of the previous tick
            inp = jnp.where(s == 0, x_mbs[jnp.clip(t, 0, M - 1)], buf)
            y = stage_fn(params, inp)
            # microbatch index this stage is working on, valid when
            # 0 <= t - s < M (the GPipe fill/drain diamond)
            j = t - s
            valid = (j >= 0) & (j < M)
            jc = jnp.clip(j, 0, M - 1)
            is_last = s == S - 1
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(valid & is_last, y, out[jc]), jc, 0)
            # hand y to the next stage over ICI (ring shift by +1; the
            # wrap-around edge feeds garbage into stage 0, which ignores it)
            nxt = jax.lax.ppermute(
                y, "stage", [(i, (i + 1) % S) for i in range(S)])
            return (nxt, out), None

        (_, out), _ = jax.lax.scan(
            tick, (buf, out), jnp.arange(M + S - 1))
        # every device returns the LAST stage's outputs so the result is
        # replicated along 'stage' (psum of a one-hot-masked tree)
        out = jax.lax.psum(
            jnp.where(s == S - 1, out, jnp.zeros_like(out)), "stage")
        return out.reshape(xs.shape)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P("stage"), P("data")),
        out_specs=P("data"))
    return fn(stacked_params, x)


# ---------------------------------------------------------------------------
# A concrete homogeneous stage: one BiLSTM layer (d_model -> d_model),
# matching models/lstm.BiLSTMLayer's math on raw parameter dicts — the
# payload used by the pipeline test and the multichip dryrun.
# ---------------------------------------------------------------------------


def bilstm_stage_fn(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """One bidirectional LSTM layer from a raw param dict with keys
    w_ih_{fwd,bwd} [D, 4H], w_hh_{fwd,bwd} [H, 4H], b_{fwd,bwd} [4H]
    (H = D // 2, so output shape == input shape)."""
    from room_slam_tpu.ops.rnn import lstm_recurrence

    ys = []
    for d, rev in (("fwd", False), ("bwd", True)):
        xg = x @ p[f"w_ih_{d}"] + p[f"b_{d}"]
        ys.append(lstm_recurrence(xg, p[f"w_hh_{d}"], reverse=rev))
    return jnp.concatenate(ys, axis=-1)


def init_bilstm_stage_params(key, n_stages: int, d_model: int) -> Any:
    """Stacked random params for ``n_stages`` BiLSTM pipeline stages."""
    h = d_model // 2
    k = 1.0 / np.sqrt(h)
    names = [("w_ih_fwd", (d_model, 4 * h)), ("w_hh_fwd", (h, 4 * h)),
             ("b_fwd", (4 * h,)), ("w_ih_bwd", (d_model, 4 * h)),
             ("w_hh_bwd", (h, 4 * h)), ("b_bwd", (4 * h,))]
    keys = jax.random.split(key, len(names))
    return {
        name: jax.random.uniform(
            kk, (n_stages,) + shape, jnp.float32, minval=-k, maxval=k)
        for kk, (name, shape) in zip(keys, names)
    }


def sequential_apply(stage_fn, stacked_params, x) -> jnp.ndarray:
    """Reference semantics for pipeline_apply: the same stages run back to
    back on one device (used by tests to pin numerical equivalence)."""
    S = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    for s in range(S):
        p = jax.tree_util.tree_map(lambda q: q[s], stacked_params)
        x = stage_fn(p, x)
    return x
