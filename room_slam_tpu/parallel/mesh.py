"""Device mesh + sharding utilities.

The reference is strictly single-device (SURVEY.md section 2.3): no DDP, no
collectives. Here scaling is first-class: a ('data', 'model') mesh with

- batches sharded over 'data' (pure data parallelism — the right strategy for
  a ~3M-parameter model),
- optional tensor parallelism over 'model' for the transformer variant
  (attention q/k/v/out and FFN kernels sharded on head/ffn dims), mostly to
  keep the multi-chip path exercised and ready for scale-up configs
  (BASELINE.json configs 4-5),
- optional sequence parallelism over 'seq' on a 3-axis
  ('data', 'seq', 'model') mesh (``make_mesh3``): the [B, L, *] trace
  stream shards along the sequence axis, so the featurizer's neighbor
  diffs become halo exchanges and attention K/V an all-gather — both
  inserted by the SPMD partitioner, not written by hand. This is the
  scaling direction for seq=5000-class captures, where a single chip's
  activation memory, not parameters, is the limit.

jit + NamedSharding lets XLA insert the collectives over ICI; there is no
hand-written collective code on this path.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    mesh_shape: Tuple[int, int] = (0, 1),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2D ('data', 'model') mesh. ``(0, 1)`` = all devices on data."""
    devices = list(devices if devices is not None else jax.devices())
    n_data, n_model = mesh_shape
    if n_data <= 0:
        n_data = len(devices) // max(n_model, 1)
    use = n_data * n_model
    arr = np.array(devices[:use]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def make_mesh_from_config(mesh_shape: Tuple[int, ...],
                          devices: Optional[Sequence[jax.Device]] = None
                          ) -> Mesh:
    """Dispatch on the configured shape: 2-tuple -> ('data', 'model'),
    3-tuple -> ('data', 'seq', 'model'). The trainers call this so
    ``--set mesh.mesh_shape=[2,2,2]`` reaches sequence parallelism from
    the CLI (train.py)."""
    if len(mesh_shape) == 3:
        return make_mesh3(tuple(mesh_shape), devices)
    if len(mesh_shape) == 2:
        return make_mesh(tuple(mesh_shape), devices)
    raise ValueError(
        f"mesh.mesh_shape must have 2 or 3 entries, got {mesh_shape!r}")


def make_mesh3(
    mesh_shape: Tuple[int, int, int] = (0, 1, 1),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 3D ('data', 'seq', 'model') mesh for combined data +
    sequence (+ tensor) parallelism. ``data=0`` = fill with the rest."""
    devices = list(devices if devices is not None else jax.devices())
    n_data, n_seq, n_model = mesh_shape
    if n_data <= 0:
        n_data = len(devices) // max(n_seq * n_model, 1)
    use = n_data * n_seq * n_model
    arr = np.array(devices[:use]).reshape(n_data, n_seq, n_model)
    return Mesh(arr, axis_names=("data", "seq", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch dict on device, batch dim split over 'data'.

    On a mesh with a 'seq' axis, the raw trace [B, L, 4] additionally
    shards its sequence dim over 'seq' (sequence parallelism): the
    featurizer's neighbor diffs and downstream attention then run as an
    SPMD program with XLA-inserted halo exchanges / K/V gathers. Only
    ``raw`` has a true sequence axis — collider slots (boxes/labels/valid)
    are a set, not a sequence, and stay replicated along 'seq'."""
    s = batch_sharding(mesh)
    out = {}
    seq = "seq" in mesh.axis_names and mesh.shape["seq"] > 1
    for k, v in batch.items():
        if seq and k == "raw":
            out[k] = jax.device_put(
                v, NamedSharding(mesh, P("data", "seq", None)))
        else:
            out[k] = jax.device_put(v, s)
    return out


# ---------------------------------------------------------------------------
# Tensor-parallel partition rules (transformer variant)
# ---------------------------------------------------------------------------

# (regex on 'path/to/param', PartitionSpec). First match wins; default = replicated.
_TP_RULES = [
    # attention projections: shard the head dim (output features)
    (r".*(self_attn|cross_attn)/(q_proj|k_proj|v_proj)/kernel", P(None, "model")),
    (r".*(self_attn|cross_attn)/(q_proj|k_proj|v_proj)/bias", P("model")),
    # attention output projection: shard input features (row parallel)
    (r".*(self_attn|cross_attn)/out_proj/kernel", P("model", None)),
    # FFN: column-parallel then row-parallel
    (r".*linear1/kernel", P(None, "model")),
    (r".*linear1/bias", P("model")),
    (r".*linear2/kernel", P("model", None)),
    # MoE FFN (models/common.MoEFFN): EXPERT parallelism — the stacked
    # [E, ...] expert weights shard their expert dim over 'model', so each
    # device computes its own experts and XLA psums the routed outputs.
    # The router ('gate') stays replicated.
    (r".*moe/w1", P("model", None, None)),
    (r".*moe/w2", P("model", None, None)),
    (r".*moe/b1", P("model", None)),
    (r".*moe/b2", P("model", None)),
]


def _spec_for_path(path: str, shape: Tuple[int, ...]) -> P:
    for pattern, spec in _TP_RULES:
        if re.fullmatch(pattern, path):
            if len(spec) == len(shape):
                return spec
    return P()


def param_shardings(params: Any, mesh: Mesh,
                    tensor_parallel: bool = False) -> Any:
    """NamedSharding tree for a parameter pytree. With
    ``tensor_parallel=False`` everything is replicated."""

    def one(path, leaf):
        if not tensor_parallel:
            return NamedSharding(mesh, P())
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        spec = _spec_for_path("/".join(str(k) for k in keys), leaf.shape)
        # only shard if the dim divides evenly
        n_model = mesh.shape["model"]
        for dim, axis in enumerate(spec):
            if axis == "model" and leaf.shape[dim] % n_model != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params: Any, mesh: Mesh,
                 tensor_parallel: bool = False) -> Any:
    shardings = param_shardings(params, mesh, tensor_parallel)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
