"""Checkpoint I/O.

Saves ``{params, opt_state}`` as flax msgpack plus a JSON sidecar with
``{epoch, val_loss, metrics, config}`` — the same payload the reference
pickles into ``.pth`` (ref: src/benchmark/train.py:484-505). A converter
imports reference-architecture torch ``state_dict``s into our parameter
trees so forward parity can be checked numerically (see
``room_slam_tpu.train.torch_import``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization

from room_slam_tpu.config import ExperimentConfig


def save_checkpoint(
    path: str | Path,
    params: Any,
    opt_state: Any = None,
    epoch: int = 0,
    val_loss: float = float("nan"),
    metrics: Optional[Dict] = None,
    config: Optional[ExperimentConfig] = None,
    extra: Optional[Dict] = None,
) -> None:
    """Write ``<path>.msgpack`` (params [+ opt_state]) and ``<path>.json``.
    ``extra`` merges additional JSON-serializable state (e.g. the LR
    scheduler) into the sidecar."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tree: Dict[str, Any] = {"params": jax.device_get(params)}
    if opt_state is not None:
        tree["opt_state"] = jax.device_get(opt_state)
    payload = serialization.to_bytes(tree)
    path.with_suffix(".msgpack").write_bytes(payload)

    side = {
        "epoch": int(epoch),
        "val_loss": float(val_loss),
        "metrics": metrics or {},
        "has_opt_state": opt_state is not None,
        **(extra or {}),
    }
    if config is not None:
        side["config"] = config.to_dict()
    path.with_suffix(".json").write_text(json.dumps(side, indent=2))


def load_checkpoint(
    path: str | Path,
    params_template: Any,
    opt_state_template: Any = None,
) -> Tuple[Any, Any, Dict]:
    """Restore (params, opt_state, sidecar). Templates provide the pytree
    structure (build the model/optimizer first, then restore into them)."""
    path = Path(path)
    side = json.loads(path.with_suffix(".json").read_text())
    target: Dict[str, Any] = {"params": params_template}
    if side.get("has_opt_state") and opt_state_template is not None:
        target["opt_state"] = opt_state_template
    data = path.with_suffix(".msgpack").read_bytes()
    # from_bytes needs the exact same tree structure that was saved
    if side.get("has_opt_state") and opt_state_template is None:
        # saved with opt_state but caller only wants params: deserialize into
        # a permissive dict and pick params
        state = serialization.msgpack_restore(data)
        params = serialization.from_state_dict(
            params_template, state["params"])
        return params, None, side
    restored = serialization.from_bytes(target, data)
    return restored["params"], restored.get("opt_state"), side


def load_config_from_checkpoint(path: str | Path) -> ExperimentConfig:
    side = json.loads(Path(path).with_suffix(".json").read_text())
    return ExperimentConfig.from_dict(side.get("config", {}))


# ---------------------------------------------------------------------------
# Orbax backend (optional): async, sharding-aware checkpointing for large
# params/opt_state trees. msgpack stays the default (simple, dependency-free
# restore); orbax matters once states stop fitting comfortably in one blob.
# ---------------------------------------------------------------------------


def save_checkpoint_orbax(path: str | Path, params: Any,
                          opt_state: Any = None, **extra) -> None:
    """Save with orbax (directory-based). ``extra`` lands in the same JSON
    sidecar format as the msgpack backend."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    tree: Dict[str, Any] = {"params": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path.with_suffix(".orbax"), tree, force=True)
    ckptr.wait_until_finished()

    side = {k: v for k, v in extra.items() if k != "config"}
    side["has_opt_state"] = opt_state is not None
    side["backend"] = "orbax"
    if "config" in extra and extra["config"] is not None:
        side["config"] = extra["config"].to_dict()
    Path(path).with_suffix(".json").write_text(json.dumps(side, indent=2,
                                                          default=float))


def load_checkpoint_orbax(path: str | Path, params_template: Any,
                          opt_state_template: Any = None):
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    side = json.loads(path.with_suffix(".json").read_text())
    target: Dict[str, Any] = {"params": params_template}
    if side.get("has_opt_state") and opt_state_template is not None:
        target["opt_state"] = opt_state_template
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path.with_suffix(".orbax"), target)
    return restored["params"], restored.get("opt_state"), side
