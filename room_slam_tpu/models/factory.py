"""Model factory (ref: src/benchmark/model.py:406-448)."""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from room_slam_tpu.config import ModelConfig
from room_slam_tpu.models.lstm import TraceToColliderLSTM
from room_slam_tpu.models.transformer import TraceToColliderTransformer


def build_model(cfg: ModelConfig) -> nn.Module:
    """Build a model by type; both variants share the output dict contract
    ``{'pred_boxes': [B,Q,6], 'pred_classes': [B,Q,C]}``."""
    t = cfg.model_type.lower()
    if t == "transformer":
        return TraceToColliderTransformer(
            d_model=cfg.d_model,
            nhead=cfg.nhead,
            num_encoder_layers=cfg.enc_layers,
            num_decoder_layers=cfg.dec_layers,
            num_queries=cfg.num_queries,
            dim_feedforward=cfg.dim_feedforward,
            dropout=cfg.dropout,
            num_classes=cfg.num_classes,
            objectness=cfg.objectness,
            center_xz=cfg.center_xz,
            refine_stages=cfg.refine_stages,
            extent_features=cfg.extent_features,
            moe_experts=cfg.moe_experts,
        )
    if t == "lstm":
        return TraceToColliderLSTM(
            d_model=cfg.d_model,
            num_queries=cfg.num_queries,
            lstm_layers=cfg.lstm_layers,
            dropout=cfg.dropout,
            num_classes=cfg.num_classes,
            use_pallas=cfg.use_pallas_rnn and _on_tpu(),
            compute_dtype=cfg.compute_dtype,
            objectness=cfg.objectness,
            center_xz=cfg.center_xz,
            refine_stages=cfg.refine_stages,
            extent_features=cfg.extent_features,
            hole_tokens=cfg.hole_tokens,
        )
    if t == "bigru":
        from room_slam_tpu.models.gru import TraceToColliderGRU

        return TraceToColliderGRU(
            d_model=cfg.d_model,
            num_queries=cfg.num_queries,
            gru_layers=cfg.lstm_layers,
            dropout=cfg.dropout,
            num_classes=cfg.num_classes,
            use_pallas=cfg.use_pallas_rnn and _on_tpu(),
            compute_dtype=cfg.compute_dtype,
            objectness=cfg.objectness,
            center_xz=cfg.center_xz,
            refine_stages=cfg.refine_stages,
            extent_features=cfg.extent_features,
        )
    if t == "gru":
        from room_slam_tpu.models.legacy_gru import RoomSlamGRU

        return RoomSlamGRU(
            hidden_size=cfg.d_model,
            max_objects=cfg.num_queries,
            num_classes=cfg.num_classes,
            dropout=cfg.dropout,
        )
    raise ValueError(
        f"Unknown model_type: {cfg.model_type}. "
        "Use 'transformer', 'lstm', 'bigru' or 'gru' (legacy surface).")


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


def init_params(model: nn.Module, cfg: ModelConfig, seed: int = 0,
                seq_len: int = 128, batch: int = 2) -> Dict[str, Any]:
    """Initialize parameters with dummy fixed-shape inputs.

    init runs under jit: eager per-primitive dispatch through the remote TPU
    tunnel costs minutes; one compiled program costs seconds."""
    traces = jnp.zeros((batch, seq_len, cfg.input_dim), dtype=jnp.float32)
    mask = jnp.ones((batch, seq_len), dtype=bool)

    @jax.jit
    def init(key):
        variables = model.init({"params": key}, traces, mask,
                               deterministic=True)
        # keep ONLY the trainable collection: init also materializes sowed
        # collections (e.g. MoEFFN's 'losses'), which must not leak into
        # the optimizer/checkpoint pytree as if they were parameters
        return {"params": variables["params"]}

    return init(jax.random.key(seed))


def count_parameters(params) -> int:
    """Count trainable parameters (ref: model.py:446-448)."""
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
