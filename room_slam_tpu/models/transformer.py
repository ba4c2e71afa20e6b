"""Transformer encoder + DETR-style decoder (the reference's 'transformer'
model, ref: src/benchmark/model.py:156-403).

Layer numerics follow torch's post-norm ``nn.TransformerEncoderLayer`` /
``nn.TransformerDecoderLayer`` with ReLU activation so reference-shaped
checkpoints can be imported for parity testing. The anchor attention over
normalized raw coordinates and the relative box heads are identical math to
the reference (model.py:315-347).
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from room_slam_tpu.data.features import trace_stats
from room_slam_tpu.models.common import MLP, ContactRefineStage, MoEFFN, \
    MultiHeadAttention, assemble_output, center_traces_xz, dense, \
    sinusoidal_positions, trace_extent_planes


class EncoderLayer(nn.Module):
    """Post-norm transformer encoder layer (torch default: ReLU FFN).

    ``moe_experts > 0`` swaps the dense FFN for a switch-routed
    Mixture-of-Experts (models/common.MoEFFN) — the expert-parallel
    scaling direction (expert weights shard over 'model'); 0 = reference
    architecture exactly."""

    d_model: int
    nhead: int
    dim_feedforward: int = 512
    dropout: float = 0.1
    moe_experts: int = 0

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        attn = MultiHeadAttention(
            self.d_model, self.nhead, self.dropout, name="self_attn")(
            x, x, x, key_padding_mask=mask, deterministic=deterministic)
        x = nn.LayerNorm(name="norm1")(
            x + nn.Dropout(self.dropout)(attn, deterministic=deterministic))
        if self.moe_experts:
            ff = MoEFFN(self.d_model, self.dim_feedforward,
                        self.moe_experts, self.dropout, name="moe")(
                x, deterministic=deterministic, mask=mask)
        else:
            ff = dense(x, self.dim_feedforward, name="linear1")
            ff = nn.Dropout(self.dropout)(nn.relu(ff),
                                          deterministic=deterministic)
            ff = dense(ff, self.d_model, name="linear2")
        x = nn.LayerNorm(name="norm2")(
            x + nn.Dropout(self.dropout)(ff, deterministic=deterministic))
        return x


class DecoderLayer(nn.Module):
    """Post-norm transformer decoder layer: query self-attn, cross-attn to
    memory with key padding, ReLU FFN."""

    d_model: int
    nhead: int
    dim_feedforward: int = 512
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt, memory, mem_mask=None, deterministic: bool = True):
        sa = MultiHeadAttention(
            self.d_model, self.nhead, self.dropout, name="self_attn")(
            tgt, tgt, tgt, deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm1")(
            tgt + nn.Dropout(self.dropout)(sa, deterministic=deterministic))
        ca = MultiHeadAttention(
            self.d_model, self.nhead, self.dropout, name="cross_attn")(
            tgt, memory, memory, key_padding_mask=mem_mask,
            deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm2")(
            tgt + nn.Dropout(self.dropout)(ca, deterministic=deterministic))
        ff = dense(tgt, self.dim_feedforward, name="linear1")
        ff = nn.Dropout(self.dropout)(nn.relu(ff), deterministic=deterministic)
        ff = dense(ff, self.d_model, name="linear2")
        tgt = nn.LayerNorm(name="norm3")(
            tgt + nn.Dropout(self.dropout)(ff, deterministic=deterministic))
        return tgt


class TraceEncoder(nn.Module):
    """Linear proj + sinusoidal PE + transformer encoder over the trace
    (ref: model.py:197-247)."""

    d_model: int = 128
    nhead: int = 4
    num_layers: int = 3
    dim_feedforward: int = 512
    dropout: float = 0.1
    moe_experts: int = 0

    @nn.compact
    def __call__(
        self, traces, mask=None, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        B, N, _ = traces.shape
        coords = traces[..., :3]
        if mask is None:
            mask = jnp.ones((B, N), dtype=bool)
        mean, scale = trace_stats(coords, mask)

        x = dense(traces, self.d_model, name="input_proj")
        x = x + sinusoidal_positions(N, self.d_model, x.dtype)[None]
        for i in range(self.num_layers):
            x = EncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward,
                self.dropout, moe_experts=self.moe_experts,
                name=f"layer_{i}")(
                x, mask, deterministic=deterministic)
        return x, coords, mean, scale


class ColliderDecoder(nn.Module):
    """Learnable queries cross-attending to trace memory, then anchor
    attention over normalized raw coordinates and relative box heads
    (ref: model.py:250-348)."""

    d_model: int = 128
    nhead: int = 4
    num_layers: int = 3
    num_queries: int = 30
    dim_feedforward: int = 512
    dropout: float = 0.1
    num_classes: int = 4
    # optional no-object head (see models/lstm.py SimpleQueryDecoder)
    objectness: bool = False
    # contact-evidence refinement stages (models/common.ContactRefineStage)
    refine_stages: int = 0
    # extent-plane conditioning of the refine stages (models/lstm.py
    # SimpleQueryDecoder docs); no-op without refine_stages
    extent_features: bool = False

    @nn.compact
    def __call__(
        self, memory, coords, mean, scale, mask=None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, ...]:
        B, N, D = memory.shape
        queries = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, D))
        tgt = jnp.broadcast_to(queries, (B, self.num_queries, D))
        for i in range(self.num_layers):
            tgt = DecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward,
                self.dropout, name=f"layer_{i}")(
                tgt, memory, mem_mask=mask, deterministic=deterministic)

        # anchor attention over raw coords (single-head, scale sqrt(D))
        q = dense(tgt, D, name="q_proj")
        k = dense(memory, D, name="k_proj")
        scores = jnp.einsum("bqd,bnd->bqn", q, k) / math.sqrt(D)
        if mask is not None:
            scores = jnp.where(
                mask[:, None, :], scores, jnp.finfo(scores.dtype).min)
        attn = nn.softmax(scores, axis=-1)
        norm_coords = (coords - mean) / scale
        anchor = jnp.einsum("bqn,bnd->bqd", attn, norm_coords)

        delta = MLP(D, 3, 2, name="center_delta_head")(tgt)
        size_raw = MLP(D, 3, 2, name="size_head")(tgt)
        size_norm = jax.nn.softplus(size_raw) + 1e-4

        def to_world(c_n, s_n):
            return jnp.concatenate(
                [c_n * scale + mean, s_n * scale], axis=-1)

        center_n = anchor + delta
        aux_boxes = []
        if self.refine_stages:
            pool_mask = (mask if mask is not None
                         else jnp.ones(memory.shape[:2], dtype=bool))
            extent = (trace_extent_planes(norm_coords, pool_mask)
                      if self.extent_features else None)
            for i in range(self.refine_stages):
                aux_boxes.append(to_world(center_n, size_norm))
                tgt, center_n, size_norm = ContactRefineStage(
                    D, extent_features=self.extent_features,
                    name=f"refine_{i}")(
                    tgt, center_n, size_norm, norm_coords, memory, pool_mask,
                    extent=extent)

        boxes = to_world(center_n, size_norm)
        classes = dense(tgt, self.num_classes, name="class_head")
        outs = [boxes, classes]
        if self.objectness:
            outs.append(dense(tgt, 1, name="objectness_head")[..., 0])
        if aux_boxes:
            outs.append(jnp.stack(aux_boxes))  # [S, B, Q, 6]
        return tuple(outs)


class TraceToColliderTransformer(nn.Module):
    """Complete transformer model (ref: model.py:372-403)."""

    d_model: int = 128
    nhead: int = 4
    num_encoder_layers: int = 3
    num_decoder_layers: int = 3
    num_queries: int = 30
    dim_feedforward: int = 512
    dropout: float = 0.1
    num_classes: int = 4
    objectness: bool = False
    center_xz: bool = False
    refine_stages: int = 0
    extent_features: bool = False
    moe_experts: int = 0

    @nn.compact
    def __call__(self, traces, mask=None, deterministic: bool = True):
        offs = None
        if self.center_xz:
            traces, offs = center_traces_xz(traces, mask)
        memory, coords, mean, scale = TraceEncoder(
            d_model=self.d_model,
            nhead=self.nhead,
            num_layers=self.num_encoder_layers,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            moe_experts=self.moe_experts,
            name="encoder",
        )(traces, mask, deterministic)
        outs = ColliderDecoder(
            d_model=self.d_model,
            nhead=self.nhead,
            num_layers=self.num_decoder_layers,
            num_queries=self.num_queries,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            num_classes=self.num_classes,
            objectness=self.objectness,
            refine_stages=self.refine_stages,
            extent_features=self.extent_features,
            name="decoder",
        )(memory, coords, mean, scale, mask, deterministic)
        return assemble_output(outs, offs, self.objectness,
                               self.refine_stages)
