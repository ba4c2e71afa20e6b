"""BiLSTM encoder + learnable-query decoder (the reference's 'lstm' model).

Re-designed for TPU from ``TraceToColliderLSTM`` (ref: src/benchmark/
model.py:6-153): the input gate matmuls for the whole sequence run as single
MXU matmuls outside the time loop; the recurrence itself is a ``lax.scan`` or
a fused Pallas kernel (ops/rnn.py). Decoding is pure batched attention math.

Output contract matches the reference:
``{'pred_boxes': [B, Q, 6], 'pred_classes': [B, Q, num_classes]}``.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from room_slam_tpu.data.features import trace_stats
from room_slam_tpu.models.common import (MLP, ContactRefineStage,
                                         assemble_output, center_traces_xz,
                                         dense, trace_extent_planes)
from room_slam_tpu.ops.rnn import lstm_recurrence


def _torch_lstm_init(hidden: int):
    """torch nn.LSTM initializes all weights U(-1/sqrt(H), 1/sqrt(H))."""
    k = 1.0 / math.sqrt(hidden)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-k, maxval=k)

    return init


class BiLSTMLayer(nn.Module):
    """One bidirectional LSTM layer; output = concat(fwd, bwd) -> [B, N, 2H]."""

    hidden: int
    use_pallas: bool = False
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d_in = x.shape[-1]
        init = _torch_lstm_init(self.hidden)
        xgs, w_hhs = [], []
        for direction in ("fwd", "bwd"):
            w_ih = self.param(f"w_ih_{direction}", init,
                              (d_in, 4 * self.hidden))
            w_hhs.append(self.param(f"w_hh_{direction}", init,
                                    (self.hidden, 4 * self.hidden)))
            b = self.param(f"b_{direction}", init, (4 * self.hidden,))
            if self.compute_dtype != "float32":
                # Cast the WEIGHTS (not the matmul output) so the gate
                # matmul runs on the MXU's native bf16 path and xg is
                # emitted directly in bf16 — no f32 [B, N, 4H] ever hits
                # HBM. bf16 streams halve the recurrence's VMEM/HBM
                # traffic and double the feasible Pallas batch tile;
                # carry/in-kernel math stay f32 (rnn_pallas.py); params
                # stay f32.
                cd = self.compute_dtype
                xgs.append(x.astype(cd) @ w_ih.astype(cd) + b.astype(cd))
            else:
                xgs.append(x @ w_ih + b)  # one MXU matmul per direction
        if self.use_pallas:
            # fused kernel: both directions advance in one grid walk —
            # at the flagship's small per-step shapes the second
            # direction comes nearly free (rnn_pallas.py)
            from room_slam_tpu.ops.rnn_pallas import bilstm_recurrence_pallas

            ys_f, ys_b = bilstm_recurrence_pallas(
                xgs[0], xgs[1], w_hhs[0], w_hhs[1])
            return jnp.concatenate([ys_f, ys_b], axis=-1)
        outs = [
            lstm_recurrence(xgs[0], w_hhs[0], reverse=False),
            lstm_recurrence(xgs[1], w_hhs[1], reverse=True),
        ]
        return jnp.concatenate(outs, axis=-1)


class LSTMTraceEncoder(nn.Module):
    """Linear proj -> stacked BiLSTM -> linear out, plus the masked coordinate
    statistics used for relative decoding (ref: model.py:6-53)."""

    d_model: int = 128
    num_layers: int = 2
    dropout: float = 0.1
    use_pallas: bool = False
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(
        self,
        traces: jnp.ndarray,              # [B, N, 11]
        mask: Optional[jnp.ndarray] = None,  # [B, N] True=valid
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        B, N, _ = traces.shape
        coords = traces[..., :3]
        if mask is None:
            mask = jnp.ones((B, N), dtype=bool)
        mean, scale = trace_stats(coords, mask)

        cd = None if self.compute_dtype == "float32" else self.compute_dtype
        x = dense(traces, self.d_model, name="input_proj", dtype=cd)
        hidden = self.d_model // 2
        for layer in range(self.num_layers):
            x = BiLSTMLayer(hidden, use_pallas=self.use_pallas,
                            compute_dtype=self.compute_dtype,
                            name=f"lstm_{layer}")(x)
            if layer < self.num_layers - 1:
                # torch applies inter-layer dropout (model.py:20)
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        memory = dense(x, self.d_model, name="out_proj", dtype=cd)
        return memory, coords, mean, scale


class SimpleQueryDecoder(nn.Module):
    """Learnable queries + single-head dot-product attention + FiLM
    modulation + anchor-relative box heads (ref: model.py:56-136)."""

    d_model: int = 128
    num_queries: int = 30
    num_classes: int = 4
    # Optional no-object head. The reference ranks detections by max softmax
    # prob over the 4 REAL classes (src/benchmark/inference.py:138-143), which
    # saturates at ~1.0 for every query — matched or hallucinated — so ranked
    # AP collapses even when matcher-aligned F1 is high. A sigmoid objectness
    # logit trained on the Hungarian match indicator restores a usable
    # ranking (DETR's background-class trick, adapted as a separate head so
    # the class-head layout stays checkpoint-compatible with the reference).
    objectness: bool = False
    # Iterative contact-evidence refinement stages (0 = reference decoder
    # exactly). Each stage pools trace evidence around the current box and
    # emits bounded center/size corrections (models/common.py
    # ContactRefineStage) — LOW/MID furniture localization from
    # single-contact evidence is where the reference's one-shot global
    # attention tops out.
    refine_stages: int = 0
    # Condition every refine stage on the trace's XZ extent planes (signed
    # box-face-to-plane gaps, models/common.extent_gap_features): the
    # model-free signal that pins boundary walls, learned per side instead
    # of post-hoc snapped. No-op without refine_stages.
    extent_features: bool = False
    # bfloat16 runs the [B, N, D]-sized projections (k/v over the memory
    # stream) on the MXU bf16 path with bf16 activations; the softmax, the
    # masked statistics, and every output head stay float32.
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(
        self,
        memory: jnp.ndarray,   # [B, N, D]
        coords: jnp.ndarray,   # [B, N, 3]
        mean: jnp.ndarray,     # [B, 1, 3]
        scale: jnp.ndarray,    # [B, 1, 1]
        mask: Optional[jnp.ndarray] = None,  # [B, N]
    ) -> Tuple[jnp.ndarray, ...]:
        B, N, D = memory.shape
        cd = None if self.compute_dtype == "float32" else self.compute_dtype
        queries = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, D))
        q_batch = jnp.broadcast_to(queries, (B, self.num_queries, D))

        # global summary for FiLM — accumulate the length-N reduction in
        # f32 even when memory streams as bf16 (the convert fuses into the
        # reduce; bf16 accumulation over N=5000 would not)
        mem32 = memory.astype(jnp.float32)
        if mask is not None:
            m = mask[..., None].astype(jnp.float32)
            denom = jnp.clip(m.sum(axis=1, keepdims=True), 1.0, None)
            global_feat = (mem32 * m).sum(axis=1, keepdims=True) / denom
        else:
            global_feat = mem32.mean(axis=1, keepdims=True)
        gamma = dense(global_feat, D, name="gamma_1")
        gamma = dense(nn.relu(gamma), D, name="gamma_2")
        beta = dense(global_feat, D, name="beta_1")
        beta = dense(nn.relu(beta), D, name="beta_2")

        q = dense(q_batch, D, name="q_proj", dtype=cd)
        k = dense(memory, D, name="k_proj", dtype=cd)
        v = dense(memory, D, name="v_proj", dtype=cd)
        inv_temp = self.param("inv_temp", nn.initializers.ones, ())
        scores = jnp.einsum("bqd,bnd->bqn", q, k).astype(jnp.float32) \
            * inv_temp / math.sqrt(D)
        if mask is not None:
            scores = jnp.where(
                mask[:, None, :], scores, jnp.finfo(scores.dtype).min)
        attn = nn.softmax(scores, axis=-1)           # [B, Q, N]
        # consume v in its own dtype (a mixed-dtype einsum would promote —
        # and re-materialize — the [B, N, D] stream to f32)
        qfeat = jnp.einsum("bqn,bnd->bqd",
                           attn.astype(v.dtype), v).astype(jnp.float32)
        decoded = qfeat * (1.0 + gamma) + beta

        norm_coords = (coords - mean) / scale
        anchor = jnp.einsum("bqn,bnd->bqd", attn, norm_coords)  # [B, Q, 3]

        delta = MLP(D, 3, 2, name="center_delta_head")(decoded)
        size_raw = MLP(D, 3, 2, name="size_head")(decoded)
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
                decoded, center_n, size_norm = ContactRefineStage(
                    D, extent_features=self.extent_features,
                    name=f"refine_{i}")(
                    decoded, center_n, size_norm, norm_coords, v, pool_mask,
                    extent=extent)

        boxes = to_world(center_n, size_norm)
        classes = dense(decoded, self.num_classes, name="class_head")
        outs = [boxes, classes]
        if self.objectness:
            outs.append(dense(decoded, 1, name="objectness_head")[..., 0])
        if aux_boxes:
            outs.append(jnp.stack(aux_boxes))  # [S, B, Q, 6]
        return tuple(outs)


class TraceToColliderLSTM(nn.Module):
    """LSTM encoder + simple query decoder (ref: model.py:139-153)."""

    d_model: int = 128
    num_queries: int = 30
    lstm_layers: int = 2
    dropout: float = 0.1
    num_classes: int = 4
    use_pallas: bool = False
    compute_dtype: str = "float32"
    objectness: bool = False
    # translation-invariant mode: center trace XZ at the model boundary and
    # un-center predicted boxes (see models/common.center_traces_xz). Off by
    # default = reference behavior (absolute coords into the encoder).
    center_xz: bool = False
    refine_stages: int = 0
    extent_features: bool = False
    # Append K interior-hole tokens to the decoder memory: the walk
    # raster's interior unvisited components (ops/refine.hole_components
    # — the 4x furniture-enrichment signal) become attendable tokens
    # whose coordinate IS the hole centroid, so a query anchor (a convex
    # combination of token coords) can land on a region the walker never
    # visited and read its footprint directly. Trace tokens carry no
    # evidence there — the round-4 diagnosis's 34/56 no-candidate
    # furniture GT. 0 = off (reference behavior, byte-identical).
    hole_tokens: int = 0

    @nn.compact
    def __call__(self, traces, mask=None, deterministic: bool = True):
        offs = None
        if self.center_xz:
            traces, offs = center_traces_xz(traces, mask)
        memory, coords, mean, scale = LSTMTraceEncoder(
            d_model=self.d_model,
            num_layers=self.lstm_layers,
            dropout=self.dropout,
            use_pallas=self.use_pallas,
            compute_dtype=self.compute_dtype,
            name="encoder",
        )(traces, mask, deterministic)
        if self.hole_tokens:
            memory, coords, mask = self._append_hole_tokens(
                memory, coords, mask, mean, scale)
        outs = SimpleQueryDecoder(
            d_model=self.d_model,
            num_queries=self.num_queries,
            num_classes=self.num_classes,
            objectness=self.objectness,
            refine_stages=self.refine_stages,
            extent_features=self.extent_features,
            compute_dtype=self.compute_dtype,
            name="decoder",
        )(memory, coords, mean, scale, mask)
        return assemble_output(outs, offs, self.objectness,
                               self.refine_stages)

    # plain helper called from the compact __call__ (a second
    # @nn.compact method per Module is not allowed); param/submodule
    # definitions are in the caller's compact scope
    def _append_hole_tokens(self, memory, coords, mask, mean, scale):
        """Project the K largest interior holes of the walk raster into
        memory tokens (coordinate = hole centroid, feature = normalized
        geometry through a small MLP + a learned type embedding)."""
        from room_slam_tpu.ops.refine import hole_components

        B, N, D = memory.shape
        K = self.hole_tokens
        if mask is None:
            mask = jnp.ones((B, N), dtype=bool)
        # stop_gradient: the raster stats are piecewise-constant in the
        # coords (no useful cotangent), and reverse-mode through the
        # 2x2G flood/label fori_loops would otherwise drag a ~160-step
        # residual chain into the backward graph (minutes of compile)
        h = jax.lax.stop_gradient(jax.vmap(
            lambda c, m: hole_components(c[:, 0], c[:, 2], m, K))(
            coords, mask))                             # dict of [B, K]
        valid = h["area_m2"] > 0.02                    # kill jitter slots
        # empty slots read +/-inf extents from the segment min/max —
        # sanitize BEFORE the MLP (a masked NaN still poisons the
        # decoder's masked global mean via 0 * NaN)
        def safe(a):
            return jnp.where(valid, jnp.nan_to_num(a, posinf=0.0,
                                                   neginf=0.0), 0.0)
        c_x, c_z = safe(h["c_x"]), safe(h["c_z"])
        s_x, s_z = safe(h["s_x"]), safe(h["s_z"])
        area = safe(h["area_m2"])
        sc = scale[:, :, 0]                            # [B, 1]
        geom = jnp.stack([
            (c_x - mean[:, :, 0]) / sc,
            (c_z - mean[:, :, 2]) / sc,
            s_x / sc,
            s_z / sc,
            jnp.log1p(area),
            jnp.minimum(s_x, s_z) / jnp.maximum(jnp.maximum(s_x, s_z),
                                                1e-3),
        ], axis=-1)                                    # [B, K, 6]
        h_emb = self.param("hole_embed",
                           nn.initializers.normal(0.02), (D,))
        h_feat = MLP(D, D, 2, name="hole_proj")(geom) + h_emb
        y_mid = jnp.broadcast_to(mean[:, :, 1], (B, K))
        h_coords = jnp.stack([c_x, y_mid, c_z], axis=-1)  # [B, K, 3]
        return (jnp.concatenate([memory, h_feat.astype(memory.dtype)], 1),
                jnp.concatenate([coords, h_coords], 1),
                jnp.concatenate([mask, valid], 1))
