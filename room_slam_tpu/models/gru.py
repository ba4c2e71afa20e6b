"""BiGRU encoder + query decoder — the scale-up model family.

BASELINE.json config 4 names a "seq=5000, hidden=512, max_objects=32 bi-GRU
with fused loss" scale-up; this is that model on the benchmark (3D) surface:
a bidirectional GRU encoder (torch ``nn.GRU`` numerics, ops/rnn.py) feeding
the same SimpleQueryDecoder / output contract as the LSTM variant.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from room_slam_tpu.data.features import trace_stats
from room_slam_tpu.models.common import (assemble_output, center_traces_xz,
                                         dense)
from room_slam_tpu.models.lstm import SimpleQueryDecoder, _torch_lstm_init
from room_slam_tpu.ops.rnn import gru_recurrence


class BiGRULayer(nn.Module):
    """One bidirectional GRU layer -> [B, N, 2H]."""

    hidden: int
    use_pallas: bool = False
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d_in = x.shape[-1]
        init = _torch_lstm_init(self.hidden)
        xgs, w_hhs, b_hhs = [], [], []
        for direction in ("fwd", "bwd"):
            w_ih = self.param(f"w_ih_{direction}", init,
                              (d_in, 3 * self.hidden))
            b_ih = self.param(f"b_ih_{direction}", init, (3 * self.hidden,))
            w_hhs.append(self.param(f"w_hh_{direction}", init,
                                    (self.hidden, 3 * self.hidden)))
            b_hhs.append(self.param(f"b_hh_{direction}", init,
                                    (3 * self.hidden,)))
            if self.compute_dtype != "float32":
                # Cast the WEIGHTS so the gate matmul runs on the MXU's
                # native bf16 path and xg is emitted directly in bf16 —
                # no f32 [B, N, 3H] ever hits HBM. bf16 streams halve the
                # recurrence's VMEM/HBM traffic and double the feasible
                # Pallas batch tile (rnn_pallas.py); carry/in-kernel math
                # and params stay f32.
                cd = self.compute_dtype
                xgs.append(x.astype(cd) @ w_ih.astype(cd) + b_ih.astype(cd))
            else:
                xgs.append(x @ w_ih + b_ih)  # one MXU matmul per direction
        if self.use_pallas:
            # fused kernel: both directions advance in one grid walk —
            # per-step serial latency dominates, so the second direction
            # comes nearly free (ops/gru_pallas.bigru_recurrence_pallas)
            from room_slam_tpu.ops.gru_pallas import bigru_recurrence_pallas

            ys_f, ys_b = bigru_recurrence_pallas(
                xgs[0], xgs[1], w_hhs[0], b_hhs[0], w_hhs[1], b_hhs[1])
            return jnp.concatenate([ys_f, ys_b], axis=-1)
        outs = [
            gru_recurrence(xgs[0], w_hhs[0], b_hhs[0], reverse=False),
            gru_recurrence(xgs[1], w_hhs[1], b_hhs[1], reverse=True),
        ]
        return jnp.concatenate(outs, axis=-1)


class GRUTraceEncoder(nn.Module):
    """Linear proj -> stacked BiGRU -> linear out + coordinate statistics."""

    d_model: int = 512
    num_layers: int = 2
    dropout: float = 0.1
    use_pallas: bool = False
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, traces, mask=None, deterministic: bool = True):
        B, N, _ = traces.shape
        coords = traces[..., :3]
        if mask is None:
            mask = jnp.ones((B, N), dtype=bool)
        mean, scale = trace_stats(coords, mask)

        cd = None if self.compute_dtype == "float32" else self.compute_dtype
        x = dense(traces, self.d_model, name="input_proj", dtype=cd)
        hidden = self.d_model // 2
        for layer in range(self.num_layers):
            x = BiGRULayer(hidden, use_pallas=self.use_pallas,
                           compute_dtype=self.compute_dtype,
                           name=f"gru_{layer}")(x)
            if layer < self.num_layers - 1:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        memory = dense(x, self.d_model, name="out_proj", dtype=cd)
        return memory, coords, mean, scale


class TraceToColliderGRU(nn.Module):
    """BiGRU encoder + simple query decoder; same output contract as the
    reference models: {'pred_boxes': [B,Q,6], 'pred_classes': [B,Q,C]}."""

    d_model: int = 512
    num_queries: int = 32
    gru_layers: int = 2
    dropout: float = 0.1
    num_classes: int = 4
    use_pallas: bool = False
    compute_dtype: str = "float32"
    objectness: bool = False
    center_xz: bool = False
    refine_stages: int = 0
    extent_features: bool = False

    @nn.compact
    def __call__(self, traces, mask=None, deterministic: bool = True):
        offs = None
        if self.center_xz:
            traces, offs = center_traces_xz(traces, mask)
        memory, coords, mean, scale = GRUTraceEncoder(
            d_model=self.d_model,
            num_layers=self.gru_layers,
            dropout=self.dropout,
            use_pallas=self.use_pallas,
            compute_dtype=self.compute_dtype,
            name="encoder",
        )(traces, mask, deterministic)
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
