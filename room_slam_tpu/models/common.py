"""Shared model components: MLP heads, sinusoidal positions, masked attention.

Numerics deliberately mirror the torch building blocks the reference uses
(``nn.MultiheadAttention`` with packed QKV, post-norm Transformer layers with
ReLU) so that reference-shaped checkpoints can be imported for parity tests.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def dense(x: jnp.ndarray, features: int, name: str) -> jnp.ndarray:
    """Dense layer with torch ``nn.Linear`` initialization — kernel AND bias
    ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (kaiming_uniform with a=sqrt(5)
    collapses to exactly this bound). Keeps our training dynamics aligned
    with the reference's; the parameter tree is identical to nn.Dense."""
    bound = 1.0 / math.sqrt(x.shape[-1])

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound,
                                  maxval=bound)

    return nn.Dense(features, kernel_init=init, bias_init=init,
                    name=name)(x)


class MLP(nn.Module):
    """N-layer ReLU MLP (ref: src/benchmark/model.py:351-369)."""

    hidden_dim: int
    output_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = dense(x, out, name=f"layer_{i}")
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


def sinusoidal_positions(length: int, d_model: int,
                         dtype=jnp.float32) -> jnp.ndarray:
    """Standard sinusoidal positional table ``[length, d_model]``
    (ref: src/benchmark/model.py:156-172). Computed at trace time — length is
    static under jit, so no dynamic extension machinery is needed."""
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32)
        * (-math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((length, d_model), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe.astype(dtype)


class MultiHeadAttention(nn.Module):
    """Multi-head attention matching torch ``nn.MultiheadAttention``
    numerics: per-head scaling 1/sqrt(head_dim), separate q/k/v/out
    projections (torch packs qkv; the importer splits them)."""

    d_model: int
    nhead: int
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,                 # [B, Tq, D]
        key: jnp.ndarray,                   # [B, Tk, D]
        value: jnp.ndarray,                 # [B, Tk, D]
        key_padding_mask: Optional[jnp.ndarray] = None,  # [B, Tk] True=valid
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, Tq, D = query.shape
        H = self.nhead
        hd = D // H
        q = dense(query, D, name="q_proj")
        k = dense(key, D, name="k_proj")
        v = dense(value, D, name="v_proj")

        def split(x, T):
            return x.reshape(B, T, H, hd).transpose(0, 2, 1, 3)

        q = split(q, Tq) / math.sqrt(hd)
        k = split(k, key.shape[1])
        v = split(v, key.shape[1])
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        if key_padding_mask is not None:
            neg = jnp.finfo(scores.dtype).min
            scores = jnp.where(
                key_padding_mask[:, None, None, :], scores, neg)
        attn = nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, D)
        return dense(out, D, name="out_proj")


def center_traces_xz(traces, mask):
    """Translate the trace so its masked XZ mean sits at the origin.

    Returns (shifted traces, offsets [B, 1, 2]). Feature columns 0 and 2
    are the absolute x/z positions (data/features.py); velocity /
    acceleration / speed columns are translation-invariant already.

    Why: the encoder consumes ABSOLUTE coordinates, so models trained on
    origin-centered synthetic rooms memorize the origin — on a real ARKit
    capture (session origin wherever tracking started) every prediction
    lands displaced by the room's offset from (0, 0). Centering at the
    model boundary (paired with uncenter_boxes_xz on the way out) makes
    the whole model translation-invariant without touching checkpoints,
    featurization, or the loss.
    """
    if mask is None:
        mask = jnp.ones(traces.shape[:2], dtype=bool)
    m = mask[..., None].astype(traces.dtype)
    denom = jnp.clip(m.sum(axis=1, keepdims=True), 1.0, None)
    xz = jnp.stack([traces[..., 0], traces[..., 2]], axis=-1)  # [B, N, 2]
    offs = (xz * m).sum(axis=1, keepdims=True) / denom          # [B, 1, 2]
    shifted = traces.at[..., 0].add(-offs[..., 0])
    shifted = shifted.at[..., 2].add(-offs[..., 1])
    # Padding rows are all-zero on input; the shift above would turn them
    # into (-offs_x, -offs_z), and the unmasked BiLSTM/GRU recurrences DO
    # consume padding steps — re-zero so short traces stay truly
    # translation-invariant.
    shifted = jnp.where(mask[..., None], shifted, 0.0)
    return shifted, offs


def uncenter_boxes_xz(boxes, offs):
    """Undo center_traces_xz on predicted boxes [B, Q, 6] (centers only)."""
    return boxes.at[..., 0].add(offs[..., 0]).at[..., 2].add(offs[..., 1])
