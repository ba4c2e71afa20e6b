"""Legacy surface model: bidirectional GRU encoder + multi-head MLP decoder.

This is the model the reference's top-level README documents (README.md:
110-125): 2D ``(x, y)`` movement windows -> fixed-size latent -> per-object
heads for class / position / size / orientation / validity over MAX_OBJECTS
slots. The described source files (src/models/room_slam.py) do not exist in
the snapshot, so this is a faithful implementation of the documented contract
with the documented defaults (hidden=128, seq=500, max_objects=10 —
README.md:149-157).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from room_slam_tpu.ops.rnn import gru_recurrence_scan


def _torch_rnn_init(hidden: int):
    k = 1.0 / math.sqrt(hidden)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-k, maxval=k)

    return init


class BiGRULayer(nn.Module):
    """One bidirectional GRU layer -> [B, N, 2H] plus final states [B, 2H]."""

    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        d_in = x.shape[-1]
        init = _torch_rnn_init(self.hidden)
        outs = []
        finals = []
        for direction, reverse in (("fwd", False), ("bwd", True)):
            w_ih = self.param(f"w_ih_{direction}", init,
                              (d_in, 3 * self.hidden))
            b_ih = self.param(f"b_ih_{direction}", init, (3 * self.hidden,))
            w_hh = self.param(f"w_hh_{direction}", init,
                              (self.hidden, 3 * self.hidden))
            b_hh = self.param(f"b_hh_{direction}", init, (3 * self.hidden,))
            xg = x @ w_ih + b_ih
            ys = gru_recurrence_scan(xg, w_hh, b_hh, reverse=reverse)
            outs.append(ys)
            finals.append(ys[:, 0] if reverse else ys[:, -1])
        return jnp.concatenate(outs, axis=-1), jnp.concatenate(finals, axis=-1)


class RoomSlamGRU(nn.Module):
    """GRU encoder + multi-head MLP decoder (ref: README.md:110-125).

    Input: ``[B, S, input_dim]`` windows (default (x, y) -> input_dim=2;
    the loader may append velocity features). Output dict:
      classes       [B, N_obj, num_classes] logits
      positions     [B, N_obj, 2]
      sizes         [B, N_obj, 2]  (softplus, > 0)
      orientations  [B, N_obj, 1]  (radians)
      validity      [B, N_obj, 1]  logits (BCE target: slot has an object)
    Also 'pred_boxes'/'pred_classes' views for shared tooling.
    """

    hidden_size: int = 128
    max_objects: int = 10
    num_classes: int = 4
    gru_layers: int = 2
    dropout: float = 0.1
    input_dim: int = 2

    @nn.compact
    def __call__(self, traces: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        B, S, _ = traces.shape
        # normalize per-window so absolute position is factored out and
        # re-added at decode (same relative-decoding stance as the 3D models)
        if mask is None:
            mask = jnp.ones((B, S), dtype=bool)
        m = mask[..., None].astype(traces.dtype)
        denom = jnp.clip(m.sum(axis=1, keepdims=True), 1.0, None)
        coords = traces[..., : self.input_dim]
        mean = (coords * m).sum(axis=1, keepdims=True) / denom  # [B,1,2]
        centered = (coords - mean) * m
        rms = jnp.sqrt((centered**2).sum(axis=(1, 2), keepdims=True)
                       / denom[..., :1])
        scale = jnp.clip(rms, 1e-3, None)  # [B,1,1]
        x = (coords - mean) / scale

        h = self.hidden_size // 2
        feats = x
        final = None
        for layer in range(self.gru_layers):
            feats, final = BiGRULayer(h, name=f"gru_{layer}")(feats)
            if layer < self.gru_layers - 1:
                feats = nn.Dropout(self.dropout)(
                    feats, deterministic=deterministic)

        z = nn.Dense(self.hidden_size, name="latent_proj")(final)
        z = nn.relu(z)
        z = nn.Dropout(self.dropout)(z, deterministic=deterministic)
        z = nn.Dense(self.hidden_size, name="latent_proj2")(z)
        z = nn.relu(z)

        N = self.max_objects
        classes = nn.Dense(N * self.num_classes, name="class_head")(z)
        classes = classes.reshape(B, N, self.num_classes)
        pos_n = nn.Dense(N * 2, name="position_head")(z).reshape(B, N, 2)
        size_n = nn.Dense(N * 2, name="size_head")(z).reshape(B, N, 2)
        orient = nn.Dense(N, name="orientation_head")(z).reshape(B, N, 1)
        validity = nn.Dense(N, name="validity_head")(z).reshape(B, N, 1)

        positions = pos_n * scale + mean             # denormalize
        sizes = (jax.nn.softplus(size_n) + 1e-4) * scale

        return {
            "classes": classes,
            "positions": positions,
            "sizes": sizes,
            "orientations": orient,
            "validity": validity,
            # shared-tooling views (2D boxes lifted into the common contract)
            "pred_classes": classes,
            "pred_boxes": jnp.concatenate(
                [positions, sizes, orient], axis=-1),  # [B,N,5] rotated box
        }
