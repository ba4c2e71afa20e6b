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


def dense(x: jnp.ndarray, features: int, name: str,
          dtype=None) -> jnp.ndarray:
    """Dense layer with torch ``nn.Linear`` initialization — kernel AND bias
    ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (kaiming_uniform with a=sqrt(5)
    collapses to exactly this bound). Keeps our training dynamics aligned
    with the reference's; the parameter tree is identical to nn.Dense.

    ``dtype`` is flax's compute dtype (params stay float32): pass bfloat16
    to run the matmul on the MXU's native bf16 path and emit bf16
    activations — halving HBM traffic for the big [B, N, D] streams."""
    bound = 1.0 / math.sqrt(x.shape[-1])

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound,
                                  maxval=bound)

    return nn.Dense(features, kernel_init=init, bias_init=init,
                    dtype=dtype, name=name)(x)


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


class MoEFFN(nn.Module):
    """Switch-style Mixture-of-Experts FFN: top-1 routing, static shapes.

    Designed for EXPERT PARALLELISM on a device mesh: the expert weights
    are stacked ``[E, ...]`` and shard their expert dim over 'model'
    (parallel/mesh.py adds the partition rule), so XLA splits the expert
    einsums across devices and psums the partial results — every expert's
    FLOPs run, but each device runs only ITS experts. Dense dispatch (all
    experts compute every token, the top-1 one-hot selects) trades E-fold
    FFN FLOPs for fully static shapes — the TPU-friendly formulation; a
    capacity-based sparse dispatch saves FLOPs only once E is large
    enough that the gather/scatter and load-imbalance costs are paid back.

    Routing is differentiable through the selected expert's gate
    probability (Switch Transformer, arXiv:2101.03961). ``aux_loss`` (the
    usual load-balance term, E * sum_e f_e * p_e over VALID tokens —
    ``mask`` excludes padding positions from the statistics so short
    traces in a fixed-L batch don't skew them) is sowed under the
    'losses' collection; train/loop.py applies it with
    ``train.moe_aux_weight`` via ``mutable=['losses']``.
    """

    d_model: int
    dim_feedforward: int
    num_experts: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 mask: Optional[jnp.ndarray] = None):
        E = self.num_experts
        gate_logits = dense(x, E, name="gate")            # [B, N, E]
        probs = nn.softmax(gate_logits, axis=-1)
        top = jnp.argmax(probs, axis=-1)                  # [B, N]
        onehot = jax.nn.one_hot(top, E, dtype=x.dtype)    # [B, N, E]
        # scale by the winning prob: gradients reach the router
        route = onehot * jnp.take_along_axis(
            probs, top[..., None], axis=-1)

        bound1 = 1.0 / math.sqrt(self.d_model)
        bound2 = 1.0 / math.sqrt(self.dim_feedforward)

        def uinit(bound):
            def init(key, shape, dtype=jnp.float32):
                return jax.random.uniform(key, shape, dtype,
                                          minval=-bound, maxval=bound)
            return init

        w1 = self.param("w1", uinit(bound1),
                        (E, self.d_model, self.dim_feedforward))
        b1 = self.param("b1", uinit(bound1), (E, self.dim_feedforward))
        w2 = self.param("w2", uinit(bound2),
                        (E, self.dim_feedforward, self.d_model))
        b2 = self.param("b2", uinit(bound2), (E, self.d_model))

        h = nn.relu(jnp.einsum("bnd,edf->benf", x, w1)
                    + b1[None, :, None, :])               # [B, E, N, F]
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        y = (jnp.einsum("benf,efd->bend", h, w2)
             + b2[None, :, None, :])                      # [B, E, N, D]
        out = jnp.einsum("bend,bne->bnd", y, route)

        # load-balance auxiliary loss (encourages uniform expert usage);
        # statistics over valid tokens only — padding rows neither vote in
        # f_e/p_e nor count in the denominator
        if mask is None:
            frac = onehot.astype(jnp.float32).mean(axis=(0, 1))     # f_e
            mean_p = probs.astype(jnp.float32).mean(axis=(0, 1))    # p_e
        else:
            m = mask.astype(jnp.float32)[..., None]                 # [B,N,1]
            denom = jnp.maximum(m.sum(), 1.0)
            frac = (onehot.astype(jnp.float32) * m).sum(axis=(0, 1)) / denom
            mean_p = (probs.astype(jnp.float32) * m).sum(axis=(0, 1)) / denom
        self.sow("losses", "moe_aux", E * jnp.sum(frac * mean_p))
        return out


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


def assemble_output(outs, offs, objectness: bool, refine_stages: int):
    """Shared output-dict assembly for the query-decoder model families
    (lstm / bigru / transformer): un-center boxes, unpack the optional
    objectness and aux-stage entries from the decoder tuple."""
    boxes = outs[0]
    if offs is not None:
        boxes = uncenter_boxes_xz(boxes, offs)
    out = {"pred_boxes": boxes, "pred_classes": outs[1]}
    idx = 2
    if objectness:
        out["pred_objectness"] = outs[idx]
        idx += 1
    if refine_stages:
        aux = outs[idx]  # [S, B, Q, 6]
        if offs is not None:
            aux = uncenter_boxes_xz(aux, offs)
        out["pred_aux_boxes"] = aux
    return out


def dense_zeros(x: jnp.ndarray, features: int, name: str) -> jnp.ndarray:
    """Dense layer initialized to exactly zero — used for refinement deltas
    so every refinement stage starts as the identity map and training can
    grow corrections from the stage-1 solution instead of fighting noise."""
    return nn.Dense(features, kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name=name)(x)


def trace_extent_planes(norm_coords, mask):
    """Masked XZ extent planes of the trace, in normalized coordinates.

    Returns ``[B, 4] = (x_min, x_max, z_min, z_max)`` — the four axis-
    aligned planes bounding the visited free space. A walking trace pins
    every boundary wall model-free through exactly these planes
    (tools/ceiling.py measures this: walls sit 0-0.7 m beyond them on the
    real captures), so they are the decisive conditioning signal for wall
    regression under domain shift. All-padding rows return zeros.
    """
    big = jnp.asarray(1e9, norm_coords.dtype)
    x, z = norm_coords[..., 0], norm_coords[..., 2]
    ext = jnp.stack([
        jnp.min(jnp.where(mask, x, big), axis=-1),
        jnp.max(jnp.where(mask, x, -big), axis=-1),
        jnp.min(jnp.where(mask, z, big), axis=-1),
        jnp.max(jnp.where(mask, z, -big), axis=-1),
    ], axis=-1)                                            # [B, 4]
    return jnp.where(mask.any(axis=-1, keepdims=True), ext, 0.0)


def extent_gap_features(center_n, size_n, extent):
    """Per-query extent conditioning: signed gaps from the current box's
    four XZ faces to the trace extent planes, plus the extent spans.

    All in normalized trace units (translation- and scale-equivariant by
    construction, composing with center_xz and the decoder's relative
    parameterization). A wall query's defining property is a near-zero
    face gap on one side; a fixed post-hoc snap prior cannot express
    "touched on the east, 0.7 m clearance on the west" (PARITY.md round 3,
    four measured dead ends) — these features let the REFINEMENT STAGE
    learn per-side clearance from approach behavior instead.

    Returns ``[B, Q, 6]``: (left gap, right gap, near gap, far gap,
    x span, z span); positive gaps = face inside the visited extent.
    """
    x_min, x_max = extent[:, None, 0], extent[:, None, 1]   # [B, 1]
    z_min, z_max = extent[:, None, 2], extent[:, None, 3]
    cx, cz = center_n[..., 0], center_n[..., 2]             # [B, Q]
    hx, hz = 0.5 * size_n[..., 0], 0.5 * size_n[..., 2]
    Q = center_n.shape[1]
    spans = jnp.stack([x_max - x_min, z_max - z_min], axis=-1)  # [B, 1, 2]
    return jnp.concatenate([
        jnp.stack([(cx - hx) - x_min, x_max - (cx + hx),
                   (cz - hz) - z_min, z_max - (cz + hz)], axis=-1),
        jnp.broadcast_to(spans, (center_n.shape[0], Q, 2)),
    ], axis=-1)


def contact_evidence(center_n, radius, norm_coords, values, mask):
    """Pool per-point trace evidence around each query's current box center.

    A walking trace carries the furniture signal LOCALLY: dwell density,
    approach directions, and the visited-space boundary within ~1 box
    radius of the object. Global query attention (one softmax over the
    whole trace) blurs that; this pools with a Gaussian kernel in the XZ
    plane centered on the CURRENT box estimate, so a second-stage head
    sees exactly the evidence that disambiguates a 0.3 m shelf item.

    All terms are [B, Q, N]-shaped einsums (MXU-tiled like attention); the
    [B, Q, N, 3] difference tensor is never materialized.

    Args:
        center_n: [B, Q, 3] box centers in normalized trace coordinates.
        radius:   [B, Q] pooling radius (normalized units).
        norm_coords: [B, N, 3]; values: [B, N, D]; mask: [B, N] True=valid.

    Returns:
        pooled_v [B, Q, D] kernel-weighted memory features,
        offset   [B, Q, 3] mean point offset from the center, in radii,
        density  [B, Q]    fraction of trace time spent inside the kernel.
    """
    m = mask.astype(jnp.float32)
    px, pz = norm_coords[..., 0], norm_coords[..., 2]
    cx, cz = center_n[..., 0], center_n[..., 2]
    d2 = (
        (cx ** 2 + cz ** 2)[:, :, None]
        + (px ** 2 + pz ** 2)[:, None, :]
        - 2.0 * (jnp.einsum("bq,bn->bqn", cx, px)
                 + jnp.einsum("bq,bn->bqn", cz, pz))
    )  # [B, Q, N] squared XZ distance
    w = jnp.exp(-0.5 * d2 / jnp.maximum(radius[..., None] ** 2, 1e-8))
    w = w * m[:, None, :]
    wsum = w.sum(-1)                                       # [B, Q]
    wn = w / (wsum[..., None] + 1e-6)
    # match values' dtype so a bf16 memory stream is consumed as bf16
    # instead of being promoted (and re-materialized) to f32
    pooled_v = jnp.einsum("bqn,bnd->bqd", wn.astype(values.dtype),
                          values).astype(jnp.float32)
    pooled_p = jnp.einsum("bqn,bnd->bqd", wn, norm_coords)
    offset = (pooled_p - center_n) / radius[..., None]
    density = wsum / jnp.clip(m.sum(-1)[:, None], 1.0, None)
    return pooled_v, offset, density


class ContactRefineStage(nn.Module):
    """One second-stage box-refinement step from trace-contact evidence.

    Extends the reference's single-shot anchor-attention decoder
    (ref: src/benchmark/model.py:56-136) with an iterative-refinement
    stage (no reference analog): pool local evidence around the current
    box, then emit a bounded center step (≤ 1 pooling radius, tanh) and a
    bounded log-size multiplier (≤ e^±1). Delta heads are zero-initialized
    so an untrained stage is exactly the identity.

    Operates entirely in normalized trace coordinates, and only on offsets
    relative to the current center — the stage is translation-equivariant
    by construction (composes with model.center_xz).

    With ``extent_features`` (model.extent_features), the stage is also
    conditioned on the signed gaps between the current box faces and the
    trace's XZ extent planes (extent_gap_features) — the model-free signal
    that pins boundary walls, learned instead of snapped.
    """

    d_model: int
    extent_features: bool = False

    @nn.compact
    def __call__(self, decoded, center_n, size_n, norm_coords, values, mask,
                 extent=None):
        D = self.d_model
        # pooling radius: half the XZ footprint diagonal + learnable slack
        # (slack lets the kernel see approach paths just outside the box)
        log_slack = self.param(
            "log_radius_slack",
            nn.initializers.constant(math.log(0.3)), (1,))
        radius = (0.5 * jnp.linalg.norm(size_n[..., ::2], axis=-1)
                  + jnp.exp(log_slack[0]))
        pooled_v, offset, density = contact_evidence(
            center_n, radius, norm_coords, values, mask)
        feat = jnp.concatenate(
            [decoded, pooled_v, offset, density[..., None], size_n,
             radius[..., None]], axis=-1)
        if self.extent_features:
            feat = jnp.concatenate(
                [feat, extent_gap_features(center_n, size_n, extent)],
                axis=-1)
        h = nn.relu(dense(feat, D, name="fuse"))
        d_center = dense_zeros(h, 3, name="dcenter")
        d_size = dense_zeros(h, 3, name="dsize")
        center_n = center_n + jnp.tanh(d_center) * radius[..., None]
        size_n = size_n * jnp.exp(jnp.tanh(d_size))
        decoded = decoded + dense_zeros(h, D, name="dfeat")
        return decoded, center_n, size_n
