"""Device-resident data augmentation.

The reference applies augmentation as Python loops over dicts inside
``Dataset.__getitem__`` on the host for every epoch
(ref: src/benchmark/dataloader.py:152-392) — the dominant training cost.
Here the full suite is a pure function of a PRNG key over fixed-shape arrays,
vmapped over the batch and fused into the jitted train step.

Semantics (each cites the reference):
- Y-axis rotation by k*90 deg with size swap at 90/270 (dataloader.py:152-241).
  The 4x rotation expansion of the epoch index space is handled by the dataset;
  the angle index arrives here as data.
- random X-Z translation +-1.0 m (dataloader.py:243-263, 344-349)
- random isotropic scale 0.8-1.2 applied to coords and boxes (dataloader.py:265-294)
- sequence reversal p=0.5 (dataloader.py:357-360) is *inert* in the reference:
  each point keeps its own timestamp and featurization re-sorts by time
  (dataloader.py:433-435), exactly restoring the original order. Not replicated.
- gaussian position noise p=0.8, sigma=(0.02, 0.01, 0.02) (dataloader.py:362-367)
- subsequence crop p=0.5 keeping [start, end) with start < 0.2*len,
  end >= 0.8*len, only when len > 100 (dataloader.py:369-373)
- 2-piece time warp p=0.5, knee k~U(0.4,0.6), scales s1,s2~U(0.5,1.5)
  (dataloader.py:375-388). The reference's second segment uses ``k*s1``
  where a continuous warp needs ``k*t_max*s1`` (dataloader.py:385), which
  makes warped time non-monotone and — after the re-sort in featurization —
  interleaves the two halves of the trace. We use the continuous (monotone)
  formula; the knee/scale distributions are identical.
- collider dropout: gate p=0.5, per-collider drop 0.2, walls (BLOCK with
  size.x or size.z > 5 m) never dropped, never drop everything
  (dataloader.py:296-312, 390-392)
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from room_slam_tpu.config import DataConfig

# exact rotation table for k * 90 degrees: cos, sin
_ROT_COS = jnp.array([1.0, 0.0, -1.0, 0.0], dtype=jnp.float32)
_ROT_SIN = jnp.array([0.0, 1.0, 0.0, -1.0], dtype=jnp.float32)


class Sample(NamedTuple):
    """One fixed-shape training sample (pre-featurization)."""

    raw: jnp.ndarray      # [L, 4] (x, y, z, t), time-sorted, zero-padded
    length: jnp.ndarray   # []     int32, number of valid rows
    boxes: jnp.ndarray    # [M, 6] (cx, cy, cz, sx, sy, sz)
    labels: jnp.ndarray   # [M]    int32, -1 for padding
    valid: jnp.ndarray    # [M]    bool


def rotate_sample(sample: Sample, k: jnp.ndarray) -> Sample:
    """Rotate trace + boxes around the Y axis by k * 90 degrees (k in 0..3).

    x' = c*x + s*z ; z' = -s*x + c*z ; sizes swap x<->z for odd k
    (ref: dataloader.py:167-186, 214-222).
    """
    c = _ROT_COS[k]
    s = _ROT_SIN[k]
    x, y, z, t = (sample.raw[:, i] for i in range(4))
    raw = jnp.stack([c * x + s * z, y, -s * x + c * z, t], axis=-1)

    b = sample.boxes
    cx, cy, cz = b[:, 0], b[:, 1], b[:, 2]
    sx, sy, sz = b[:, 3], b[:, 4], b[:, 5]
    cx_n = c * cx + s * cz
    cz_n = -s * cx + c * cz
    odd = (k % 2) == 1
    sx_n = jnp.where(odd, sz, sx)
    sz_n = jnp.where(odd, sx, sz)
    boxes = jnp.stack([cx_n, cy, cz_n, sx_n, sy, sz_n], axis=-1)
    return sample._replace(raw=raw, boxes=boxes)


def _is_wall(boxes: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """BLOCK colliders larger than 5 m in x or z are walls and are never
    dropped (ref: dataloader.py:302-306)."""
    return (labels == 0) & ((boxes[:, 3] > 5.0) | (boxes[:, 5] > 5.0))


def augment_sample(key: jax.Array, sample: Sample, rotation_k: jnp.ndarray,
                   cfg: DataConfig) -> Sample:
    """Apply the full augmentation suite to one sample. Pure; fixed shapes.

    ``cfg`` must be a static (Python) DataConfig. Order matches the reference
    __getitem__: rotate -> translate -> scale -> noise -> crop -> time-warp ->
    collider dropout (dataloader.py:317-392).
    """
    L = sample.raw.shape[0]
    keys = jax.random.split(key, 12)

    # --- rotation (deterministic per epoch-index) ---
    if cfg.augment_rotation:
        sample = rotate_sample(sample, rotation_k)

    raw, boxes = sample.raw, sample.boxes
    length, labels, valid = sample.length, sample.labels, sample.valid

    # --- translation in X-Z ---
    if cfg.augment_translation:
        t_xz = jax.random.uniform(
            keys[0], (2,), minval=-cfg.translation_range,
            maxval=cfg.translation_range)
        shift = jnp.array([1.0, 0.0, 1.0, 0.0]) * jnp.array(
            [t_xz[0], 0.0, t_xz[1], 0.0])
        raw = raw + shift
        boxes = boxes.at[:, 0].add(t_xz[0])
        boxes = boxes.at[:, 2].add(t_xz[1])

    # --- isotropic scale ---
    if cfg.augment_scale:
        s = jax.random.uniform(
            keys[1], (), minval=cfg.scale_range[0], maxval=cfg.scale_range[1])
        raw = raw * jnp.array([1.0, 1.0, 1.0, 0.0]) * s + raw * jnp.array(
            [0.0, 0.0, 0.0, 1.0])
        boxes = boxes * s

    # --- gaussian position noise ---
    if cfg.noise_prob > 0:
        do_noise = jax.random.uniform(keys[2], ()) < cfg.noise_prob
        sigma = jnp.array(cfg.noise_sigma, dtype=raw.dtype)
        noise = jax.random.normal(keys[3], (L, 3)) * sigma
        raw = jnp.where(
            do_noise,
            raw.at[:, :3].add(noise),
            raw,
        )

    # --- subsequence crop (emulated at fixed shape by a roll + new length) ---
    if cfg.crop_prob > 0:
        do_crop = (jax.random.uniform(keys[4], ()) < cfg.crop_prob) & (
            length > 100)
        lo = (0.2 * length.astype(jnp.float32)).astype(jnp.int32)
        hi = (0.8 * length.astype(jnp.float32)).astype(jnp.int32)
        start = jax.random.randint(keys[5], (), 0, jnp.maximum(lo, 1))
        end = hi + jax.random.randint(
            keys[6], (), 0, jnp.maximum(length - hi, 1))
        start = jnp.where(do_crop, start, 0)
        end = jnp.where(do_crop, end, length)
        idx = jnp.minimum(jnp.arange(L) + start, L - 1)
        raw = jnp.take(raw, idx, axis=0)
        length = end - start

    # --- 2-piece time warp (monotone variant; see module docstring) ---
    if cfg.time_warp_prob > 0:
        do_warp = jax.random.uniform(keys[7], ()) < cfg.time_warp_prob
        t = raw[:, 3]
        t0 = t[0]
        t_rel = t - t0
        t_max = t_rel[jnp.maximum(length - 1, 0)] + 1e-6
        k = jax.random.uniform(keys[8], (), minval=0.4, maxval=0.6)
        s1 = jax.random.uniform(keys[9], (), minval=0.5, maxval=1.5)
        s2 = jax.random.uniform(keys[10], (), minval=0.5, maxval=1.5)
        first = t_rel / t_max < k
        warped = jnp.where(
            first, t_rel * s1, k * t_max * s1 + (t_rel - k * t_max) * s2)
        raw = raw.at[:, 3].set(jnp.where(do_warp, warped, t_rel) + 0.0)

    # --- collider dropout ---
    if cfg.augment_collider_dropout:
        gate = jax.random.uniform(keys[11], ()) < cfg.dropout_gate_prob
        u = jax.random.uniform(
            jax.random.fold_in(keys[11], 1), (boxes.shape[0],))
        keep = _is_wall(boxes, labels) | (u > cfg.collider_dropout_prob)
        new_valid = valid & keep
        # never drop everything (ref: dataloader.py:312)
        new_valid = jnp.where(jnp.any(new_valid), new_valid, valid)
        valid = jnp.where(gate, new_valid, valid)

    return Sample(raw=raw, length=length, boxes=boxes, labels=labels,
                  valid=valid)


def make_augment_batch(cfg: DataConfig):
    """Build a batched augmentation function: (key, Sample[B], rot_k[B]) -> Sample[B]."""

    def fn(key: jax.Array, batch: Sample, rotation_k: jnp.ndarray) -> Sample:
        keys = jax.random.split(key, batch.length.shape[0])
        return jax.vmap(lambda k, s, r: augment_sample(k, s, r, cfg))(
            keys, batch, rotation_k)

    return fn
