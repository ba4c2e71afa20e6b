"""Device-resident data augmentation.

The reference applies augmentation as Python loops over dicts inside
``Dataset.__getitem__`` on the host for every epoch
(ref: src/benchmark/dataloader.py:152-392) — the dominant training cost.
Here the full suite is a pure function of a PRNG key over fixed-shape arrays:
all random draws happen once per BATCH (one threefry dispatch per
distribution, not one per sample), and the transform itself is vmapped.

Semantics (each cites the reference):
- Y-axis rotation by k*90 deg with size swap at 90/270 (dataloader.py:152-241).
  The 4x rotation expansion of the epoch index space is handled by the dataset;
  the angle index arrives here as data.
- random X-Z translation +-1.0 m (dataloader.py:243-263, 344-349)
- random isotropic scale 0.8-1.2 applied to coords and boxes (dataloader.py:265-294)
- sequence reversal p=0.5 (dataloader.py:357-360) is *inert* in the reference:
  each point keeps its own timestamp and featurization re-sorts by time
  (dataloader.py:433-435), exactly restoring the original order. Not
  replicated; locked by a golden test running the reference's own
  featurization on reversed input
  (tests/test_augment.py::test_reversal_is_inert_through_reference_featurization).
- gaussian position noise p=0.8, sigma=(0.02, 0.01, 0.02) (dataloader.py:362-367)
- subsequence crop p=0.5 keeping [start, end) with start < 0.2*len,
  end >= 0.8*len, only when len > 100 (dataloader.py:369-373)
- 2-piece time warp p=0.5, knee k~U(0.4,0.6), scales s1,s2~U(0.5,1.5)
  (dataloader.py:375-388). The reference's second segment uses ``k*s1``
  where a continuous warp needs ``k*t_max*s1`` (dataloader.py:385), which
  makes warped time non-monotone and — after the re-sort in featurization —
  interleaves the two halves of the trace. We use the continuous (monotone)
  formula; the knee/scale distributions are identical, and the formulas
  coincide exactly at t_max=1 (locked by
  tests/test_augment.py::test_time_warp_matches_reference_where_monotone).
- collider dropout: gate p=0.5, per-collider drop 0.2, walls (BLOCK with
  size.x or size.z > 5 m) never dropped, never drop everything
  (dataloader.py:296-312, 390-392)
"""

from __future__ import annotations

from typing import NamedTuple

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


class AugRand(NamedTuple):
    """Per-sample random draws (leading batch dim when drawn for a batch)."""

    t_xz: jnp.ndarray       # [2]
    scale: jnp.ndarray      # []
    noise_gate: jnp.ndarray  # []
    noise: jnp.ndarray      # [L, 3]
    crop_gate: jnp.ndarray  # []
    crop_u1: jnp.ndarray    # []
    crop_u2: jnp.ndarray    # []
    warp_gate: jnp.ndarray  # []
    warp_k: jnp.ndarray     # []
    warp_s1: jnp.ndarray    # []
    warp_s2: jnp.ndarray    # []
    drop_gate: jnp.ndarray  # []
    drop_u: jnp.ndarray     # [M]


def draw_rands(key: jax.Array, batch: int, L: int, M: int,
               cfg: DataConfig) -> AugRand:
    """All stochastic draws for a whole batch — 13 RNG dispatches total."""
    ks = jax.random.split(key, 13)
    u = jax.random.uniform
    sigma = jnp.array(cfg.noise_sigma, dtype=jnp.float32)
    return AugRand(
        t_xz=u(ks[0], (batch, 2), minval=-cfg.translation_range,
               maxval=cfg.translation_range),
        scale=u(ks[1], (batch,), minval=cfg.scale_range[0],
                maxval=cfg.scale_range[1]),
        noise_gate=u(ks[2], (batch,)),
        noise=jax.random.normal(ks[3], (batch, L, 3)) * sigma,
        crop_gate=u(ks[4], (batch,)),
        crop_u1=u(ks[5], (batch,)),
        crop_u2=u(ks[6], (batch,)),
        warp_gate=u(ks[7], (batch,)),
        warp_k=u(ks[8], (batch,), minval=0.4, maxval=0.6),
        warp_s1=u(ks[9], (batch,), minval=0.5, maxval=1.5),
        warp_s2=u(ks[10], (batch,), minval=0.5, maxval=1.5),
        drop_gate=u(ks[11], (batch,)),
        drop_u=u(ks[12], (batch, M)),
    )


def rotate_raw(raw: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Y-rotate [..., 4] (x, y, z, t) trace points by k * 90 degrees:
    x' = c*x + s*z ; z' = -s*x + c*z. Shape-agnostic (used per-sample by
    rotate_sample and batched by the TTA forwards)."""
    c = _ROT_COS[k]
    s = _ROT_SIN[k]
    x, y, z, t = (raw[..., i] for i in range(4))
    return jnp.stack([c * x + s * z, y, -s * x + c * z, t], axis=-1)


def unrotate_boxes(boxes_r: jnp.ndarray, ks: jnp.ndarray) -> jnp.ndarray:
    """Map boxes predicted in a k-rotated frame back to the capture frame
    — the inverse of rotate_sample's box transform, exact for 90-degree
    multiples: centers get the k -> (4 - k) % 4 rotation, x/z sizes swap
    for odd k. boxes_r: [R, Q, 6]; ks: [R] int in 0..3. Used by rotation
    test-time augmentation (predictor.build_predictor, tools.calibrate)."""
    inv = (4 - ks % 4) % 4
    c = _ROT_COS[inv][:, None]
    s = _ROT_SIN[inv][:, None]
    cx, cz = boxes_r[..., 0], boxes_r[..., 2]
    odd = ((ks % 2) == 1)[:, None]
    return jnp.stack([
        c * cx + s * cz,
        boxes_r[..., 1],
        -s * cx + c * cz,
        jnp.where(odd, boxes_r[..., 5], boxes_r[..., 3]),
        boxes_r[..., 4],
        jnp.where(odd, boxes_r[..., 3], boxes_r[..., 5]),
    ], axis=-1)


def reflect_raw(raw: jnp.ndarray) -> jnp.ndarray:
    """Mirror [..., 4] (x, y, z, t) trace points across the x = 0 plane
    (x -> -x). Combined with rotate_raw this generates all 8 views of the
    dihedral group D4 — the full symmetry group of an axis-aligned room.
    Training augmentation (ref: dataloader.py:317-392) never reflects, so
    mirrored forwards are genuinely diverse views for test-time pooling."""
    return raw * jnp.asarray([-1.0, 1.0, 1.0, 1.0], raw.dtype)


def unreflect_boxes(boxes: jnp.ndarray) -> jnp.ndarray:
    """Inverse box transform of reflect_raw: center x -> -x; sizes are
    unchanged (axis-aligned boxes are mirror-symmetric). Own inverse."""
    return boxes * jnp.asarray([-1.0, 1.0, 1.0, 1.0, 1.0, 1.0], boxes.dtype)


def scale_raw(raw: jnp.ndarray, s) -> jnp.ndarray:
    """Uniformly scale [..., 4] (x, y, z, t) trace positions by ``s``
    (timestamps untouched) — the test-time twin of the training scale
    augmentation (ref: dataloader.py:265-294, 0.8-1.2). The box inverse
    (unscale_boxes) is exact: centers and sizes divide by ``s``."""
    return raw * jnp.asarray([1.0, 1.0, 1.0, 0.0], raw.dtype) * s \
        + raw * jnp.asarray([0.0, 0.0, 0.0, 1.0], raw.dtype)


def unscale_boxes(boxes: jnp.ndarray, s) -> jnp.ndarray:
    """Inverse box transform of scale_raw: all 6 box coordinates (center
    and size) divide by ``s``."""
    return boxes / s


def rotate_sample(sample: Sample, k: jnp.ndarray) -> Sample:
    """Rotate trace + boxes around the Y axis by k * 90 degrees (k in 0..3).

    x' = c*x + s*z ; z' = -s*x + c*z ; sizes swap x<->z for odd k
    (ref: dataloader.py:167-186, 214-222).
    """
    c = _ROT_COS[k]
    s = _ROT_SIN[k]
    raw = rotate_raw(sample.raw, k)

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


def apply_augment(sample: Sample, rotation_k: jnp.ndarray, r: AugRand,
                  cfg: DataConfig) -> Sample:
    """Deterministic augmentation given pre-drawn randoms; vmappable.

    Order matches the reference __getitem__: rotate -> translate -> scale ->
    noise -> crop -> time-warp -> collider dropout (dataloader.py:317-392).
    """
    L = sample.raw.shape[0]

    if cfg.augment_rotation:
        sample = rotate_sample(sample, rotation_k)

    raw, boxes = sample.raw, sample.boxes
    length, labels, valid = sample.length, sample.labels, sample.valid

    if cfg.augment_translation:
        shift = jnp.stack([r.t_xz[0], 0.0, r.t_xz[1], 0.0])
        raw = raw + shift
        boxes = boxes.at[:, 0].add(r.t_xz[0])
        boxes = boxes.at[:, 2].add(r.t_xz[1])

    if cfg.augment_scale:
        xyz_only = jnp.array([1.0, 1.0, 1.0, 0.0])
        raw = raw * (xyz_only * r.scale + (1.0 - xyz_only))
        boxes = boxes * r.scale

    if cfg.noise_prob > 0:
        do_noise = r.noise_gate < cfg.noise_prob
        raw = jnp.where(do_noise, raw.at[:, :3].add(r.noise), raw)

    if cfg.crop_prob > 0:
        do_crop = (r.crop_gate < cfg.crop_prob) & (length > 100)
        lo = (0.2 * length.astype(jnp.float32)).astype(jnp.int32)
        hi = (0.8 * length.astype(jnp.float32)).astype(jnp.int32)
        start = (r.crop_u1 * jnp.maximum(lo, 1).astype(jnp.float32)
                 ).astype(jnp.int32)
        end = hi + (r.crop_u2 * jnp.maximum(length - hi, 1).astype(
            jnp.float32)).astype(jnp.int32)
        start = jnp.where(do_crop, start, 0)
        end = jnp.where(do_crop, end, length)
        idx = jnp.minimum(jnp.arange(L) + start, L - 1)
        raw = jnp.take(raw, idx, axis=0)
        length = end - start

    if cfg.time_warp_prob > 0:
        do_warp = r.warp_gate < cfg.time_warp_prob
        t = raw[:, 3]
        t_rel = t - t[0]
        t_max = t_rel[jnp.maximum(length - 1, 0)] + 1e-6
        first = t_rel / t_max < r.warp_k
        warped = jnp.where(
            first, t_rel * r.warp_s1,
            r.warp_k * t_max * r.warp_s1
            + (t_rel - r.warp_k * t_max) * r.warp_s2)
        raw = raw.at[:, 3].set(jnp.where(do_warp, warped, t_rel))

    if cfg.augment_collider_dropout:
        gate = r.drop_gate < cfg.dropout_gate_prob
        keep = _is_wall(boxes, labels) | (r.drop_u > cfg.collider_dropout_prob)
        new_valid = valid & keep
        # never drop everything (ref: dataloader.py:312)
        new_valid = jnp.where(jnp.any(new_valid), new_valid, valid)
        valid = jnp.where(gate, new_valid, valid)

    return Sample(raw=raw, length=length, boxes=boxes, labels=labels,
                  valid=valid)


def augment_sample(key: jax.Array, sample: Sample, rotation_k: jnp.ndarray,
                   cfg: DataConfig) -> Sample:
    """Single-sample convenience wrapper (tests, host tools)."""
    L, M = sample.raw.shape[0], sample.boxes.shape[0]
    r = draw_rands(key, 1, L, M, cfg)
    r1 = jax.tree_util.tree_map(lambda x: x[0], r)
    return apply_augment(sample, rotation_k, r1, cfg)


def make_augment_batch(cfg: DataConfig):
    """Build a batched augmentation function:
    (key, Sample[B], rot_k[B]) -> Sample[B]."""

    def fn(key: jax.Array, batch: Sample, rotation_k: jnp.ndarray) -> Sample:
        B = batch.length.shape[0]
        L, M = batch.raw.shape[1], batch.boxes.shape[1]
        rands = draw_rands(key, B, L, M, cfg)
        return jax.vmap(
            lambda s, k, r: apply_augment(s, k, r, cfg))(
            batch, rotation_k, rands)

    return fn
