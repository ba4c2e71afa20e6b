"""Augmentation semantics (mirrors the reference's numeric rotation check,
test_augmentation.py:126-150, plus invariants for the other transforms, plus
golden tests locking our two documented deviations — reversal omission and
the monotone time-warp — against the reference's actual code)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from room_slam_tpu.config import DataConfig
from room_slam_tpu.data.augment import (Sample, augment_sample, draw_rands,
                                        apply_augment, rotate_raw,
                                        rotate_sample, unrotate_boxes)
from tests.conftest import REFERENCE, requires_reference


def _sample(rng, L=128, M=8, n=100):
    raw = np.zeros((L, 4), np.float32)
    raw[:n, :3] = rng.normal(size=(n, 3)) * 2
    raw[:n, 3] = np.sort(rng.uniform(0, 30, n))
    boxes = rng.uniform(0.5, 3.0, size=(M, 6)).astype(np.float32)
    labels = rng.integers(0, 4, M).astype(np.int32)
    valid = np.ones(M, bool)
    return Sample(
        raw=jnp.asarray(raw),
        length=jnp.asarray(n, jnp.int32),
        boxes=jnp.asarray(boxes),
        labels=jnp.asarray(labels),
        valid=jnp.asarray(valid),
    )


def test_rotation_90(rng):
    """90 deg: (x, z) -> (-z, x) within 0.01 — the reference's own assertion
    (test_augmentation.py:133-150) — and exact here."""
    s = _sample(rng)
    r = rotate_sample(s, jnp.asarray(1))
    x, z = np.asarray(s.raw[:, 0]), np.asarray(s.raw[:, 2])
    # x' = cos*x + sin*z = z ; z' = -sin*x + cos*z = -x
    np.testing.assert_allclose(np.asarray(r.raw[:, 0]), z, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.raw[:, 2]), -x, atol=1e-6)
    # sizes swap x/z at 90deg (ref: dataloader.py:214-222)
    np.testing.assert_allclose(
        np.asarray(r.boxes[:, 3]), np.asarray(s.boxes[:, 5]))
    np.testing.assert_allclose(
        np.asarray(r.boxes[:, 5]), np.asarray(s.boxes[:, 3]))
    # y untouched
    np.testing.assert_allclose(
        np.asarray(r.raw[:, 1]), np.asarray(s.raw[:, 1]))


def test_rotation_360_roundtrip(rng):
    s = _sample(rng)
    r = s
    for _ in range(4):
        r = rotate_sample(r, jnp.asarray(1))
    np.testing.assert_allclose(np.asarray(r.raw), np.asarray(s.raw),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(r.boxes), np.asarray(s.boxes),
                               atol=1e-5)


def test_trace_and_boxes_transform_together(rng):
    """With only translation+scale on, relative geometry trace<->boxes is
    preserved up to the common similarity transform."""
    cfg = DataConfig(
        augment_rotation=False,
        augment_collider_dropout=False,
        noise_prob=0.0, crop_prob=0.0, time_warp_prob=0.0,
    )
    s = _sample(rng)
    out = augment_sample(jax.random.key(1), s, jnp.asarray(0), cfg)
    n = int(s.length)
    # the offset between trace point i and box center j must scale uniformly
    d_before = np.asarray(s.raw[:n, :3])[:, None, :] - np.asarray(
        s.boxes[:, :3])[None]
    d_after = np.asarray(out.raw[:n, :3])[:, None, :] - np.asarray(
        out.boxes[:, :3])[None]
    ratio = np.linalg.norm(d_after, axis=-1) / np.maximum(
        np.linalg.norm(d_before, axis=-1), 1e-9)
    assert ratio.std() < 1e-3
    assert 0.8 - 1e-5 <= ratio.mean() <= 1.2 + 1e-5
    # box sizes scale by the same factor
    sratio = np.asarray(out.boxes[:, 3:]) / np.asarray(s.boxes[:, 3:])
    np.testing.assert_allclose(sratio, ratio.mean(), rtol=1e-4)


def test_crop_reduces_length_and_keeps_sorted(rng):
    cfg = DataConfig(
        augment_rotation=False, augment_translation=False,
        augment_scale=False, augment_collider_dropout=False,
        noise_prob=0.0, crop_prob=1.0, time_warp_prob=0.0,
    )
    s = _sample(rng, n=120)
    out = augment_sample(jax.random.key(3), s, jnp.asarray(0), cfg)
    n2 = int(out.length)
    assert 0.6 * 120 <= n2 < 120
    t = np.asarray(out.raw[:n2, 3])
    assert np.all(np.diff(t) >= 0)


def test_time_warp_monotone(rng):
    cfg = DataConfig(
        augment_rotation=False, augment_translation=False,
        augment_scale=False, augment_collider_dropout=False,
        noise_prob=0.0, crop_prob=0.0, time_warp_prob=1.0,
    )
    s = _sample(rng, n=100)
    out = augment_sample(jax.random.key(5), s, jnp.asarray(0), cfg)
    t = np.asarray(out.raw[:100, 3])
    assert np.all(np.diff(t) >= -1e-6)
    assert abs(t[0]) < 1e-6
    # positions untouched by the warp
    np.testing.assert_allclose(
        np.asarray(out.raw[:, :3]), np.asarray(s.raw[:, :3]))


@requires_reference
def test_reversal_is_inert_through_reference_featurization(rng):
    """Locks deviation 1 (augment.py header): the reference's sequence
    reversal (dataloader.py:357-360) keeps each point's own timestamp, and
    its featurization re-sorts by timestamp (dataloader.py:433-435), so
    reversal + featurization is an IDENTITY — which is why we omit it."""
    sys.path.insert(0, f"{REFERENCE}/src/benchmark")
    import importlib

    ref_dl = importlib.import_module("dataloader")

    traces = [{"timestamp": float(t), "x": float(x), "y": float(y),
               "z": float(z)}
              for t, x, y, z in zip(
                  np.sort(rng.uniform(0, 60, 300)),
                  rng.normal(size=300), rng.normal(size=300),
                  rng.normal(size=300))]

    class Stub:
        max_trace_len = 3000

    fwd = ref_dl.TraceColliderDataset._process_traces(Stub(), traces)
    rev = ref_dl.TraceColliderDataset._process_traces(
        Stub(), list(reversed(traces)))
    np.testing.assert_array_equal(np.asarray(fwd), np.asarray(rev))


def test_time_warp_matches_reference_where_monotone(rng):
    """Locks deviation 2: our warp uses the continuous knee ``k*t_max*s1``
    where the reference's second segment uses ``k*s1`` (dataloader.py:385).
    The two formulas coincide exactly when t_max == 1; and where they
    diverge, the reference's warped time is non-monotone (so featurization's
    re-sort interleaves the trace halves) while ours stays monotone."""
    cfg = DataConfig(
        augment_rotation=False, augment_translation=False,
        augment_scale=False, augment_collider_dropout=False,
        noise_prob=0.0, crop_prob=0.0, time_warp_prob=1.0,
    )

    def ref_warp(t, k, s1, s2):
        # the reference's formula, dataloader.py:375-388 semantics
        t = np.asarray(t, np.float32) - t.min()
        t_max = t.max() + 1e-6
        m = t / t_max < k
        out = t.copy()
        out[m] *= s1
        out[~m] = k * s1 + (t[~m] - k * t_max) * s2
        return out

    def our_warp(t, k, s1, s2, L=128):
        n = t.shape[0]
        raw = np.zeros((L, 4), np.float32)
        raw[:n, 3] = t
        s = Sample(raw=jnp.asarray(raw), length=jnp.asarray(n, jnp.int32),
                   boxes=jnp.zeros((4, 6)), labels=jnp.zeros(4, jnp.int32),
                   valid=jnp.ones(4, bool))
        r = draw_rands(jax.random.key(0), 1, L, 4, cfg)
        r = jax.tree_util.tree_map(lambda x: x[0], r)
        r = r._replace(warp_gate=jnp.asarray(0.0),
                       warp_k=jnp.asarray(k, jnp.float32),
                       warp_s1=jnp.asarray(s1, jnp.float32),
                       warp_s2=jnp.asarray(s2, jnp.float32))
        out = apply_augment(s, jnp.asarray(0), r, cfg)
        return np.asarray(out.raw[:n, 3])

    for seed in range(5):
        r2 = np.random.default_rng(seed)
        k = r2.uniform(0.4, 0.6)
        s1, s2 = r2.uniform(0.5, 1.5, 2)
        # t_max == 1: formulas agree
        t1 = np.sort(r2.uniform(0, 1, 100)).astype(np.float32)
        t1[0], t1[-1] = 0.0, 1.0
        np.testing.assert_allclose(
            our_warp(t1, k, s1, s2), ref_warp(t1, k, s1, s2), atol=1e-4)
        # t_max >> 1: reference warp jumps DOWN at the knee (non-monotone),
        # ours is monotone with the same knee/scale distribution
        t10 = np.sort(r2.uniform(0, 10, 100)).astype(np.float32)
        t10[0], t10[-1] = 0.0, 10.0
        assert np.min(np.diff(ref_warp(t10, k, s1, s2))) < -1.0
        assert np.min(np.diff(our_warp(t10, k, s1, s2))) >= -1e-6


def test_collider_dropout_keeps_walls(rng):
    cfg = DataConfig(
        augment_rotation=False, augment_translation=False,
        augment_scale=False, noise_prob=0.0, crop_prob=0.0,
        time_warp_prob=0.0,
        augment_collider_dropout=True, dropout_gate_prob=1.0,
        collider_dropout_prob=0.99,
    )
    s = _sample(rng)
    # make boxes 0 and 1 walls: BLOCK with size.x > 5
    boxes = np.array(s.boxes)
    boxes[0, 3] = 6.0
    boxes[1, 5] = 7.0
    labels = np.array(s.labels)
    labels[0] = 0
    labels[1] = 0
    s = s._replace(boxes=jnp.asarray(boxes), labels=jnp.asarray(labels))
    dropped_any = False
    for seed in range(8):
        out = augment_sample(jax.random.key(seed), s, jnp.asarray(0), cfg)
        v = np.asarray(out.valid)
        assert v[0] and v[1]          # walls always kept
        assert v.any()                # never empty
        dropped_any |= not v.all()
    assert dropped_any                # 0.99 drop prob must fire sometimes


def test_unrotate_boxes_inverts_rotate_sample(rng):
    """unrotate_boxes is the exact inverse of rotate_sample's box
    transform for every k — the contract rotation TTA relies on — and
    rotate_raw matches rotate_sample's trace transform."""
    s = _sample(rng)
    for k in range(4):
        rot = rotate_sample(s, jnp.asarray(k))
        np.testing.assert_array_equal(
            np.asarray(rotate_raw(s.raw, jnp.asarray(k))),
            np.asarray(rot.raw))
        back = unrotate_boxes(rot.boxes[None], jnp.asarray([k]))[0]
        np.testing.assert_allclose(
            np.asarray(back), np.asarray(s.boxes), atol=1e-6)


def test_reflect_raw_involution_and_box_inverse(rng):
    """reflect_raw is an involution on traces and unreflect_boxes is the
    exact inverse of the induced box transform — the contract reflection
    TTA (--tta_reflect) relies on. Mirroring a box across x = 0 flips
    center x and keeps sizes, so GT boxes of a mirrored room are
    unreflect_boxes of the originals."""
    from room_slam_tpu.data.augment import reflect_raw, unreflect_boxes

    s = _sample(rng)
    np.testing.assert_array_equal(
        np.asarray(reflect_raw(reflect_raw(s.raw))), np.asarray(s.raw))
    mirrored = np.asarray(s.boxes).copy()
    mirrored[:, 0] = -mirrored[:, 0]
    np.testing.assert_allclose(
        np.asarray(unreflect_boxes(jnp.asarray(mirrored))),
        np.asarray(s.boxes), atol=0)
    # composes with rotation the way the TTA inverse applies them:
    # view = rotate_k(reflect(trace)); boxes come back via
    # unrotate_boxes -> unreflect_boxes
    for k in range(4):
        view = rotate_sample(s._replace(raw=reflect_raw(s.raw),
                                        boxes=jnp.asarray(mirrored)),
                             jnp.asarray(k))
        back = unreflect_boxes(
            unrotate_boxes(view.boxes[None], jnp.asarray([k]))[0])
        np.testing.assert_allclose(np.asarray(back), np.asarray(s.boxes),
                                   atol=1e-6)
