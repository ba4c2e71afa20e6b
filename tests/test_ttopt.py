"""Test-time trace-consistency adaptation (ops/ttopt.py): the physics
losses must move boxes the way the constraints say — and leave physically
consistent boxes alone."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from room_slam_tpu.ops.ttopt import TTOptParams, adapt_boxes


def _grid_trace(span=2.0, n=60, y=1.0):
    """A serpentine trace covering [-span, span]^2 in XZ at sensor height
    ``y`` — the walker visited the whole floor. n=60 gives ~7 cm point
    spacing, the same order as real captures (~2 cm after decimation):
    the physics terms assume trace spacing << box width."""
    xs = np.linspace(-span, span, n)
    zs = np.linspace(-span, span, n)
    pts = np.array([(x, y, z) for z in zs for x in xs], np.float32)
    t = np.arange(len(pts), dtype=np.float32)[:, None] * 0.033
    raw = np.concatenate([pts, t], axis=1)
    return jnp.asarray(raw), jnp.asarray(len(pts), jnp.int32)


def test_penetrated_wall_pushed_out():
    """A thin wall regressed INWARD of the envelope edge (the trace walks
    through it) is plowed back out until its body-inflated inner face sits
    at the outermost trace point — the touched-wall-plane recovery of
    tools/ceiling.py's 'contacted' class. A wall correctly placed just
    outside the envelope stays put, and a wall DEEP inside walked space
    (no local direction signal) stays bounded near its estimate instead
    of being yanked to a wrong plane."""
    raw, length = _grid_trace(span=2.0)
    boxes = jnp.asarray([
        [1.9, 1.25, 0.0, 0.15, 2.5, 4.0],   # inward-regressed edge wall
        [2.3, 1.25, 0.0, 0.15, 2.5, 4.0],   # consistent wall, outside
        [1.2, 1.25, 0.0, 0.15, 2.5, 4.0],   # deep inside walked space
    ], jnp.float32)
    p = TTOptParams(steps=300)
    out = np.asarray(adapt_boxes(boxes, raw, length, p))
    # the edge wall moved out; its inflated inner face reached the
    # envelope boundary (outermost trace x = 2.0)
    assert out[0, 0] > 2.1, out[0]
    face = out[0, 0] - out[0, 3] / 2 - p.body_radius
    assert 1.93 < face < 2.15, out[0]
    # the good wall barely moved
    np.testing.assert_allclose(out[1], np.asarray(boxes)[1], atol=0.05)
    # the deep wall stayed near its estimate (shrink allowed, |dc| small)
    assert abs(out[2, 0] - 1.2) < 0.25, out[2]
    # y untouched for all
    np.testing.assert_allclose(out[:, [1, 4]],
                               np.asarray(boxes)[:, [1, 4]], atol=1e-6)


def test_phantom_box_pulled_to_envelope():
    """A hallucinated box far outside the envelope is pulled back toward
    the plausible region (the soft twin of outside_extent_mask)."""
    raw, length = _grid_trace(span=2.0)
    boxes = jnp.asarray([[8.0, 0.5, 8.0, 1.0, 1.0, 1.0]], jnp.float32)
    p = TTOptParams(steps=300, w_env=1.0)
    out = np.asarray(adapt_boxes(boxes, raw, length, p))
    d0 = np.hypot(8.0 - 2.0, 8.0 - 2.0)
    d1 = np.hypot(max(out[0, 0] - out[0, 3] / 2 - 2.0, 0),
                  max(out[0, 2] - out[0, 5] / 2 - 2.0, 0))
    assert d1 < 0.75 * d0, (d0, d1, out)


def test_ygate_excludes_overhead_boxes():
    """A box entirely ABOVE the walker's body column (e.g. a ceiling
    fixture the trace passes under) must not register penetration."""
    raw, length = _grid_trace(span=2.0, y=1.0)
    boxes = jnp.asarray([[0.0, 2.0, 0.0, 1.0, 0.4, 1.0]], jnp.float32)
    out = np.asarray(adapt_boxes(boxes, raw, length))
    np.testing.assert_allclose(out[0], np.asarray(boxes)[0], atol=0.02)


def test_degenerate_trace_is_safe():
    """length=0 must not produce NaNs (empty captures happen in padded
    batches)."""
    raw = jnp.zeros((16, 4), jnp.float32)
    boxes = jnp.asarray([[0.5, 1.0, 0.5, 1.0, 2.0, 1.0]], jnp.float32)
    out = np.asarray(adapt_boxes(boxes, raw, jnp.asarray(0, jnp.int32)))
    assert np.isfinite(out).all()


def test_vmap_over_captures():
    """The adaptation composes under vmap (the realbench batch path)."""
    raw, length = _grid_trace(span=2.0)
    boxes = jnp.asarray([
        [1.9, 1.25, 0.0, 0.15, 2.5, 4.0],
        [2.3, 1.25, 0.0, 0.15, 2.5, 4.0],
    ], jnp.float32)
    b = jnp.stack([boxes, boxes])
    r = jnp.stack([raw, raw])
    n = jnp.stack([length, length])
    p = TTOptParams(steps=150)
    out = jax.jit(jax.vmap(lambda bb, rr, nn: adapt_boxes(bb, rr, nn, p)))(
        b, r, n)
    out = np.asarray(out)
    np.testing.assert_allclose(out[0], out[1], atol=1e-6)
    assert out[0, 0, 0] > 2.0


def test_penetration_depth_measures_crossing():
    from room_slam_tpu.ops.ttopt import penetration_depth

    # walker walks straight through box 0; box 1 is far away
    L = 50
    xs = jnp.linspace(-2.0, 2.0, L)
    raw = jnp.stack([xs, jnp.full((L,), 1.0), jnp.zeros(L),
                     jnp.linspace(0, 5, L)], axis=-1)
    boxes = jnp.asarray([[0, 1, 0, 1.0, 2.0, 1.0],
                         [10, 1, 0, 1.0, 2.0, 1.0]], dtype=jnp.float32)
    d = penetration_depth(boxes, raw, jnp.int32(L))
    assert float(d[0]) > 0.1
    assert float(d[1]) == 0.0
    # overhead box (above the walker's body column) feels nothing
    boxes_hi = boxes.at[0, 1].set(5.0)
    d_hi = penetration_depth(boxes_hi, raw, jnp.int32(L))
    assert float(d_hi[0]) == 0.0


def test_deadband_protects_shallow_penetration():
    """Real captures penetrate their own GT boxes (body-model + sensor
    error: human captures median 0.07-0.13 m) — with a deadband at least
    that deep, a correct box that the trace clips SHALLOWLY feels no
    plow force, while a box the walk crosses deeply still gets pushed
    out. This is the fix for ttopt's measured seen-room damage."""
    raw, length = _grid_trace(span=2.0)
    # a wall whose body-inflated inner face sits ~0.15 m inside the
    # visited envelope (the shallow clip a CORRECT box suffers), and an
    # edge wall regressed deep into walked space (one-sided crossing,
    # max depth ~0.5 m — a genuinely wrong box)
    boxes = jnp.asarray([
        [2.2, 1.25, 0.0, 0.3, 2.5, 4.0],
        [1.9, 1.25, 0.0, 0.15, 2.5, 4.0],
    ], jnp.float32)
    p0 = TTOptParams(steps=300)
    pd = TTOptParams(steps=300, deadband=0.2)
    out0 = np.asarray(adapt_boxes(boxes, raw, length, p0))
    outd = np.asarray(adapt_boxes(boxes, raw, length, pd))
    # zero-deadband moves the shallow wall; the gate leaves it put
    assert abs(out0[0, 0] - boxes[0, 0]) > 0.03
    assert abs(outd[0, 0] - boxes[0, 0]) < 0.02
    # the deeply crossed edge wall is still plowed decisively; the gate
    # stops the plow once the deepest remaining penetration reaches the
    # deadband (the measurement-noise floor), i.e. ~deadband short of
    # the zero-deadband equilibrium
    assert outd[1, 0] - boxes[1, 0] > 0.15
    gap = (out0[1, 0] - outd[1, 0])
    assert 0.1 < gap < 0.3


def test_auto_gate_applies_ttopt_per_capture_confidence():
    """The ADOPTED deployable ttopt mode (``ttopt={"auto": tau}`` —
    FINAL.md round-5 rows 6-7): realbench.apply_operating_point applies
    the adaptation PER CAPTURE only when the model's own max candidate
    confidence reads below tau. A confident (memorized-room) capture
    must come through with the PLAIN boxes; an unconfident one gets the
    adapted boxes — same pooled batch, one cell."""
    from room_slam_tpu.tools.realbench import apply_operating_point

    raw, length = _grid_trace(span=2.0)
    # one inward-regressed X wall ttopt provably plows out (see
    # test_penetrated_wall_pushed_out) + a consistent Z wall far enough
    # that the plowed box can never NMS-overlap it
    boxes = np.asarray([
        [1.9, 1.25, 0.0, 0.15, 2.5, 4.0],
        [0.0, 1.25, 2.3, 4.0, 2.5, 0.15],
    ], np.float32)
    confident = np.zeros((2, 4), np.float32)
    confident[:, 0] = 8.0                      # max prob ~0.999 > tau
    vague = np.zeros((2, 4), np.float32)       # max prob 0.25 < tau
    cached = {
        "pred_boxes": np.stack([boxes, boxes]),
        "pred_logits": np.stack([confident, vague]),
        "raw": np.stack([np.asarray(raw)] * 2),
        "length": np.asarray([int(length)] * 2, np.int32),
    }
    cell = {"threshold": 0.0, "nms": 0.1,
            "ttopt": {"auto": 0.5, "steps": 300}}
    dets = apply_operating_point(cached, cell)
    b0 = dets["boxes"][dets["img"] == 0]
    b1 = dets["boxes"][dets["img"] == 1]
    assert len(b0) == 2 and len(b1) == 2
    # capture 0 (confident): gate holds — plain boxes, bit-identical
    np.testing.assert_allclose(np.sort(b0[:, 0]),
                               np.sort(boxes[:, 0]), atol=1e-5)
    np.testing.assert_allclose(np.sort(b0[:, 2]),
                               np.sort(boxes[:, 2]), atol=1e-5)
    # capture 1 (unconfident): gate fires — the regressed wall moved out
    assert np.max(b1[:, 0]) > 2.1, b1
