"""Trace-informed wall refinement (ops/refine.py)."""

import jax.numpy as jnp
import numpy as np

from room_slam_tpu.ops.refine import refine_walls, trace_extent


def _trace(L=64, x0=-2.0, x1=2.0, z0=-3.0, z1=3.0):
    """A trace whose free-space extent is exactly the given rectangle."""
    rng = np.random.default_rng(0)
    raw = np.zeros((L, 4), np.float32)
    raw[:, 0] = rng.uniform(x0, x1, L)
    raw[:, 2] = rng.uniform(z0, z1, L)
    raw[0, 0], raw[1, 0] = x0, x1
    raw[2, 2], raw[3, 2] = z0, z1
    raw[:, 3] = np.arange(L) * 0.03
    return raw


def test_trace_extent_respects_length():
    raw = _trace()
    raw[32:, 0] = 100.0  # padding garbage beyond the valid length
    x_min, x_max, z_min, z_max = trace_extent(
        jnp.asarray(raw), jnp.asarray(32))
    assert float(x_max) < 3.0
    assert float(x_min) == -2.0


def test_wall_snaps_to_extent_plane():
    raw = _trace()
    wt, cl = 0.125, 0.3
    # GT-style wall on +x: center = x_max + clearance + wt/2 = 2.3625
    truth_cx = 2.0 + cl + wt / 2
    boxes = jnp.asarray(np.array([
        [2.25, 1.0, 0.1, 0.2, 3.0, 5.0],    # near-plane thin BLOCK -> snap
        [1.0, 1.0, 0.0, 0.8, 0.9, 0.6],     # MID-shaped furniture (BLOCK
                                            # label but not thin) -> keep
        [0.0, 1.0, -4.5, 5.0, 3.0, 0.2],    # -z wall 1.2m off-plane -> keep
    ], np.float32))
    labels = jnp.asarray(np.zeros(3, np.int32))  # all predicted BLOCK
    out = np.asarray(refine_walls(
        boxes, labels, jnp.asarray(raw), jnp.asarray(raw.shape[0]),
        clearance=cl, wall_thickness=wt))
    # snapped: exact plane, slab thickness, stretched to observed z span
    np.testing.assert_allclose(out[0, 0], truth_cx, atol=1e-5)
    np.testing.assert_allclose(out[0, 3], wt, atol=1e-6)
    assert out[0, 5] >= 6.0 + 2 * cl
    np.testing.assert_allclose(out[0, 2], 0.0, atol=1e-5)
    # non-thin box untouched
    np.testing.assert_allclose(out[1], np.asarray(boxes)[1])
    # off-plane wall outside the trust region untouched
    np.testing.assert_allclose(out[2], np.asarray(boxes)[2])
    # y never modified
    np.testing.assert_allclose(out[:, 1], np.asarray(boxes)[:, 1])
    np.testing.assert_allclose(out[:, 4], np.asarray(boxes)[:, 4])


def test_non_block_labels_untouched():
    raw = _trace()
    boxes = jnp.asarray(np.array(
        [[2.25, 1.0, 0.0, 0.2, 3.0, 5.0]], np.float32))
    out = np.asarray(refine_walls(
        boxes, jnp.asarray(np.array([2], np.int32)),  # predicted MID
        jnp.asarray(raw), jnp.asarray(raw.shape[0])))
    np.testing.assert_allclose(out, np.asarray(boxes))


def test_outside_extent_mask():
    from room_slam_tpu.ops.refine import outside_extent_mask

    raw = _trace()  # extent x in [-2, 2], z in [-3, 3]
    boxes = jnp.asarray(np.array([
        [0.0, 1.0, 0.0, 1.0, 1.0, 1.0],     # fully inside -> keep
        [2.6, 1.0, 0.0, 0.4, 3.0, 6.0],     # wall just past extent -> keep
        [6.0, 1.0, 0.0, 1.0, 1.0, 1.0],     # phantom annex box -> suppress
        [0.0, 1.0, -9.0, 2.0, 1.0, 1.0],    # far -z hallucination -> drop
        [3.2, 1.0, 0.0, 1.0, 1.0, 1.0],     # straddles the margin -> keep
    ], np.float32))
    out = outside_extent_mask(boxes, jnp.asarray(raw), jnp.asarray(64),
                              slack=1.0)
    assert np.array_equal(np.asarray(out),
                          [False, False, True, True, False])


def test_outside_extent_mask_uses_valid_length_only():
    from room_slam_tpu.ops.refine import outside_extent_mask

    raw = _trace()
    raw[32:, 0] = 50.0  # padding garbage: must not widen the extent
    boxes = jnp.asarray(
        np.array([[40.0, 1.0, 0.0, 2.0, 1.0, 2.0]], np.float32))
    out = outside_extent_mask(boxes, jnp.asarray(raw), jnp.asarray(32),
                              slack=1.0)
    assert bool(out[0])


def test_furniture_aware_wall_plane():
    """When predicted furniture lines a side of the envelope, the snapped
    wall plane sits beyond the furniture's outer face instead of at the
    clearance prior (the walker's standoff from that wall IS the
    furniture's depth)."""
    import jax.numpy as jnp
    import numpy as np

    from room_slam_tpu.ops.refine import refine_walls

    # square walk envelope x,z in [-2, 2]
    t = np.linspace(0.0, 60.0, 400).astype(np.float32)
    ang = t * 0.3
    raw = np.stack([2 * np.signbit(np.cos(ang)) * 2 - 2 + 4 * (np.cos(ang) > 0),
                    np.full_like(t, 0.5),
                    np.clip(2 * np.sin(ang) * 2, -2, 2), t], -1)
    # simpler: corners walk
    xs = np.concatenate([np.linspace(-2, 2, 100), np.full(100, 2),
                         np.linspace(2, -2, 100), np.full(100, -2)])
    zs = np.concatenate([np.full(100, -2), np.linspace(-2, 2, 100),
                         np.full(100, 2), np.linspace(2, -2, 100)])
    raw = np.stack([xs, np.full_like(xs, 0.5), zs,
                    np.linspace(0, 60, 400)], -1).astype(np.float32)
    length = jnp.asarray(400)

    # predictions: a desk (MID) lining the +z side, outer face at z=2.7,
    # plus a thin wall predicted near z=+2.6
    boxes = np.zeros((3, 6), np.float32)
    labels = np.zeros((3,), np.int32)
    boxes[0] = [0.0, 0.0, 2.45, 1.2, 0.7, 0.5]   # furniture: z faces 2.2-2.7
    labels[0] = 2
    boxes[1] = [0.0, 1.0, 2.4, 3.0, 3.0, 0.2]     # thin z-wall candidate
    labels[1] = 0
    boxes[2] = [0.0, 1.0, -2.3, 3.0, 3.0, 0.2]    # thin z-wall, bare side
    labels[2] = 0

    out_prior = np.asarray(refine_walls(
        jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(raw), length,
        clearance=0.1))
    out_furn = np.asarray(refine_walls(
        jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(raw), length,
        clearance=0.1, furniture_aware=True))

    # prior-only: +z wall at extent + 0.1 + t/2
    assert abs(out_prior[1, 2] - (2 + 0.1 + 0.0625)) < 1e-3, out_prior[1, 2]
    # furniture-aware: beyond the desk's outer face (2.7 + gap)
    assert out_furn[1, 2] > 2.7
    assert abs(out_furn[1, 2] - (2.7 + 0.05 + 0.0625)) < 1e-3
    # bare -z side unchanged between modes
    assert abs(out_furn[2, 2] - out_prior[2, 2]) < 1e-6
    # furniture box itself untouched
    np.testing.assert_allclose(out_furn[0], boxes[0])


def test_trust_widens_snap_window():
    """`trust` is an operating-point parameter: a wall 1.2 m off-plane is
    left alone at the 0.4 default but snapped when trust covers the drift
    (real-capture wall predictions drift 0.6-1.0 m — PARITY.md round 3)."""
    raw = _trace()
    wt, cl = 0.125, 0.3
    far_wall = jnp.asarray(np.array(
        [[0.0, 1.0, -4.5, 5.0, 3.0, 0.2]], np.float32))  # -z plane, 1.2m off
    labels = jnp.asarray(np.zeros(1, np.int32))
    kw = dict(clearance=cl, wall_thickness=wt)
    keep = np.asarray(refine_walls(
        far_wall, labels, jnp.asarray(raw), jnp.asarray(raw.shape[0]),
        trust=0.4, **kw))
    np.testing.assert_allclose(keep, np.asarray(far_wall))
    snap = np.asarray(refine_walls(
        far_wall, labels, jnp.asarray(raw), jnp.asarray(raw.shape[0]),
        trust=1.5, **kw))
    np.testing.assert_allclose(snap[0, 2], -3.0 - cl - wt / 2, atol=1e-5)
    np.testing.assert_allclose(snap[0, 5], wt, atol=1e-6)


def test_synthesize_walls_candidates():
    """synthesize_walls appends the 4 extent-implied wall planes with
    inherited (slightly decayed) scores; an on-plane model wall wins its
    NMS tie, an off-plane model wall leaves the candidate standing."""
    from room_slam_tpu.ops.nms import post_process
    from room_slam_tpu.ops.refine import synthesize_walls

    raw = _trace()  # extent [-2,2] x [-3,3]
    wt, cl = 0.125, 0.3
    # model: good +x wall, badly-off -z wall (1.2 m inward), one furniture
    boxes = jnp.asarray(np.array([
        [2.3625, 1.2, 0.0, wt, 2.4, 6.0],   # on-plane +x wall
        [0.0, 1.2, -2.2, 6.0, 2.4, wt],      # -z wall, ~1.2 m off-plane
        [1.0, 0.4, 0.5, 0.8, 0.8, 0.6],      # LOW furniture
    ], np.float32))
    logits = jnp.asarray(np.array([
        [4.0, -1.0, -1.0, -1.0],
        [3.0, -1.0, -1.0, -1.0],
        [-1.0, 3.0, -1.0, -1.0],
    ], np.float32))
    obj = jnp.asarray(np.array([2.0, 1.5, 1.0], np.float32))
    ln = jnp.asarray(raw.shape[0])
    b2, l2, o2, valid = synthesize_walls(
        boxes, logits, obj, jnp.asarray(raw), ln, clearance=cl,
        wall_thickness=wt)
    assert b2.shape == (7, 6) and l2.shape == (7, 4) and o2.shape == (7,)
    # distance gate: +x covered by the on-plane model wall (invalid);
    # -x / -z / +z have no wall within dup_dist -> open
    assert list(np.asarray(valid)) == [True, True, True,
                                       True, False, True, True]
    # all four synthesized rows are classified BLOCK
    assert np.all(np.argmax(np.asarray(l2)[3:], -1) == 0)
    # synthesized planes sit at extent +/- (clearance + wt/2)
    syn = np.asarray(b2)[3:]
    assert np.isclose(sorted(syn[:2, 0]), [-2.3625, 2.3625]).all()
    assert np.isclose(sorted(syn[2:, 2]), [-3.3625, 3.3625]).all()
    # decayed copy: each synthesized conf strictly below its source's
    keep, labels, conf = post_process(
        b2, l2, confidence_threshold=0.0, nms_threshold=0.1,
        objectness=o2, candidate_mask=valid)
    conf = np.asarray(conf)
    assert conf[3 + 1] < conf[0]  # +x candidate below its on-plane source
    keep = np.asarray(keep)
    # model walls kept; covered +x duplicate dropped; open sides filled
    assert keep[0] and not keep[4]
    assert keep[1] and keep[5]  # off-plane -z wall AND its candidate
    assert keep[3] and keep[6]  # -x and +z filled in

    # degenerate trace -> synthesized rows masked out
    short = np.zeros_like(raw)
    short[:, :3] = 0.01
    _, _, _, valid_deg = synthesize_walls(
        boxes, logits, obj, jnp.asarray(short), ln, clearance=cl,
        wall_thickness=wt)
    assert bool(jnp.all(valid_deg[:3])) and not bool(jnp.any(valid_deg[3:]))


def _ring_trace(hole_cx=1.0, hole_cz=1.0, hole_r=0.55, span=4.0, step=0.06):
    """Serpentine walk covering a [0,span]^2 room except a disc around
    the hole center — the footprint an unwalkable solid leaves."""
    pts = []
    t = 0.0
    z = 0.0
    direction = 1
    while z <= span:
        xs = np.arange(0.0, span + 1e-6, step)[::direction]
        for x in xs:
            if np.hypot(x - hole_cx, z - hole_cz) > hole_r:
                pts.append([x, 1.5, z, t])
                t += 0.05
        z += step
        direction *= -1
    return np.asarray(pts, np.float32)


def test_synthesize_furniture_finds_the_hole():
    from room_slam_tpu.ops.refine import synthesize_furniture

    raw = _ring_trace()
    Q = 4
    boxes = np.zeros((Q, 6), np.float32)
    boxes[:, :3] = [[3.5, 0.5, 3.5]] * Q      # far from the hole
    boxes[:, 3:] = 0.4
    logits = np.full((Q, 4), -2.0, np.float32)
    logits[0, 2] = 2.0                         # one MID row: the datum source
    boxes[0, 1], boxes[0, 4] = 0.45, 0.9
    logits[1:, 0] = 2.0
    obj = np.zeros((Q,), np.float32)

    ob, ol, oo, ov = synthesize_furniture(
        jnp.asarray(boxes), jnp.asarray(logits), jnp.asarray(obj),
        jnp.asarray(raw), jnp.asarray(raw.shape[0]))
    ob, ol, ov = np.asarray(ob), np.asarray(ol), np.asarray(ov)
    assert ov[:Q].all()
    new = np.where(ov[Q:])[0] + Q
    assert len(new) >= 1
    d = np.hypot(ob[new, 0] - 1.0, ob[new, 2] - 1.0)
    i = new[np.argmin(d)]
    # a candidate sits on the unwalked hole...
    assert d.min() < 0.35, ob[new]
    # ...sized like the hole, classified MID (footprint > 0.55 m)...
    assert 0.5 <= ob[i, 3] <= 1.8 and 0.5 <= ob[i, 5] <= 1.8
    assert np.argmax(ol[i]) == 2
    # ...and inheriting the model's MID datum
    np.testing.assert_allclose([ob[i, 1], ob[i, 4]], [0.45, 0.9], atol=1e-5)


def test_synthesize_furniture_dup_gate_and_no_hole():
    from room_slam_tpu.ops.refine import synthesize_furniture

    raw = _ring_trace()
    Q = 2
    boxes = np.zeros((Q, 6), np.float32)
    logits = np.full((Q, 4), -2.0, np.float32)
    # an existing MID prediction ON the hole -> candidate must be gated
    boxes[0] = [1.0, 0.5, 1.0, 0.6, 1.0, 0.6]
    logits[0, 2] = 2.0
    boxes[1] = [3.5, 1.0, 3.5, 0.3, 2.0, 0.3]
    logits[1, 0] = 2.0
    ob, ol, oo, ov = synthesize_furniture(
        jnp.asarray(boxes), jnp.asarray(logits), None,
        jnp.asarray(raw), jnp.asarray(raw.shape[0]))
    ob, ov = np.asarray(ob), np.asarray(ov)
    new = np.where(ov[Q:])[0] + Q
    d_hole = np.hypot(ob[new, 0] - 1.0, ob[new, 2] - 1.0) if len(new) else []
    assert len(new) == 0 or min(d_hole) > 0.35

    # a fully-covered room (no hole) synthesizes nothing
    full = _ring_trace(hole_r=0.0)
    _, _, _, ov2 = synthesize_furniture(
        jnp.asarray(boxes), jnp.asarray(logits), None,
        jnp.asarray(full), jnp.asarray(full.shape[0]))
    assert not np.asarray(ov2)[Q:].any()


def test_snap_y_planes_tall_block_only():
    from room_slam_tpu.ops.refine import snap_y_planes

    boxes = np.array([
        # a short wall prediction: tall BLOCK -> snaps to [floor, ceil]
        [2.0, 0.8, 0.0, 0.12, 2.6, 8.0],
        # full-height partition prediction -> snaps
        [0.0, 1.0, 1.0, 1.0, 2.2, 0.9],
        # short interior BLOCK (sideboard) -> untouched
        [1.0, 0.1, -1.0, 2.7, 1.1, 1.0],
        # MID furniture, even if tall -> untouched (not BLOCK)
        [0.5, 0.9, 0.5, 0.6, 2.0, 0.6],
    ], np.float32)
    labels = np.array([0, 0, 0, 2], np.int32)
    floor, ceil = -0.49, 3.43
    out = np.asarray(snap_y_planes(
        jnp.asarray(boxes), jnp.asarray(labels),
        jnp.float32(floor), jnp.float32(ceil)))
    for i in (0, 1):
        np.testing.assert_allclose(out[i, 1], (floor + ceil) / 2, atol=1e-5)
        np.testing.assert_allclose(out[i, 4], ceil - floor, atol=1e-5)
    np.testing.assert_allclose(out[2], boxes[2], atol=1e-6)
    np.testing.assert_allclose(out[3], boxes[3], atol=1e-6)
    # XZ untouched everywhere
    np.testing.assert_allclose(out[:, [0, 2, 3, 5]], boxes[:, [0, 2, 3, 5]],
                               atol=1e-6)


def test_y_planes_from_colliders(tmp_path):
    import json

    from room_slam_tpu.ops.refine import y_planes_from_colliders

    cols = {"colliders": [
        {"label": "BLOCK", "center": {"x": 0, "y": 1.47, "z": 0},
         "size": {"x": 0.2, "y": 3.92, "z": 3.9}},
        {"label": "BLOCK", "center": {"x": 2, "y": 1.51, "z": 0},
         "size": {"x": 0.1, "y": 3.93, "z": 9.0}},
        # furniture must not vote
        {"label": "LOW", "center": {"x": 1, "y": -0.2, "z": 1},
         "size": {"x": 0.4, "y": 0.5, "z": 0.4}},
    ]}
    p = tmp_path / "colliders.json"
    p.write_text(json.dumps(cols))
    floor, ceil = y_planes_from_colliders(str(p))
    assert abs(floor - min(1.47 - 3.92 / 2, 1.51 - 3.93 / 2)) < 1e-9
    assert abs(ceil - max(1.47 + 3.92 / 2, 1.51 + 3.93 / 2)) < 1e-9


def test_apply_operating_point_ycal_cell():
    """realbench cell plumbing: 'ycal' snaps tall BLOCK candidates before
    NMS (tools/realbench.apply_operating_point)."""
    from room_slam_tpu.tools.realbench import apply_operating_point

    Q = 4
    boxes = np.zeros((1, Q, 6), np.float32)
    logits = np.full((1, Q, 4), -4.0, np.float32)
    # one confident short-wall BLOCK candidate
    boxes[0, 0] = [2.0, 0.8, 0.0, 0.12, 2.6, 8.0]
    logits[0, 0, 0] = 4.0
    # one confident MID candidate (must keep its own y)
    boxes[0, 1] = [0.0, 0.3, 0.0, 1.0, 0.8, 0.8]
    logits[0, 1, 2] = 4.0
    raw = _trace()
    cached = {"pred_boxes": boxes, "pred_logits": logits,
              "raw": raw[None], "length": np.array([raw.shape[0]])}
    dets = apply_operating_point(
        cached, {"threshold": 0.5, "nms": 0.3, "ycal": [-0.49, 3.43]})
    got = {int(l): b for l, b in zip(dets["labels"], dets["boxes"])}
    np.testing.assert_allclose(got[0][1], (-0.49 + 3.43) / 2, atol=1e-4)
    np.testing.assert_allclose(got[0][4], 3.43 + 0.49, atol=1e-4)
    np.testing.assert_allclose(got[2][1], 0.3, atol=1e-4)
    np.testing.assert_allclose(got[2][4], 0.8, atol=1e-4)


def _notched_trace(seed=0, n=2600):
    """Dense room walk with a 1.2 m-deep x 2 m-long notch at the x-max
    wall (a wall-lined closet the walker traces around)."""
    rng = np.random.default_rng(seed)
    pts = []
    while len(pts) < n:
        x, z = rng.uniform(-3, 3), rng.uniform(-3, 3)
        if x > 1.8 and -1.0 < z < 1.0:
            continue                          # the closet region
        pts.append([x, -0.46, z, len(pts) * 0.03])
    return np.asarray(pts, np.float32)


def test_synthesize_furniture_v2_finds_the_notch():
    from room_slam_tpu.ops.refine import synthesize_furniture_v2

    raw = _notched_trace()
    Q = 4
    boxes = np.zeros((Q, 6), np.float32)
    boxes[:, :3] = [[-3.5, 0.5, -3.5]] * Q     # far from the notch
    boxes[:, 3:] = 0.4
    logits = np.full((Q, 4), -2.0, np.float32)
    # one tall-BLOCK row: the tall datum source (post-ycal wall span)
    logits[0, 0] = 2.0
    boxes[0, 1], boxes[0, 4] = 1.5, 3.9
    # one MID row: the MID datum source
    logits[1, 2] = 2.0
    boxes[1, 1], boxes[1, 4] = 0.45, 0.9
    logits[2:, 0] = 2.0
    obj = np.zeros((Q,), np.float32)

    ob, ol, oo, ov = synthesize_furniture_v2(
        jnp.asarray(boxes), jnp.asarray(logits), jnp.asarray(obj),
        jnp.asarray(raw), jnp.asarray(raw.shape[0]))
    ob, ol, ov = np.asarray(ob), np.asarray(ol), np.asarray(ov)
    assert ov[:Q].all()                        # model rows untouched
    new = np.where(ov[Q:])[0] + Q
    assert len(new) >= 2                       # tall + MID hypotheses
    # at least one valid candidate on the closet (true center ~(2.4, 0))
    d = np.hypot(ob[new, 0] - 2.4, ob[new, 2] - 0.0)
    hits = new[d < 0.5]
    assert len(hits) >= 2, ob[new]
    classes = {int(np.argmax(ol[i])) for i in hits}
    assert 0 in classes and 2 in classes       # BLOCK + MID hypotheses
    tall = [i for i in hits if np.argmax(ol[i]) == 0]
    # the tall hypothesis inherits the model's tall-BLOCK datum
    np.testing.assert_allclose(
        [ob[tall[0], 1], ob[tall[0], 4]], [1.5, 3.9], atol=1e-5)


def test_synthesize_furniture_v2_no_notch_no_rows():
    from room_slam_tpu.ops.refine import synthesize_furniture_v2

    # uniform dense walk: no interior hole, no boundary notch
    rng = np.random.default_rng(1)
    pts = np.stack([rng.uniform(-3, 3, 2600),
                    np.full(2600, -0.46),
                    rng.uniform(-3, 3, 2600),
                    np.arange(2600) * 0.03], -1).astype(np.float32)
    Q = 3
    boxes = np.zeros((Q, 6), np.float32)
    boxes[:, 3:] = 0.4
    logits = np.full((Q, 4), -2.0, np.float32)
    logits[:, 0] = 2.0
    ob, ol, oo, ov = synthesize_furniture_v2(
        jnp.asarray(boxes), jnp.asarray(logits), None,
        jnp.asarray(pts), jnp.asarray(pts.shape[0]))
    assert not np.asarray(ov)[Q:].any()


def test_synthesize_furniture_v2_notch_dup_gate():
    from room_slam_tpu.ops.refine import synthesize_furniture_v2

    raw = _notched_trace()
    Q = 4
    boxes = np.zeros((Q, 6), np.float32)
    boxes[:, 3:] = 0.4
    logits = np.full((Q, 4), -2.0, np.float32)
    logits[:, 0] = 2.0
    boxes[0] = [2.4, 1.5, 0.0, 1.2, 3.9, 2.0]  # model already has the closet
    ob, ol, oo, ov = synthesize_furniture_v2(
        jnp.asarray(boxes), jnp.asarray(logits), None,
        jnp.asarray(raw), jnp.asarray(raw.shape[0]))
    ob, ov = np.asarray(ob), np.asarray(ov)
    new = np.where(ov[Q:])[0] + Q
    d = np.hypot(ob[new, 0] - 2.4, ob[new, 2] - 0.0)
    assert not (d < 0.35).any()                # dup-gated away


def test_apply_operating_point_ycal_synthf_v2_cell():
    """realbench cell plumbing: ycal + synthf='v2' compose — the snap runs
    first, synthesized tall hypotheses inherit calibrated heights via the
    wall datum, and notch candidates appear in the kept set."""
    from room_slam_tpu.tools.realbench import apply_operating_point

    raw = _notched_trace()
    Q = 4
    boxes = np.zeros((1, Q, 6), np.float32)
    boxes[0, :, :3] = [[-3.5, 0.5, -3.5]] * Q
    boxes[0, :, 3:] = 0.4
    logits = np.full((1, Q, 4), -4.0, np.float32)
    # a confident tall wall (short y, to be ycal-snapped -> tall datum)
    boxes[0, 0] = [3.2, 0.8, 0.0, 0.12, 2.6, 6.0]
    logits[0, 0, 0] = 4.0
    # a confident MID candidate (datum + confidence source)
    boxes[0, 1] = [-2.0, 0.3, -2.0, 1.0, 0.8, 0.8]
    logits[0, 1, 2] = 4.0
    cached = {"pred_boxes": boxes, "pred_logits": logits,
              "raw": raw[None], "length": np.array([raw.shape[0]])}
    dets = apply_operating_point(
        cached, {"threshold": 0.0, "nms": 0.3, "synthf": "v2",
                 "ycal": [-0.49, 3.43]})
    bx = np.asarray(dets["boxes"])
    lb = np.asarray(dets["labels"])
    # some kept candidate sits on the notch (true center ~(2.4, 0))
    d = np.hypot(bx[:, 0] - 2.4, bx[:, 2] - 0.0)
    hit = d < 0.5
    assert hit.any(), bx
    # at least one notch hypothesis is a tall BLOCK at the CALIBRATED
    # span (inherited from the ycal-snapped wall datum)
    tall = hit & (lb == 0) & (bx[:, 4] > 3.0)
    assert tall.any(), bx[hit]
    np.testing.assert_allclose(bx[tall][0][1], (-0.49 + 3.43) / 2,
                               atol=1e-4)
