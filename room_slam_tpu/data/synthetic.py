"""On-device synthetic room + trace generation.

TPU-native replacement for the reference's Unity data collector:
- room-layout sampling replaces the hand-built Unity scenes + collider export
  (ref: collector/Assets/src/ExportColliders.cs:31-79)
- the random-walk agent with wall-bounce reflection replaces ``RobotAI``
  (ref: collector/Assets/src/RandomMovement.cs:78-214; walk speed 2.0 m/s from
  StarterAssets ThirdPersonController.cs:19-22; direction change every ~5 s
  from RandomMovement.cs:44)

Everything is pure JAX: rooms vmap over a batch, the walk is a ``lax.scan``
over time, so 10k traces generate in a single device dispatch (BASELINE.json
config 5). A host wrapper writes the same JSON formats the Unity collector
produced, so synthetic data round-trips through the normal loaders.
"""

from __future__ import annotations

import functools
import math
from pathlib import Path
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from room_slam_tpu.config import BENCH_LABELS
from room_slam_tpu.data import formats

# label ids
_BLOCK = BENCH_LABELS["BLOCK"]
_LOW = BENCH_LABELS["LOW"]
_MID = BENCH_LABELS["MID"]
_HIGH = BENCH_LABELS["HIGH"]

AGENT_RADIUS = 0.3          # clearance the walker keeps from boxes
WALK_SPEED = 2.0            # m/s (ThirdPersonController.cs:19)
TURN_INTERVAL = 5.0         # s between random heading changes (RandomMovement.cs:44)
WALL_THICKNESS = 0.125
AGENT_Y = -0.46             # the Unity agent records a constant head height
                            # (visualization/plot_agent_vs_human.py:277-282)
FLOOR_Y = -0.5              # the real room's floor: its LOW boxes span
                            # [-0.5, ...] and human head height is ~0.8
                            # (dataset/train/colliders.json)
N_WALL_SLOTS = 8            # box slots reserved for wall segments (4 used by
                            # a plain rectangle, up to 8 by a 2-room layout)
HUMAN_SPAN = (3.0, 5.5)     # human-mode room side range (m): the walked
                            # spans of ALL 8 real captures are 2.7-5.2 m, and
                            # a ~97 s amble at ~0.3 m/s (~30 m of path — the
                            # val capture walks 32.7 m) can cover rooms of
                            # this size at the real capture's ~0.8 span
                            # coverage. Agent mode keeps (3.5, 9.0): its
                            # minutes-long 2 m/s walks cover any of it.


def _log_uniform(key, lo, hi):
    return jnp.exp(jax.random.uniform(
        key, (), minval=jnp.log(lo), maxval=jnp.log(hi)))


def sample_room(
    key: jax.Array,
    max_colliders: int = 50,
    max_furniture: int = 8,
    multi_room_prob: float = 0.0,
    wall_adjacent_prob: float = 0.0,
    span_range: Tuple[float, float] = (3.5, 9.0),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample one room layout + furniture.

    ``span_range``: (min, max) of each side's length in meters. The default
    suits the Unity-agent regime (minutes-long 100-380 m walks cover any of
    it). HUMAN captures are ~90-130 s ambles at ~0.3 m/s — 25-40 m of path —
    which can only cover rooms near the REAL capture sizes (walked spans
    2.7-5.2 m across all 8 reference captures); generating human walks in
    6-9 m rooms makes the task ill-posed (the walker sees half the room;
    measured: every model scores ~0 mAP on such rooms even when trained on
    them) — human-mode callers pass HUMAN_SPAN instead.

    ``wall_adjacent_prob``: probability that a furniture candidate snaps its
    outer face against a wall (small 0.02-0.2 m gap) instead of free-standing
    with a full walker corridor. In the REAL rooms ~60% of furniture touches
    a wall (9 of 13 pieces across dataset/{train,val}/colliders.json) — a
    generator that keeps a corridor to every wall teaches the model that
    walls always sit one body-clearance beyond the visited envelope, which
    over-extends wall predictions by the furniture depth on lined sides
    (the dominant zero-shot wall error on the val capture). Wall-adjacent
    pieces truncate the walkable envelope exactly like real furniture does.

    Layout: a rectangle (4 BLOCK walls), or — with ``multi_room_prob`` — an
    L-shaped two-room layout: a main room plus an annex on the +x side
    connected by a doorway (8 wall segments; training's 4x rotation
    augmentation supplies side variety). Furniture shape priors are fit to
    the REAL captured rooms (dataset/{train,val}/colliders.json): log-uniform
    small LOW items, elongated MID tables, near-ceiling interior BLOCK
    partitions; the real rooms contain no HIGH, so HIGH stays rare.

    Returns (boxes [M, 6], labels [M], valid [M]) with M = max_colliders;
    wall segments occupy slots [0, N_WALL_SLOTS), furniture the rest.
    """
    kw, kh, kn, kf, km = jax.random.split(key, 5)
    M = max_colliders

    span_lo, span_hi = span_range
    width = jax.random.uniform(kw, (), minval=span_lo, maxval=span_hi)
    depth = jax.random.uniform(jax.random.fold_in(kw, 1), (), minval=span_lo,
                               maxval=span_hi)
    # real wall heights are 3.4-3.93 (dataset colliders); keep range wide
    wall_h = jax.random.uniform(kh, (), minval=2.6, maxval=4.0)
    wt = WALL_THICKNESS

    boxes = jnp.zeros((M, 6), dtype=jnp.float32)
    labels = jnp.full((M,), -1, dtype=jnp.int32)
    valid = jnp.zeros((M,), dtype=bool)

    half_w, half_d = width / 2, depth / 2
    cy = wall_h / 2 + FLOOR_Y  # boxes stand on the real-data floor level

    # ----- annex (second room) on the +x side, doorway in the shared wall
    multi = jax.random.uniform(km, ()) < multi_room_prob
    kb1, kb2, kb3, kd1, kd2 = jax.random.split(jax.random.fold_in(km, 1), 5)
    b_w = jax.random.uniform(kb1, (), minval=2.5, maxval=6.0)
    b_d = jnp.minimum(jax.random.uniform(kb2, (), minval=2.5, maxval=7.0),
                      depth - 0.6)
    # annex z-extent strictly inside the main room's z-extent
    zb_margin = half_d - b_d / 2 - 0.3
    zb = jax.random.uniform(kb3, (), minval=-1.0, maxval=1.0) * \
        jnp.maximum(zb_margin, 0.0)
    # doorway: wide enough for the human walker's 0.7 m wall clearance
    door_w = jax.random.uniform(kd1, (), minval=1.6, maxval=2.4)
    door_w = jnp.minimum(door_w, b_d - 0.4)
    zdoor_margin = b_d / 2 - door_w / 2 - 0.2
    zdoor = zb + jax.random.uniform(kd2, (), minval=-1.0, maxval=1.0) * \
        jnp.maximum(zdoor_margin, 0.0)

    # wall segments (slot layout: 0-3 = main rect; 4-7 = annex + shared
    # split, only valid for multi-room layouts)
    # single-room: slot 0 is the full +x wall; multi-room: slots 6-7 are the
    # shared-wall segments around the door and slot 0 is reused by the annex
    door_lo, door_hi = zdoor - door_w / 2, zdoor + door_w / 2
    seg1_len = jnp.maximum(door_lo + half_d, 0.0)        # [-half_d, door_lo]
    seg2_len = jnp.maximum(half_d - door_hi, 0.0)        # [door_hi, half_d]
    bx_c = half_w + b_w / 2                              # annex center x
    walls = jnp.stack([
        # +x plane: full wall (single) / annex far wall (multi)
        jnp.where(
            multi,
            jnp.stack([half_w + b_w, cy, zb, wt, wall_h, b_d]),
            jnp.stack([half_w, cy, 0.0, wt, wall_h, depth])),
        jnp.stack([-half_w, cy, 0.0, wt, wall_h, depth]),
        jnp.stack([0.0, cy, half_d, width, wall_h, wt]),
        jnp.stack([0.0, cy, -half_d, width, wall_h, wt]),
        # annex side walls (multi only)
        jnp.stack([bx_c, cy, zb + b_d / 2, b_w, wall_h, wt]),
        jnp.stack([bx_c, cy, zb - b_d / 2, b_w, wall_h, wt]),
        # shared-wall segments around the doorway (multi only)
        jnp.stack([half_w, cy, (door_lo - half_d) / 2, wt, wall_h,
                   seg1_len]),
        jnp.stack([half_w, cy, (door_hi + half_d) / 2, wt, wall_h,
                   seg2_len]),
    ])
    wall_valid = jnp.array([True, True, True, True,
                            False, False, False, False]) | (
        multi & jnp.array([True] * 6 + [False, False]))
    # degenerate shared segments (door flush with a corner) stay invalid
    wall_valid = wall_valid.at[6].set(multi & (seg1_len > 0.05))
    wall_valid = wall_valid.at[7].set(multi & (seg2_len > 0.05))
    boxes = boxes.at[:N_WALL_SLOTS].set(walls)
    labels = labels.at[:N_WALL_SLOTS].set(
        jnp.where(wall_valid, _BLOCK, -1))
    valid = valid.at[:N_WALL_SLOTS].set(wall_valid)

    # ----- furniture candidates, then sequential rejection so every kept box
    # is separated from walls, other furniture, and the spawn point by a
    # corridor wider than the agent — the free space stays connected and the
    # walker can never spawn trapped (a paved room deadlocks the reflection
    # walk)
    CORRIDOR = 2 * AGENT_RADIUS + 0.15
    n_attempts = max_furniture * 3  # rejection needs spare candidates
    n_f = jax.random.randint(kn, (), 2, max_furniture + 1)
    fkeys = jax.random.split(kf, n_attempts)

    def candidate(i, fkey):
        kc, ks, kl, kr2 = jax.random.split(fkey, 4)
        # class mix matched to the real rooms' furniture census
        # (LOW 5 / MID 4 / interior BLOCK 4 / HIGH 0 across both rooms)
        cls = jax.random.choice(
            kl, jnp.array([_LOW, _MID, _HIGH, _BLOCK]), (),
            p=jnp.array([0.38, 0.31, 0.08, 0.23]))
        # heights per class (real: LOW 0.26-0.6, MID 0.68-1.18, interior
        # BLOCK mostly near-ceiling with an occasional chest-height one)
        kh1, kh2, kh3 = jax.random.split(ks, 3)
        h_low = jax.random.uniform(kh1, (), minval=0.25, maxval=0.65)
        h_mid = jax.random.uniform(
            jax.random.fold_in(kh1, 1), (), minval=0.65, maxval=1.2)
        h_high = jax.random.uniform(
            jax.random.fold_in(kh1, 2), (), minval=1.5, maxval=2.3)
        blk_tall = jax.random.uniform(kh2, ()) > 0.25
        h_blk = jnp.where(
            blk_tall,
            wall_h * jax.random.uniform(
                jax.random.fold_in(kh1, 3), (), minval=0.78, maxval=1.0),
            jax.random.uniform(
                jax.random.fold_in(kh1, 4), (), minval=0.9, maxval=1.4))
        h = jnp.where(cls == _LOW, h_low,
                      jnp.where(cls == _MID, h_mid,
                                jnp.where(cls == _HIGH, h_high, h_blk)))
        # footprints per class from the real size distributions:
        # LOW log-uniform 0.2-1.6 each axis; MID elongated table
        # (major 0.6-1.35 x minor 0.35-0.85); BLOCK partition
        # (major log-uniform 0.7-2.8 x minor 0.6-1.2); HIGH 0.5-1.3
        kf1, kf2, kf3 = jax.random.split(jax.random.fold_in(ks, 1), 3)
        lo_x = _log_uniform(kf1, 0.2, 1.6)
        lo_z = _log_uniform(kf2, 0.2, 1.6)
        mid_a = jax.random.uniform(kf1, (), minval=0.6, maxval=1.35)
        mid_b = jax.random.uniform(kf2, (), minval=0.35, maxval=0.85)
        hi_a = jax.random.uniform(kf1, (), minval=0.5, maxval=1.3)
        hi_b = jax.random.uniform(kf2, (), minval=0.5, maxval=1.3)
        blk_a = _log_uniform(kf1, 0.7, 2.8)
        blk_b = jax.random.uniform(kf2, (), minval=0.6, maxval=1.2)
        swap = jax.random.uniform(kf3, ()) < 0.5
        fa = jnp.where(cls == _LOW, lo_x,
                       jnp.where(cls == _MID, mid_a,
                                 jnp.where(cls == _HIGH, hi_a, blk_a)))
        fb = jnp.where(cls == _LOW, lo_z,
                       jnp.where(cls == _MID, mid_b,
                                 jnp.where(cls == _HIGH, hi_b, blk_b)))
        fx = jnp.where(swap, fb, fa)
        fz = jnp.where(swap, fa, fb)
        # an occasional LOW item sits elevated (a shelf object — the real
        # val room has one at center y 0.93)
        elev_gate = jax.random.uniform(kh3, ()) < 0.15
        elev = jnp.where((cls == _LOW) & elev_gate,
                         jax.random.uniform(jax.random.fold_in(kh3, 1), (),
                                            minval=0.5, maxval=1.2),
                         0.0)

        # placement: main room, or the annex (when present) with probability
        # ~ its share of footprint
        share_b = jnp.where(
            multi, (b_w * b_d) / (width * depth + b_w * b_d), 0.0)
        in_b = jax.random.uniform(kr2, ()) < share_b
        # main-room margins
        a_mx = half_w - fx / 2 - wt - CORRIDOR
        a_mz = half_d - fz / 2 - wt - CORRIDOR
        # annex margins
        b_mx = b_w / 2 - fx / 2 - wt - CORRIDOR
        b_mz = b_d / 2 - fz / 2 - wt - CORRIDOR
        u = jax.random.uniform(kc, (), minval=-1.0, maxval=1.0)
        v = jax.random.uniform(jax.random.fold_in(kc, 1), (),
                               minval=-1.0, maxval=1.0)
        px = jnp.where(in_b, bx_c + u * jnp.maximum(b_mx, 0.0),
                       u * jnp.maximum(a_mx, 0.0))
        pz = jnp.where(in_b, zb + v * jnp.maximum(b_mz, 0.0),
                       v * jnp.maximum(a_mz, 0.0))
        fits = jnp.where(in_b, (b_mx > 0.0) & (b_mz > 0.0),
                         (a_mx > 0.0) & (a_mz > 0.0))
        # wall-adjacent snap: outer face lands gap metres off a wall's
        # inner plane; the along-wall coordinate may reach the corners
        # (real rooms shelve corners). Only in the main room; the shared
        # +x wall (doorway) stays clear under multi-room layouts. The
        # walkability requirement shifts from "corridor on all sides" to
        # "corridor on the opposite side of the room".
        ksnap = jax.random.fold_in(kc, 2)
        snap = (jax.random.uniform(ksnap, ()) < wall_adjacent_prob) & ~in_b
        side = jax.random.randint(jax.random.fold_in(ksnap, 1), (), 0, 4)
        side = jnp.where(multi & (side == 0), 1, side)
        gap = jax.random.uniform(jax.random.fold_in(ksnap, 2), (),
                                 minval=0.02, maxval=0.2)
        sx_c = half_w - wt / 2 - gap - fx / 2   # |x| of a +/-x-snapped box
        sz_c = half_d - wt / 2 - gap - fz / 2
        cax = half_w - fx / 2 - wt - 0.05       # along-wall reach (corners ok)
        caz = half_d - fz / 2 - wt - 0.05
        px_s = jnp.where(side == 0, sx_c,
                         jnp.where(side == 1, -sx_c,
                                   u * jnp.maximum(cax, 0.0)))
        pz_s = jnp.where(side == 2, sz_c,
                         jnp.where(side == 3, -sz_c,
                                   v * jnp.maximum(caz, 0.0)))
        fits_s = jnp.where(
            side < 2,
            (width - 2 * wt - fx - gap > CORRIDOR + 0.2) & (caz > 0.0),
            (depth - 2 * wt - fz - gap > CORRIDOR + 0.2) & (cax > 0.0))
        px = jnp.where(snap, px_s, px)
        pz = jnp.where(snap, pz_s, pz)
        fits = jnp.where(snap, fits_s, fits)
        # the spawn point only needs to sit OUTSIDE the agent-expanded
        # footprint (the inter-box corridor keeps space connected)
        covers_spawn = (jnp.abs(px) < fx / 2 + AGENT_RADIUS + 0.1) & (
            jnp.abs(pz) < fz / 2 + AGENT_RADIUS + 0.1)
        ok = fits & ~covers_spawn
        box = jnp.stack([px, h / 2 + FLOOR_Y + elev, pz, fx, h, fz])
        return box, cls, ok

    fboxes, fcls, f_ok = jax.vmap(candidate)(
        jnp.arange(n_attempts), fkeys)

    def keep_body(j, kept):
        b = fboxes[j]
        sep_x = jnp.abs(b[0] - fboxes[:, 0]) - (b[3] + fboxes[:, 3]) / 2
        sep_z = jnp.abs(b[2] - fboxes[:, 2]) - (b[5] + fboxes[:, 5]) / 2
        earlier = jnp.arange(n_attempts) < j
        overlaps = (sep_x < CORRIDOR) & (sep_z < CORRIDOR) & kept & earlier
        keep_j = f_ok[j] & ~jnp.any(overlaps) & (jnp.sum(kept) < n_f)
        return kept.at[j].set(keep_j)

    kept = jax.lax.fori_loop(
        0, n_attempts, keep_body, jnp.zeros((n_attempts,), dtype=bool))

    # compact the kept candidates into the furniture slots
    order = jnp.argsort(~kept, stable=True)[:max_furniture]
    fvalid = kept[order]
    s0 = N_WALL_SLOTS
    boxes = boxes.at[s0:s0 + max_furniture].set(fboxes[order])
    labels = labels.at[s0:s0 + max_furniture].set(
        jnp.where(fvalid, fcls[order], -1))
    valid = valid.at[s0:s0 + max_furniture].set(fvalid)
    labels = jnp.where(valid, labels, -1)
    return boxes, labels, valid



def _collide(pos_xz: jnp.ndarray, boxes: jnp.ndarray,
             valid: jnp.ndarray,
             radius: jnp.ndarray | float = AGENT_RADIUS
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Check a 2D position against box footprints (expanded by the walker
    radius). Returns (hit: bool, normal [2]) for the deepest collision —
    the reflection signal of RandomMovement.cs:199-214. Boxes whose bottom
    sits above knee height (elevated shelf items) don't block the walk."""
    dx = pos_xz[0] - boxes[:, 0]
    dz = pos_xz[1] - boxes[:, 2]
    pen_x = boxes[:, 3] / 2 + radius - jnp.abs(dx)
    pen_z = boxes[:, 5] / 2 + radius - jnp.abs(dz)
    blocking = valid & (boxes[:, 1] - boxes[:, 4] / 2 < FLOOR_Y + 0.4)
    inside = (pen_x > 0) & (pen_z > 0) & blocking
    depth = jnp.where(inside, jnp.minimum(pen_x, pen_z), -jnp.inf)
    j = jnp.argmax(depth)
    hit = inside[j]
    # normal along the axis of least penetration
    use_x = pen_x[j] < pen_z[j]
    nx = jnp.where(use_x, jnp.sign(dx[j]), 0.0)
    nz = jnp.where(use_x, 0.0, jnp.sign(dz[j]))
    return hit, jnp.stack([nx, nz])


def simulate_trace(
    key: jax.Array,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    num_steps: int = 3000,
    hz: float = 30.0,
    human: bool = False,
) -> jnp.ndarray:
    """Random-walk through a room with reflection off box colliders.

    Returns raw trace [num_steps, 4] of (x, y, z, t), time-sorted.
    The walker changes heading every ~TURN_INTERVAL s (RandomMovement.cs:78-89)
    and reflects its direction off collider normals (RandomMovement.cs:199-214).
    """
    dt = 1.0 / hz
    k0, k1, ky, kr, kscan = jax.random.split(key, 5)
    ang0 = jax.random.uniform(k0, (), minval=0.0, maxval=2 * math.pi)
    pos0 = jnp.zeros((2,))
    y_base = (
        jax.random.uniform(ky, (), minval=0.45, maxval=0.9)
        if human
        else jnp.float32(AGENT_Y)
    )
    # humans hold the phone anywhere between hip and head and keep a
    # per-wall distance that depends on what stands in the way — the real
    # capture (dataset/val) hugs two walls at ~0 clearance and stays 0.76 m
    # off a furniture-lined one, ambling at median 0.24 m/s with y mean
    # 0.52 +/- 0.30. Clearance is therefore drawn PER WALL SLOT (0.05-0.8)
    # and the pace log-uniform around the observed median; furniture gets a
    # modest fixed margin (a too-large furniture margin would close walk
    # corridors — closed passages are merely unreachable, never deadlocks,
    # because candidate positions inside expanded boxes are rejected before
    # being entered). The Unity agent hugs at its capsule radius and walks
    # at constant speed (ThirdPersonController.cs:19).
    M = boxes.shape[0]
    if human:
        # most walls get hugged nearly flush (the real capture reaches ~0
        # clearance on two walls); larger standoffs arise naturally where
        # furniture lines a wall, so the extra radius stays small
        wall_r = jax.random.uniform(kr, (N_WALL_SLOTS,), minval=0.0,
                                    maxval=0.35)
        furn_r = jax.random.uniform(
            jax.random.fold_in(kr, 2), (), minval=0.25, maxval=0.4)
        radius = jnp.concatenate(
            [wall_r, jnp.full((M - N_WALL_SLOTS,), 1.0) * furn_r])

        def _pace(k):
            # log-uniform commanded pace. The band is calibrated so the
            # EFFECTIVE over-ground speed (commanded minus waypoint slack
            # and blocked ticks) matches the real captures' 0.29-0.34 m/s
            # (all 4 human recordings; the old [0.12, 0.9] band measured
            # 0.24 m/s effective). Floored so a slow leg still makes
            # progress toward coverage.
            return jnp.exp(jax.random.uniform(
                k, (), minval=math.log(0.145), maxval=math.log(1.0)))

        speed0 = _pace(jax.random.fold_in(kr, 1))
    else:
        radius = jnp.full((M,), AGENT_RADIUS, jnp.float32)
        speed0 = jnp.float32(WALK_SPEED)

    if human:
        # waypoint-coverage walk (the Patrol idea of RandomMovement.cs:78-89
        # adapted to free waypoints): a human scanning a room walks TOWARD
        # places — the real capture covers ~80% of the room span — whereas a
        # random-heading walk leaves coverage to chance, which at ambling
        # paces trains models that walls may sit far beyond the visited
        # envelope (observed failure: 10 m wall predictions for a 4 m room).
        # Waypoints are sampled uniformly inside the wall bounding box; ones
        # inside furniture just trigger a reflection + resample on contact.
        nw = N_WALL_SLOTS
        wv = valid[:nw]
        x_hi = jnp.max(jnp.where(wv, boxes[:nw, 0], -jnp.inf)) - 0.3
        x_lo = jnp.min(jnp.where(wv, boxes[:nw, 0], jnp.inf)) + 0.3
        z_hi = jnp.max(jnp.where(wv, boxes[:nw, 2], -jnp.inf)) - 0.3
        z_lo = jnp.min(jnp.where(wv, boxes[:nw, 2], jnp.inf)) + 0.3

        def _waypoint(k):
            ku, kb, ks_ = jax.random.split(k, 3)
            u = jax.random.uniform(ku, (2,))
            pt = jnp.stack([x_lo + u[0] * (x_hi - x_lo),
                            z_lo + u[1] * (z_hi - z_lo)])
            # perimeter bias: scanning humans deliberately visit walls and
            # corners (the real capture reaches ~0 clearance on two walls),
            # so 60% of waypoints project one coordinate to a boundary;
            # the per-wall clearance radius still stops the walker at its
            # allowed hug distance
            side = jax.random.randint(kb, (), 0, 4)
            snapped = jnp.stack([
                jnp.where(side == 0, x_hi, jnp.where(side == 1, x_lo,
                                                     pt[0])),
                jnp.where(side == 2, z_hi, jnp.where(side == 3, z_lo,
                                                     pt[1])),
            ])
            return jnp.where(jax.random.uniform(ks_, ()) < 0.6, snapped, pt)

        def step(state, skey):
            pos, wp, until_turn, speed = state
            kt, ka, ks = jax.random.split(skey, 3)
            renew = (until_turn <= 0.0) | (
                jnp.linalg.norm(wp - pos) < 0.25)
            wp = jnp.where(renew, _waypoint(ka), wp)
            # re-draw pace per leg (log-uniform: ambles dominate, brisk
            # walking is the tail)
            speed = jnp.where(renew, _pace(ks), speed)
            # the leg's time budget covers actually REACHING the waypoint
            # (1.5x the straight-line time), so far corners get visited
            # instead of abandoned on a fixed timer
            leg_t = jnp.clip(
                1.5 * jnp.linalg.norm(wp - pos) / speed, 2.0, 40.0
            ) * jax.random.uniform(kt, (), minval=0.8, maxval=1.2)
            until_turn = jnp.where(renew, leg_t, until_turn)
            to_wp = wp - pos
            d = to_wp / jnp.maximum(jnp.linalg.norm(to_wp), 1e-6)
            cand = pos + speed * dt * d
            hit, _n = _collide(cand, boxes, valid, radius)
            # blocked: hold position this tick and aim somewhere new
            wp = jnp.where(hit, _waypoint(jax.random.fold_in(ka, 1)), wp)
            stuck, n0 = _collide(pos, boxes, valid, radius)
            escape = pos + speed * dt * n0
            new_pos = jnp.where(hit, jnp.where(stuck, escape, pos), cand)
            return (new_pos, wp, until_turn - dt, speed), new_pos

        state0 = (pos0, pos0, jnp.float32(0.0), speed0)
    else:

        def step(state, skey):
            pos, ang, until_turn, speed = state
            kt, ka, ks = jax.random.split(skey, 3)
            turn = until_turn <= 0.0
            new_ang = jnp.where(
                turn,
                jax.random.uniform(ka, (), minval=0.0, maxval=2 * math.pi),
                ang,
            )
            until_turn = jnp.where(
                turn,
                TURN_INTERVAL * jax.random.uniform(kt, (), minval=0.6,
                                                   maxval=1.4),
                until_turn,
            )
            d = jnp.stack([jnp.cos(new_ang), jnp.sin(new_ang)])
            cand = pos + speed * dt * d
            hit, n = _collide(cand, boxes, valid, radius)
            refl = d - 2.0 * jnp.dot(d, n) * n
            new_ang = jnp.where(hit, jnp.arctan2(refl[1], refl[0]), new_ang)
            # on hit: hold position, but if the CURRENT position is itself
            # inside a box (spawned overlapping), step out along the
            # collision normal so the walker can never get stuck
            stuck, n0 = _collide(pos, boxes, valid, radius)
            escape = pos + speed * dt * n0
            new_pos = jnp.where(hit, jnp.where(stuck, escape, pos), cand)
            return (new_pos, new_ang, until_turn - dt, speed), new_pos

        state0 = (pos0, ang0, jnp.float32(0.0), speed0)

    skeys = jax.random.split(kscan, num_steps)
    _, path = jax.lax.scan(step, state0, skeys)

    t = jnp.arange(num_steps, dtype=jnp.float32) * dt
    # the hand-held phone wanders vertically (pointing down at the floor,
    # raising to scan) — slow multi-sinusoid wander matching the real
    # capture's y std ~0.3 — while the Unity agent records a constant y
    if human:
        kw1, kw2 = jax.random.split(jax.random.fold_in(ky, 1))
        amp = jax.random.uniform(kw1, (), minval=0.1, maxval=0.3)
        ph = jax.random.uniform(kw2, (2,), minval=0.0, maxval=2 * math.pi)
        y = y_base + (amp * jnp.sin(t * 0.23 + ph[0])
                      + 0.5 * amp * jnp.sin(t * 0.61 + ph[1])
                      + 0.03 * jnp.sin(t * 1.7))
    else:
        y = jnp.broadcast_to(y_base, (num_steps,))
    return jnp.stack([path[:, 0], y, path[:, 1], t], axis=-1)


def box_evidence_mask(
    raw: jnp.ndarray,            # [T, 4] one trace
    boxes: jnp.ndarray,          # [M, 6]
    labels: jnp.ndarray,         # [M]
    valid: jnp.ndarray,          # [M] bool
    wall_margin: float = 0.8,
    furniture_margin: float = 0.5,
) -> jnp.ndarray:
    """True for boxes the TRACE carries evidence for: some point approaches
    the box's XZ footprint within a per-class margin (walls get the wider
    one — a perimeter pass pins a wall plane from further away than a
    single furniture contact does).

    The jit twin of tools/ceiling.py's contacted/plane-inferable split, for
    use at DATAGEN time: a low-coverage walk cannot resolve the room's
    unvisited half, and supervising those boxes teaches the model that
    short traces imply unpredictable far geometry (the round-3 HUMAN_SPAN
    diagnosis, PARITY.md — this masks the residual unanswerable targets
    that survive even well-posed room sizes)."""
    px, pz = raw[:, 0], raw[:, 2]
    cx, cz = boxes[:, 0], boxes[:, 2]
    hx, hz = boxes[:, 3] / 2, boxes[:, 5] / 2
    ax = jax.nn.relu(jnp.abs(px[None, :] - cx[:, None]) - hx[:, None])
    az = jax.nn.relu(jnp.abs(pz[None, :] - cz[:, None]) - hz[:, None])
    d = jnp.sqrt(ax ** 2 + az ** 2 + 1e-12)               # [M, T]
    margin = jnp.where(labels == 0, wall_margin, furniture_margin)
    return valid & (jnp.min(d, axis=1) < margin)


@functools.partial(
    jax.jit,
    static_argnames=("n_rooms", "num_steps", "max_colliders", "hz", "human",
                     "multi_room_prob", "sim_steps", "wall_adjacent_prob",
                     "span_range", "captures_per_room", "evidence_mask"))
def generate_rooms_and_traces(
    key: jax.Array,
    n_rooms: int,
    num_steps: int = 3000,
    max_colliders: int = 50,
    hz: float = 30.0,
    human: bool = False,
    multi_room_prob: float = 0.0,
    sim_steps: int | None = None,
    wall_adjacent_prob: float = 0.0,
    span_range: Tuple[float, float] | None = None,
    captures_per_room: int = 1,
    evidence_mask: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Batched datagen: n_rooms SAMPLES, in ONE jitted dispatch (eager
    per-primitive dispatch through a remote TPU tunnel costs minutes; this
    compiles once per shape).

    ``sim_steps`` decouples WALK DURATION from emitted points: the physics
    runs sim_steps ticks at ``hz`` and the trace is uniform-downsampled to
    num_steps with the same linspace indexing the loader applies to real
    captures (features.py:111, ref dataloader.py:453-456). The real human
    capture is ~97 s at 37 Hz = 3587 points downsampled to 1500 — a
    num_steps-tick walk (~40 s) covers far less of the room than the real
    capture, which starves training coverage at realistic ambling paces.

    ``captures_per_room`` > 1 emits that many INDEPENDENT walks of each
    sampled layout as separate samples (n_rooms stays the SAMPLE count;
    the layout count becomes n_rooms // captures_per_room) — the
    reference's own dataset ships 3-4 captures per room
    (dataset/train/: 4 agent + 3 human walks of one room), and several
    partial views of one room teach what a single short walk leaves
    ambiguous. ``evidence_mask`` drops GT boxes the walk carries no
    evidence for from the valid mask (box_evidence_mask) so unanswerable
    targets never supervise.

    Returns dict of raw [n, T, 4], length [n], boxes [n, M, 6],
    labels [n, M], valid [n, M].
    """
    kr, kt = jax.random.split(key)
    S = num_steps if sim_steps is None else max(int(sim_steps), num_steps)
    if span_range is None:
        # human walks have a ~hundred-second budget: room sizes must be
        # coverable at that budget or the task is ill-posed (see HUMAN_SPAN)
        span_range = HUMAN_SPAN if human else (3.5, 9.0)
    K = max(int(captures_per_room), 1)
    n_layouts = max(n_rooms // K, 1)

    def one(k):
        k1, k2 = jax.random.split(k)
        boxes, labels, valid = sample_room(
            k1, max_colliders, multi_room_prob=multi_room_prob,
            wall_adjacent_prob=wall_adjacent_prob,
            span_range=span_range)

        def walk(kk):
            raw = simulate_trace(kk, boxes, valid, S, hz, human)
            if S != num_steps:
                idx = np.linspace(0, S - 1, num_steps).astype(np.int32)
                raw = raw[idx]
            v = (box_evidence_mask(raw, boxes, labels, valid)
                 if evidence_mask else valid)
            return raw, v

        # K=1 keeps the walker key stream bit-identical to prior rounds
        # (seeded datasets are compared across code versions)
        wkeys = k2[None] if K == 1 else jax.random.split(k2, K)
        raws, vs = jax.vmap(walk)(wkeys)                    # [K, T, 4]
        return raws, boxes, labels, vs

    keys = jax.random.split(kr, n_layouts)
    raw, boxes, labels, valid = jax.vmap(one)(keys)         # [R, K, ...]
    M = boxes.shape[-2]
    n_out = n_layouts * K
    raw = raw.reshape(n_out, num_steps, 4)
    valid = valid.reshape(n_out, M)
    boxes = jnp.repeat(boxes, K, axis=0)
    labels = jnp.repeat(labels, K, axis=0)
    length = jnp.full((n_out,), num_steps, dtype=jnp.int32)
    return {
        "raw": raw,
        "length": length,
        "boxes": boxes,
        "labels": labels,
        "valid": valid,
    }


def write_synthetic_dataset(
    out_dir: str | Path,
    n_rooms: int,
    num_steps: int = 3000,
    seed: int = 0,
    max_colliders: int = 50,
    human: bool = False,
    multi_room_prob: float = 0.0,
    hz: float = 30.0,
    stem_prefix: str = "synthetic",
    sim_steps: int | None = None,
    wall_adjacent_prob: float = 0.0,
    span_range: Tuple[float, float] | None = None,
) -> None:
    """Generate rooms on device and write *_trace.json / *_collider.json pairs
    (pairing pattern 1 of the reference loader, dataloader.py:111-125).

    ``stem_prefix`` lets several exports (e.g. agent + human halves of a
    mixed set) coexist in one directory."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    data = jax.device_get(
        generate_rooms_and_traces(
            jax.random.key(seed), n_rooms, num_steps,
            max_colliders=max_colliders, hz=hz, human=human,
            multi_room_prob=multi_room_prob, sim_steps=sim_steps,
            wall_adjacent_prob=wall_adjacent_prob, span_range=span_range)
    )
    for i in range(n_rooms):
        stem = f"{stem_prefix}_{i:04d}"
        formats.save_trace_json(out_dir / f"{stem}_trace.json",
                                data["raw"][i])
        v = data["valid"][i]
        formats.save_colliders_json(
            out_dir / f"{stem}_collider.json",
            data["boxes"][i][v], data["labels"][i][v])
    print(f"Wrote {n_rooms} synthetic trace/collider pairs to {out_dir}")
