"""Test-time trace-consistency adaptation: per-capture differentiable
refinement of predicted boxes against the physics the trace itself supplies.

Round 3 established (PARITY.md) that FIXED post-processing cannot recover
an unseen room's walls: every static prior (snap clearance, extent-wall
synthesis, dwell statistics) is wrong on some side of some room, because
per-side clearance is not directly observable. But three constraints ARE
observable, hold for every room, and are differentiable in the box
parameters:

1. **Non-penetration** — the walker's body cannot overlap a solid. Any
   predicted box the trace walks through is wrong in exactly the
   overlapping region; the gradient pushes the offending face out to the
   last crossing point (for an inward-regressed wall: the visited-envelope
   plane, which tools/ceiling.py shows pins 'contacted' walls).
2. **Envelope bounding** — everything a single-room capture contains
   intersects the visited envelope plus a small margin (the hard-mask twin
   is ops/refine.outside_extent_mask); the soft version pulls phantom
   far-out boxes back instead of deleting them.
3. **Contact attraction** — trace points just outside a box's footprint
   pull the nearest face to touching distance (dwell clusters mark contact;
   off by default: round 3 measured dwell statistics anti-correlated with
   wall proximity, so this term must earn adoption on calibration data).

Unlike the reference's static post-process (src/benchmark/inference.py:
130-197 — threshold + NMS only) this ADAPTS per capture: a fixed number of
Adam steps on per-box XZ center/size deltas, under a trust-region penalty
so boxes never stray far from the model's estimate. Pure jnp, fixed shapes,
``lax.scan`` over steps — one jitted dispatch per capture batch; vmap over
captures exactly like ops/refine.refine_walls.

Adoption protocol: swept on synthetic calibration splits only (tools/
calibrate.py sweeps it as an operating-point dimension); see FINAL.md for
the one-shot scoring rule.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class TTOptParams(NamedTuple):
    """Hyperparameters of the test-time adaptation (an operating-point
    dimension, like an NMS threshold — not trained)."""

    steps: int = 150          # Adam steps per capture
    lr: float = 0.02          # Adam step size (metres/step scale)
    w_pen: float = 1.0        # non-penetration weight
    w_env: float = 0.2        # envelope-bounding weight
    w_att: float = 0.0        # contact-attraction weight (must earn its on)
    w_trust: float = 0.3      # trust-region pull toward the model's boxes
    body_radius: float = 0.2  # walker body half-width around the sensor (m)
    body_below: float = 1.2   # body extends this far below the sensor (m)
    body_above: float = 0.3   # ... and this far above (m)
    env_margin: float = 0.5   # allowed footprint distance beyond the extent
    att_sigma: float = 0.3    # contact kernel width (m)
    w_att_faces: float = 0.0  # per-face gated contact attraction (round-5
                              # localization lever; must earn its on). The
                              # global w_att term was never adopted because
                              # approach evidence is ANISOTROPIC: a box the
                              # walker passes only on its south side must
                              # not have its north face dragged south. Here
                              # each XZ face is attracted only by trace
                              # points in its own outward sector, toward
                              # touching distance (= body_radius), and only
                              # when the face's kernel-weighted contact
                              # mass exceeds att_mass — unevidenced faces
                              # feel nothing.
    att_mass: float = 3.0     # min kernel-weighted contact mass per face
    w_att_min: float = 0.0    # per-face NEAREST-APPROACH attraction
                              # (round-5, second design). The kernel-mean
                              # form (w_att_faces) measured strongly
                              # negative on calibration: it drags every
                              # face toward the kernel-weighted MEAN of
                              # its sector points, i.e. toward trace
                              # clusters, even when the face is already
                              # correct. The physics only pins the
                              # CLOSEST pass: a walker's sensor cannot
                              # come nearer than body_radius to a solid
                              # face, and a dwell that grazes a face
                              # marks touching. So this term pulls a face
                              # only to put its nearest sector point at
                              # touching distance (= body_radius), gated
                              # on that nearest pass existing within
                              # att_sigma and on >= att_mass points in
                              # the near band — an already-touched face
                              # (nearest pass ~ body_radius) feels ~zero
                              # force, and unapproached faces feel none.
    deadband: float = 0.0     # per-box gate: the non-penetration force is
                              # OFF unless some trace point penetrates
                              # deeper than this (m). The real captures
                              # penetrate their own GT boxes (human walks:
                              # median depth 0.07-0.13 m, max 0.21 on the
                              # train room — body-model + sensor error), so
                              # zero-deadband plowing moves CORRECT boxes —
                              # the measured cause of ttopt's seen-room
                              # damage. A gate (not a depth subtraction,
                              # which would equal shrinking body_radius and
                              # neuter thin walls whose depth caps at
                              # h + body_radius) keeps the full plow force
                              # on genuinely crossed boxes.


def _physics_loss(dc, dls, boxes0, px, pz, valid, ygate, extent,
                  p: TTOptParams):
    """Total physics loss of the adapted boxes.

    dc [Q, 2] XZ center deltas, dls [Q, 2] XZ log-size deltas; boxes0
    [Q, 6] the model's estimate; px/pz [L] trace coordinates; valid [L];
    ygate [Q, L] box-body y-overlap indicator; extent (x_min, x_max,
    z_min, z_max).

    Every term is a SUM of per-box quantities, so one box's equilibrium
    (physics force vs trust-region pull) is independent of Q and of the
    trace length. With defaults, the non-penetration force (gradient
    magnitude w_pen per penetrated box) overcomes the trust pull
    (2 * w_trust * |delta|) out to |delta| = w_pen / (2 * w_trust)
    ~ 1.7 m — a penetrated wall 'plows' outward until nothing crosses it.
    """
    cx = boxes0[:, 0] + dc[:, 0]
    cz = boxes0[:, 2] + dc[:, 1]
    hx = 0.5 * boxes0[:, 3] * jnp.exp(dls[:, 0])
    hz = 0.5 * boxes0[:, 5] * jnp.exp(dls[:, 1])

    w_pt = valid[None, :] * ygate                         # [Q, L]

    # --- non-penetration: per-point depth inside each box's body-inflated
    # footprint (min over axes = the exit distance), combined as two
    # normalized terms whose per-box force is O(w_pen) whether a thin wall
    # is crossed at 3 points or a slab at 300 (any penetration is equally
    # impossible):
    #   * depth^2 / sum(depth): the gradient is the DEPTH-WEIGHTED mean
    #     escape direction. Its equilibrium for a box straddling the
    #     envelope edge is the inner face exactly at the outermost trace
    #     point — a wall regressed inward of a touched wall plane gets
    #     plowed back onto it (tools/ceiling.py's 'contacted' recovery),
    #     and a box fully clear of the trace feels nothing.
    #   * mean depth (count-normalized): supplies drift along the point
    #     imbalance and a face-shrinking force for boxes fully inside
    #     walked space, where the depth^2 term's lateral force vanishes
    #     by symmetry.
    # Both denominators are stop-grad so each term reads as force = field.
    dx_in = (hx[:, None] + p.body_radius) - jnp.abs(px[None, :] - cx[:, None])
    dz_in = (hz[:, None] + p.body_radius) - jnp.abs(pz[None, :] - cz[:, None])
    pen = jax.nn.relu(jnp.minimum(dx_in, dz_in)) * w_pt   # [Q, L]
    # deadband gate: a box only some trace points GRAZE (max depth below
    # the body-model error) feels no force at all; one point past the
    # gate switches the full plow on (stop-grad, so the gate is a mask,
    # not a potential)
    if p.deadband > 0.0:
        gate = jax.lax.stop_gradient(
            (jnp.max(pen, axis=1) > p.deadband).astype(pen.dtype))
        pen = pen * gate[:, None]
    sum_pen = jnp.sum(pen, axis=1)
    n_pen = jax.lax.stop_gradient(jnp.sum(pen > 0, axis=1).astype(pen.dtype))
    loss_pen = jnp.sum(
        jnp.sum(pen ** 2, axis=1)
        / jnp.maximum(jax.lax.stop_gradient(sum_pen), 1e-6)
        + 0.5 * sum_pen / jnp.maximum(n_pen, 1.0))

    # --- envelope bounding: footprint distance beyond extent + margin
    x_min, x_max, z_min, z_max = extent
    ex = jax.nn.relu(jnp.maximum(x_min - (cx + hx), (cx - hx) - x_max))
    ez = jax.nn.relu(jnp.maximum(z_min - (cz + hz), (cz - hz) - z_max))
    d_out = jnp.sqrt(ex ** 2 + ez ** 2 + 1e-12)
    loss_env = jnp.sum(jax.nn.relu(d_out - p.env_margin))

    # --- contact attraction: kernel-weighted approach distance of nearby
    # OUTSIDE points to the nearest face (0 at touch)
    ax = jax.nn.relu(jnp.abs(px[None, :] - cx[:, None]) - hx[:, None])
    az = jax.nn.relu(jnp.abs(pz[None, :] - cz[:, None]) - hz[:, None])
    a = jnp.sqrt(ax ** 2 + az ** 2 + 1e-12)               # [Q, L]
    kw = jnp.exp(-0.5 * (a / p.att_sigma) ** 2) * w_pt
    loss_att = jnp.sum(jnp.sum(kw * a, axis=1)
                       / (jnp.sum(kw, axis=1) + 1e-6))

    # --- per-face gated contact attraction (see TTOptParams.w_att_faces):
    # face-sector points pull THEIR face to touching distance
    # (body_radius); faces without enough contact mass are gated off
    loss_att_f = 0.0
    if p.w_att_faces > 0.0:
        r = p.body_radius
        band_z = (jnp.abs(pz[None, :] - cz[:, None])
                  < hz[:, None] + p.att_sigma)
        band_x = (jnp.abs(px[None, :] - cx[:, None])
                  < hx[:, None] + p.att_sigma)

        def face(a_signed, band):
            # a_signed: outward distance beyond the face plane (>0 =
            # outside on this face's side)
            a = a_signed
            kw_f = (jnp.exp(-0.5 * ((a - r) / p.att_sigma) ** 2)
                    * w_pt * band * (a > 0))
            mass = jnp.sum(jax.lax.stop_gradient(kw_f), axis=1)
            gate = jax.lax.stop_gradient(
                (mass > p.att_mass).astype(jnp.float32))
            err = jnp.sum(jax.lax.stop_gradient(kw_f) * (a - r) ** 2,
                          axis=1)
            return gate * err / jnp.maximum(mass, 1e-6)

        loss_att_f = jnp.sum(
            face(px[None, :] - (cx[:, None] + hx[:, None]), band_z)
            + face((cx[:, None] - hx[:, None]) - px[None, :], band_z)
            + face(pz[None, :] - (cz[:, None] + hz[:, None]), band_x)
            + face((cz[:, None] - hz[:, None]) - pz[None, :], band_x))

    # --- per-face nearest-approach attraction (TTOptParams.w_att_min):
    # each face is pulled only to put its CLOSEST sector point at touching
    # distance; faces with no pass within att_sigma (or too few near
    # points) feel nothing
    loss_att_m = 0.0
    if p.w_att_min > 0.0:
        r = p.body_radius
        band_z = (jnp.abs(pz[None, :] - cz[:, None])
                  < hz[:, None] + p.att_sigma)
        band_x = (jnp.abs(px[None, :] - cx[:, None])
                  < hx[:, None] + p.att_sigma)

        def face_min(a_signed, band):
            ok = (w_pt > 0) & band & (a_signed > 0)
            a = jnp.where(ok, a_signed, jnp.inf)
            d_min = jnp.min(a, axis=1)                       # [Q]
            near = jnp.sum(
                jax.lax.stop_gradient(
                    (ok & (a_signed < r + p.att_sigma))).astype(jnp.float32),
                axis=1)
            gate = jax.lax.stop_gradient(
                (jnp.isfinite(d_min)
                 & (jax.lax.stop_gradient(d_min) < r + p.att_sigma)
                 & (near >= p.att_mass)).astype(jnp.float32))
            d_safe = jnp.where(jnp.isfinite(d_min), d_min, r)
            return gate * (d_safe - r) ** 2

        loss_att_m = jnp.sum(
            face_min(px[None, :] - (cx[:, None] + hx[:, None]), band_z)
            + face_min((cx[:, None] - hx[:, None]) - px[None, :], band_z)
            + face_min(pz[None, :] - (cz[:, None] + hz[:, None]), band_x)
            + face_min((cz[:, None] - hz[:, None]) - pz[None, :], band_x))

    # --- trust region: stay near the model's estimate
    loss_trust = jnp.sum(dc ** 2) + jnp.sum(dls ** 2)

    return (p.w_pen * loss_pen + p.w_env * loss_env
            + p.w_att * loss_att + p.w_att_faces * loss_att_f
            + p.w_att_min * loss_att_m
            + p.w_trust * loss_trust)


@partial(jax.jit, static_argnames=("params",))
def penetration_depth(
    boxes: jnp.ndarray,          # [Q, 6] (cx, cy, cz, sx, sy, sz)
    raw: jnp.ndarray,            # [L, 4] the input trace (x, y, z, t)
    length: jnp.ndarray,         # [] valid length
    params: TTOptParams = TTOptParams(),
) -> jnp.ndarray:
    """Mean in-body penetration depth (metres) of the trace into each box.

    The measurement half of the non-penetration physics (same geometry as
    ``_physics_loss``): for every trace point inside a box's body-inflated
    footprint (and overlapping the walker's body column in y), the depth is
    the smallest axis distance to an XZ face — how far the box would have
    to retreat for that point to exit. Averaged over penetrated points, 0
    for boxes the walk never crosses.

    Used for PHYSICS RESCORING at post-process time: a candidate the
    walker walked through is geometrically wrong no matter how confident
    the decoder is, so ranking can demote it (``pen_beta`` operating-point
    dimension, ops/nms.post_process ``conf_scale``). The reference's
    post-process has no physics term at all (src/benchmark/
    inference.py:130-197).
    """
    L = raw.shape[0]
    valid = (jnp.arange(L) < length).astype(jnp.float32)
    px, pz, py = raw[:, 0], raw[:, 2], raw[:, 1]

    cx, cz = boxes[:, 0], boxes[:, 2]
    hx, hz = 0.5 * boxes[:, 3], 0.5 * boxes[:, 5]
    by_lo = boxes[:, 1] - 0.5 * boxes[:, 4]
    by_hi = boxes[:, 1] + 0.5 * boxes[:, 4]
    ygate = ((by_lo[:, None] < py[None, :] + params.body_above)
             & (by_hi[:, None] > py[None, :] - params.body_below))
    w_pt = valid[None, :] * ygate.astype(jnp.float32)     # [Q, L]

    dx_in = (hx[:, None] + params.body_radius) - jnp.abs(px[None, :] - cx[:, None])
    dz_in = (hz[:, None] + params.body_radius) - jnp.abs(pz[None, :] - cz[:, None])
    pen = jax.nn.relu(jnp.minimum(dx_in, dz_in)) * w_pt   # [Q, L]
    n_pen = jnp.sum(pen > 0, axis=1).astype(pen.dtype)
    return jnp.sum(pen, axis=1) / jnp.maximum(n_pen, 1.0)


@partial(jax.jit, static_argnames=("params",))
def adapt_boxes(
    boxes: jnp.ndarray,          # [Q, 6] (cx, cy, cz, sx, sy, sz)
    raw: jnp.ndarray,            # [L, 4] the input trace (x, y, z, t)
    length: jnp.ndarray,         # [] valid length
    params: TTOptParams = TTOptParams(),
) -> jnp.ndarray:
    """Adapt the XZ centers/sizes of ``boxes`` to be physically consistent
    with the capture's trace (see module docstring). y center/size and the
    box identities (labels, scores, ordering) are untouched.

    Deterministic, fixed shapes, ``lax.scan`` over ``params.steps`` plain
    Adam steps — safe inside a vmapped jitted post-process.
    """
    import optax

    L = raw.shape[0]
    valid = (jnp.arange(L) < length).astype(jnp.float32)
    px, pz, py = raw[:, 0], raw[:, 2], raw[:, 1]

    big = jnp.float32(1e9)
    extent = (jnp.min(jnp.where(valid > 0, px, big)),
              jnp.max(jnp.where(valid > 0, px, -big)),
              jnp.min(jnp.where(valid > 0, pz, big)),
              jnp.max(jnp.where(valid > 0, pz, -big)))

    # y-overlap gate between each box and the walker's body column
    # [py - body_below, py + body_above]; box y is frozen, so the gate is
    # constant across steps and precomputed per (box, point)
    by_lo = boxes[:, 1] - 0.5 * boxes[:, 4]               # [Q]
    by_hi = boxes[:, 1] + 0.5 * boxes[:, 4]
    ygate = ((by_lo[:, None] < py[None, :] + params.body_above)
             & (by_hi[:, None] > py[None, :] - params.body_below))
    ygate = ygate.astype(jnp.float32)                     # [Q, L]

    def loss_fn(deltas):
        dc, dls = deltas
        return _physics_loss(dc, dls, boxes, px, pz, valid, ygate,
                             extent, params)

    tx = optax.adam(params.lr)
    deltas0 = (jnp.zeros((boxes.shape[0], 2)), jnp.zeros((boxes.shape[0], 2)))
    opt0 = tx.init(deltas0)

    def step(carry, _):
        deltas, opt = carry
        grads = jax.grad(loss_fn)(deltas)
        updates, opt = tx.update(grads, opt, deltas)
        deltas = optax.apply_updates(deltas, updates)
        return (deltas, opt), None

    (deltas, _), _ = jax.lax.scan(step, (deltas0, opt0), None,
                                  length=params.steps)
    dc, dls = deltas
    out = boxes
    out = out.at[:, 0].add(dc[:, 0])
    out = out.at[:, 2].add(dc[:, 1])
    out = out.at[:, 3].multiply(jnp.exp(dls[:, 0]))
    out = out.at[:, 5].multiply(jnp.exp(dls[:, 1]))
    return out
