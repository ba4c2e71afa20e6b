"""Kinematic feature engineering.

The reference computes 11-D features ``[x,y,z,t, vx,vy,vz, ax,ay,az, speed]``
per trace in numpy on the host for every ``__getitem__``
(ref: src/benchmark/dataloader.py:410-457, duplicated in inference.py:24-57).

Here the same math is a pure, fixed-shape jnp function that runs inside the
jitted train step over the whole batch, so featurization rides the VPU instead
of the host loop. An exact host-numpy twin (`process_traces_np`) is kept for
the single-trace inference path and for golden parity tests.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

FEAT_DIM = 11


def featurize(raw: jnp.ndarray, length: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Featurize padded, time-sorted raw traces on device.

    Args:
        raw: ``[..., L, 4]`` float32 of (x, y, z, t); rows ``>= length`` are
            padding. Rows must already be time-sorted (the host loader and the
            on-device generator both emit sorted traces; the augmentations
            preserve order).
        length: ``[...]`` int32 count of valid rows (>= 1).

    Returns:
        feats: ``[..., L, 11]`` float32, zeros in padded rows.
        mask:  ``[..., L]`` bool, True for valid rows.

    Matches the reference semantics (dataloader.py:441-450):
      - t is shifted so the first valid row has t=0
      - velocity = diff(pos) / clip(diff(t), 1e-3), first row = 0
      - acceleration = diff(velocity) (NOT divided by dt — faithful to the
        reference), first row = 0
      - speed = |velocity|
    """
    L = raw.shape[-2]
    idx = jnp.arange(L)
    mask = idx < length[..., None]  # [..., L]
    fmask = mask[..., None].astype(raw.dtype)

    pos = raw[..., :3]
    t = raw[..., 3:4] - raw[..., :1, 3:4]  # t -= t[0]

    # first-row diff is 0 (reference prepends row 0 to itself)
    dpos = jnp.diff(pos, axis=-2, prepend=pos[..., :1, :])
    dt = jnp.clip(jnp.diff(t, axis=-2, prepend=t[..., :1, :]), 1e-3, None)
    vel = dpos / dt
    acc = jnp.diff(vel, axis=-2, prepend=vel[..., :1, :])
    speed = jnp.linalg.norm(vel, axis=-1, keepdims=True)

    feats = jnp.concatenate([pos, t, vel, acc, speed], axis=-1)
    return feats * fmask, mask


def trace_stats(
    coords: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked mean [.., 1, 3] and RMS x-z scale [.., 1, 1] of raw coordinates,
    used for relative box decoding (ref: src/benchmark/model.py:41-46)."""
    m = mask[..., None].astype(coords.dtype)
    denom = jnp.clip(jnp.sum(m, axis=-2, keepdims=True), 1.0, None)  # [..,1,1]
    mean = jnp.sum(coords * m, axis=-2, keepdims=True) / denom  # [..,1,3]
    centered = (coords - mean) * m
    xz_sq = centered[..., 0] ** 2 + centered[..., 2] ** 2  # [.., L]
    rms = jnp.sqrt(
        jnp.sum(xz_sq, axis=-1, keepdims=True)[..., None] / denom
    )  # [..,1,1]
    scale = jnp.clip(rms, 1e-3, None)
    return mean, scale


def process_traces_np(arr: np.ndarray, max_len: int = 3000) -> np.ndarray:
    """Host twin of the reference's inference featurizer — bit-exact parity
    target (ref: src/benchmark/inference.py:24-57).

    Args:
        arr: ``[N, 4]`` float32 of (x, y, z, t), any order.
        max_len: downsample target.

    Returns:
        ``[n, 11]`` float32 features, n = min(N, max_len); ``[1, 11]`` zeros
        if the input is empty.
    """
    arr = np.asarray(arr, dtype=np.float32)
    if arr.shape[0] == 0:
        return np.zeros((1, FEAT_DIM), dtype=np.float32)

    order = np.argsort(arr[:, 3], kind="stable")
    arr = arr[order]
    arr = arr.copy()
    arr[:, 3] -= arr[0, 3]

    diffs = np.diff(arr, axis=0, prepend=arr[[0], :])
    dt = np.clip(diffs[:, 3], 1e-3, None)
    vel = diffs[:, :3] / dt[:, None]
    acc = np.diff(vel, axis=0, prepend=vel[[0], :])
    speed = np.linalg.norm(vel, axis=1, keepdims=True)
    kin = np.concatenate([vel, acc, speed], axis=1)

    feats = np.concatenate([arr, kin], axis=1).astype(np.float32)

    if feats.shape[0] > max_len:
        idx = np.linspace(0, feats.shape[0] - 1, max_len, dtype=int)
        feats = feats[idx]
    return feats
