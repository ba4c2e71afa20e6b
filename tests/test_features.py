"""Featurization parity: device featurize == host twin == reference code."""

import json
import sys

import jax.numpy as jnp
import numpy as np

from room_slam_tpu.data.features import FEAT_DIM, featurize, process_traces_np
from tests.conftest import REFERENCE, requires_reference


def _random_trace(rng, n):
    t = np.sort(rng.uniform(0, 60, n)).astype(np.float32)
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * 2
    return np.concatenate([xyz, t[:, None]], axis=1)


def test_device_matches_host(rng):
    """featurize (device, fixed shape) == process_traces_np on sorted input
    with no downsampling, over valid rows."""
    L = 256
    for n in (1, 5, 100, 256):
        arr = _random_trace(rng, n)
        padded = np.zeros((L, 4), np.float32)
        padded[:n] = arr
        feats, mask = featurize(jnp.asarray(padded)[None],
                                jnp.asarray([n], jnp.int32))
        feats = np.asarray(feats[0])
        ref = process_traces_np(arr, max_len=L)
        np.testing.assert_allclose(feats[:n], ref, rtol=1e-5, atol=1e-5)
        assert np.asarray(mask[0]).sum() == n
        assert np.all(feats[n:] == 0)


def test_empty_trace():
    ref = process_traces_np(np.zeros((0, 4), np.float32))
    assert ref.shape == (1, FEAT_DIM)
    assert np.all(ref == 0)


def test_downsampling(rng):
    arr = _random_trace(rng, 5000)
    out = process_traces_np(arr, max_len=3000)
    assert out.shape == (3000, FEAT_DIM)
    # linspace indices preserve first and last rows
    full = process_traces_np(arr, max_len=10**9)
    np.testing.assert_allclose(out[0], full[0])
    np.testing.assert_allclose(out[-1], full[-1])


def test_unsorted_input_is_sorted():
    arr = np.array(
        [[1, 0, 0, 2.0], [2, 0, 0, 1.0], [3, 0, 0, 3.0]], np.float32)
    out = process_traces_np(arr)
    assert np.all(np.diff(out[:, 3]) >= 0)
    assert out[0, 0] == 2  # the t=1.0 row comes first


@requires_reference
def test_golden_vs_reference_process_traces(rng):
    """Bit-level parity with the reference featurizer on a real trace file
    (ref: src/benchmark/inference.py:24-57 semantics, reimplemented in
    process_traces_np)."""
    path = f"{REFERENCE}/dataset/val/human_data_20251016_204024.json"
    with open(path) as f:
        rows = json.load(f)
    arr = np.array(
        [[p["x"], p["y"], p["z"], p["timestamp"]] for p in rows],
        dtype=np.float32)

    ours = process_traces_np(arr, max_len=3000)

    # independent re-derivation straight from the published formula
    a = arr[np.argsort(arr[:, 3], kind="stable")].copy()
    a[:, 3] -= a[0, 3]
    d = np.diff(a, axis=0, prepend=a[[0]])
    dt = np.clip(d[:, 3], 1e-3, None)
    vel = d[:, :3] / dt[:, None]
    acc = np.diff(vel, axis=0, prepend=vel[[0]])
    speed = np.linalg.norm(vel, axis=1, keepdims=True)
    ref = np.concatenate([a, vel, acc, speed], axis=1)
    idx = np.linspace(0, ref.shape[0] - 1, 3000, dtype=int)
    if ref.shape[0] > 3000:
        ref = ref[idx]
    np.testing.assert_allclose(ours, ref.astype(np.float32), rtol=1e-6)
