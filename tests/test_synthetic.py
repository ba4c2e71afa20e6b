"""On-device synthetic datagen invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from room_slam_tpu.data import formats, synthetic


def test_room_layout():
    boxes, labels, valid = synthetic.sample_room(jax.random.key(0))
    boxes, labels, valid = map(np.asarray, (boxes, labels, valid))
    assert valid[:4].all()
    assert (labels[:4] == 0).all()  # walls are BLOCK
    # walls span the room: two long in z, two long in x
    assert (boxes[0, 5] > 3) and (boxes[2, 3] > 3)
    assert valid.sum() >= 6  # 4 walls + >= 2 furniture
    assert (labels[~valid] == -1).all()


def test_trace_stays_in_room_and_avoids_furniture():
    key = jax.random.key(1)
    boxes, labels, valid = synthetic.sample_room(key)
    raw = synthetic.simulate_trace(
        jax.random.key(2), boxes, valid, num_steps=2000)
    raw = np.asarray(raw)
    boxes, valid = np.asarray(boxes), np.asarray(valid)

    # time strictly increasing
    assert np.all(np.diff(raw[:, 3]) > 0)

    # inside the walls (with a small numeric slack)
    half_w = boxes[0, 0]
    half_d = boxes[2, 2]
    assert np.all(np.abs(raw[:, 0]) <= half_w + 0.05)
    assert np.all(np.abs(raw[:, 2]) <= half_d + 0.05)

    # never inside a furniture footprint (minus the agent radius slack)
    for j in np.where(valid)[0][4:]:
        dx = np.abs(raw[:, 0] - boxes[j, 0])
        dz = np.abs(raw[:, 2] - boxes[j, 2])
        inside = (dx < boxes[j, 3] / 2) & (dz < boxes[j, 5] / 2)
        assert not inside.any(), j

    # the agent actually moves around
    assert raw[:, 0].std() > 0.3 and raw[:, 2].std() > 0.3


def test_batched_generation_and_roundtrip(tmp_path):
    data = synthetic.generate_rooms_and_traces(
        jax.random.key(0), n_rooms=3, num_steps=500)
    assert data["raw"].shape == (3, 500, 4)
    assert data["boxes"].shape == (3, 50, 6)

    synthetic.write_synthetic_dataset(tmp_path, n_rooms=2, num_steps=300,
                                      seed=1)
    pairs = formats.find_data_pairs(tmp_path)
    assert len(pairs) == 2
    arr = formats.load_trace_json(pairs[0][0])
    assert arr.shape == (300, 4)
    b, l = formats.load_colliders_json(pairs[0][1])
    # 4 walls + whatever furniture survived corridor rejection (>= 1)
    assert b.shape[1] == 6 and b.shape[0] >= 5
