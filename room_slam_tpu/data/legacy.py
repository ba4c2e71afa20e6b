"""Legacy (CSV, 2D) dataset surface.

The reference README documents this surface (README.md:84-108, 149-157):
CSV movement traces ``timestamp, x, y``, fixed-length windows of
SEQUENCE_LENGTH=500, up to MAX_OBJECTS=10 ground-truth objects with
class / position(2) / size(2) / orientation / validity, classes
GROUND/LOW/MID/BLOCK. The described loader (src/data/dataset.py) is absent
from the snapshot; this implements the documented contract, TPU-style:
parse once -> fixed-shape arrays -> batches gathered on device.

Ground-truth sidecars use the README's prediction JSON schema
(``{"objects": [...]}``, README.md:93-108) as ``<stem>_objects.json``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Iterator, List, Tuple

import numpy as np

from room_slam_tpu.config import LEGACY_LABELS
from room_slam_tpu.data import formats

SEQ_LEN = 500          # README.md:153
MAX_OBJECTS = 10       # README.md:155


def window_trace(
    arr: np.ndarray, seq_len: int = SEQ_LEN, stride: int | None = None
) -> np.ndarray:
    """Slice a [N, 3] (t, x, y) trace into fixed [W, seq_len, 3] windows.
    Traces shorter than seq_len are linearly resampled up to seq_len."""
    if arr.shape[0] == 0:
        return np.zeros((0, seq_len, 3), np.float32)
    order = np.argsort(arr[:, 0], kind="stable")
    arr = arr[order]
    if arr.shape[0] < seq_len:
        idx = np.linspace(0, arr.shape[0] - 1, seq_len)
        lo = np.floor(idx).astype(int)
        hi = np.minimum(lo + 1, arr.shape[0] - 1)
        frac = (idx - lo)[:, None].astype(np.float32)
        arr = arr[lo] * (1 - frac) + arr[hi] * frac
    stride = stride or seq_len
    windows = []
    for start in range(0, arr.shape[0] - seq_len + 1, stride):
        w = arr[start: start + seq_len].copy()
        w[:, 0] -= w[0, 0]
        windows.append(w)
    return np.stack(windows).astype(np.float32)


def load_objects_json(path: str | Path) -> Tuple[np.ndarray, np.ndarray,
                                                 np.ndarray, np.ndarray]:
    """Parse a legacy objects JSON -> (positions [M,2], sizes [M,2],
    orientations [M], class_ids [M])."""
    data = json.loads(Path(path).read_text())
    objs = data.get("objects", []) if isinstance(data, dict) else data
    m = len(objs)
    pos = np.zeros((m, 2), np.float32)
    size = np.zeros((m, 2), np.float32)
    orient = np.zeros((m,), np.float32)
    cls = np.zeros((m,), np.int32)
    for i, o in enumerate(objs):
        pos[i] = o.get("position", [0, 0])[:2]
        size[i] = o.get("size", [0, 0])[:2]
        orient[i] = o.get("orientation", 0.0)
        cls[i] = o.get(
            "class_id", LEGACY_LABELS.get(o.get("class_name", "MID"), 2))
    return pos, size, orient, cls


def find_legacy_pairs(data_dir: str | Path) -> List[Tuple[Path, Path]]:
    """Pair ``<stem>.csv`` with ``<stem>_objects.json``."""
    data_dir = Path(data_dir)
    pairs = []
    for csv in sorted(data_dir.glob("*.csv")):
        side = data_dir / f"{csv.stem}_objects.json"
        if side.exists():
            pairs.append((csv, side))
    return pairs


class LegacyArrays:
    """All legacy samples as fixed-shape arrays (one window = one sample)."""

    def __init__(self, data_dir: str | Path, seq_len: int = SEQ_LEN,
                 max_objects: int = MAX_OBJECTS, stride: int | None = None):
        pairs = find_legacy_pairs(data_dir)
        if not pairs:
            raise ValueError(f"No CSV/objects pairs found in {data_dir}")
        traces, boxes, labels, valid, trace_id = [], [], [], [], []
        for tid, (csv, side) in enumerate(pairs):
            arr = formats.load_trace_csv(csv)
            wins = window_trace(arr, seq_len, stride)
            pos, size, orient, cls = load_objects_json(side)
            m = min(len(cls), max_objects)
            b = np.zeros((max_objects, 5), np.float32)
            l = np.full((max_objects,), -1, np.int32)
            v = np.zeros((max_objects,), bool)
            b[:m, :2] = pos[:m]
            b[:m, 2:4] = size[:m]
            b[:m, 4] = orient[:m]
            l[:m] = cls[:m]
            v[:m] = True
            for w in wins:
                traces.append(w)
                boxes.append(b)
                labels.append(l)
                valid.append(v)
                trace_id.append(tid)
        self.traces = np.stack(traces)          # [S, seq, 3] (t, x, y)
        self.boxes = np.stack(boxes)            # [S, M, 5]
        self.labels = np.stack(labels)
        self.valid = np.stack(valid)
        self.trace_id = np.asarray(trace_id, np.int32)
        self.num_samples = len(traces)

    def __len__(self):
        return self.num_samples

    def epoch_batches(self, batch_size: int, seed: int = 0,
                      shuffle: bool = True) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(seed)
        order = (rng.permutation(self.num_samples) if shuffle
                 else np.arange(self.num_samples))
        for lo in range(0, self.num_samples, batch_size):
            chunk = order[lo: lo + batch_size]
            pad = batch_size - len(chunk)
            idx = np.concatenate(
                [chunk, np.zeros((pad,), dtype=chunk.dtype)])
            w = np.ones((batch_size,), np.float32)
            if pad:
                w[-pad:] = 0.0
            yield {
                "traces": self.traces[idx, :, 1:3],   # (x, y)
                "boxes": self.boxes[idx],
                "labels": self.labels[idx],
                "valid": self.valid[idx],
                "weight": w,
            }


def create_sample_data(out_dir: str | Path, n_traces: int = 10,
                       seed: int = 0, num_steps: int = 1500) -> None:
    """``train.py --create_sample_data`` (ref: README.md:64-68): synthesize
    legacy CSV traces + object ground truth from the on-device room
    generator, projected to 2D (x, z) -> (x, y)."""
    import jax

    from room_slam_tpu.data import synthetic

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    data = jax.device_get(synthetic.generate_rooms_and_traces(
        jax.random.key(seed), n_traces, num_steps))
    for i in range(n_traces):
        raw = data["raw"][i]  # [T, 4] x, y, z, t
        csv = np.stack([raw[:, 3], raw[:, 0], raw[:, 2]], axis=1)
        formats.save_trace_csv(out_dir / f"sample_{i:03d}.csv", csv)

        objs = []
        v = data["valid"][i]
        for b, lab in zip(data["boxes"][i][v], data["labels"][i][v]):
            # benchmark labels BLOCK/LOW/MID/HIGH -> legacy GROUND/LOW/MID/
            # BLOCK: walls stay BLOCK, HIGH furniture folds into MID
            name = {0: "BLOCK", 1: "LOW", 2: "MID", 3: "MID"}[int(lab)]
            objs.append({
                "class_id": int(LEGACY_LABELS[name]),
                "class_name": name,
                "position": [float(b[0]), float(b[2])],  # x, z plane
                "size": [float(b[3]), float(b[5])],
                "orientation": 0.0,
                "confidence": 1.0,
            })
        formats.save_objects_json(
            out_dir / f"sample_{i:03d}_objects.json", objs)
    print(f"Wrote {n_traces} legacy CSV samples to {out_dir}")
