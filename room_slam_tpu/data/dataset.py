"""Host dataset: parse every trace/collider file ONCE into fixed-shape arrays.

The reference re-parses JSON and re-runs Python-loop augmentation for every
``__getitem__`` on every epoch (ref: src/benchmark/dataloader.py:317-408) —
its dominant training cost. Here files are parsed a single time at
construction; an epoch is just shuffled integer indices gathered on device,
with augmentation + featurization fused into the jitted train step
(see augment.py / features.py).

Fixed-shape batch contract (one XLA compilation serves every step):
    raw        [B, L, 4] float32  (x, y, z, t) time-sorted, zero-padded
    length     [B]       int32
    boxes      [B, M, 6] float32
    labels     [B, M]    int32    (-1 padding)
    valid      [B, M]    bool
    rotation_k [B]       int32    rotation index 0..3 (epoch expansion)
    weight     [B]       float32  1.0 for real samples, 0.0 for batch padding
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Iterator, List, Tuple

import numpy as np

from room_slam_tpu.config import DataConfig
from room_slam_tpu.data import formats


class TraceColliderArrays:
    """All samples of a directory as padded numpy arrays.

    The 4x rotation expansion of the reference (dataloader.py:80-92) is an
    index-space expansion here: sample i corresponds to base pair
    ``i // n_rot`` at rotation angle ``rotation_angles[i % n_rot]``; the actual
    rotation happens on device in augment.rotate_sample.
    """

    @classmethod
    def from_arrays(cls, arrays: Dict[str, np.ndarray], cfg: DataConfig,
                    augment: bool = True) -> "TraceColliderArrays":
        """Build a dataset directly from in-memory arrays (e.g. the on-device
        synthetic generator) — no file round-trip."""
        self = cls.__new__(cls)
        self.cfg = cfg
        self.augment = augment
        self.data_dir = None
        self.raw = np.asarray(arrays["raw"], np.float32)
        self.length = np.asarray(arrays["length"], np.int32)
        self.boxes = np.asarray(arrays["boxes"], np.float32)
        self.labels = np.asarray(arrays["labels"], np.int32)
        self.valid = np.asarray(arrays["valid"], bool)
        n = self.raw.shape[0]
        self.names = [f"synthetic_{i:05d}" for i in range(n)]
        rot = (list(cfg.rotation_angles)
               if (augment and cfg.augment_rotation) else [0])
        self.rotation_angles = rot
        self.n_base = n
        self.num_samples = n * len(rot)
        return self

    def __init__(self, data_dir: str | Path, cfg: DataConfig,
                 augment: bool = True, verbose: bool = True):
        self.cfg = cfg
        self.augment = augment
        self.data_dir = Path(data_dir)
        pairs = formats.find_data_pairs(self.data_dir)
        if not pairs:
            raise ValueError(f"No valid data files found in {data_dir}")
        if verbose:
            print(f"Found {len(pairs)} base samples in {data_dir}")

        L, M = cfg.max_trace_len, cfg.max_colliders
        n = len(pairs)
        self.raw = np.zeros((n, L, 4), dtype=np.float32)
        self.length = np.zeros((n,), dtype=np.int32)
        self.boxes = np.zeros((n, M, 6), dtype=np.float32)
        self.labels = np.full((n, M), -1, dtype=np.int32)
        self.valid = np.zeros((n, M), dtype=bool)
        self.names: List[str] = []

        collider_cache: Dict[Path, Tuple[np.ndarray, np.ndarray]] = {}
        for i, (trace_file, collider_file) in enumerate(pairs):
            arr = formats.load_trace_json(trace_file)          # [N, 4]
            arr = formats.sort_by_time(arr)
            arr = formats.linspace_downsample(arr, L)
            k = max(arr.shape[0], 1)
            self.raw[i, : arr.shape[0]] = arr
            self.length[i] = k

            if collider_file not in collider_cache:
                collider_cache[collider_file] = formats.load_colliders_json(
                    collider_file)
            b, lab = collider_cache[collider_file]
            m = min(b.shape[0], M)
            self.boxes[i, :m] = b[:m]
            self.labels[i, :m] = lab[:m]
            self.valid[i, :m] = True
            self.names.append(trace_file.name)

        rot = (
            list(cfg.rotation_angles)
            if (augment and cfg.augment_rotation)
            else [0]
        )
        self.rotation_angles = rot
        self.n_base = n
        self.num_samples = n * len(rot)
        if verbose and len(rot) > 1:
            print(
                f"Augmented to {self.num_samples} samples with rotations: "
                f"{rot}°"
            )

    @classmethod
    def concat(cls, parts: List["TraceColliderArrays"],
               copies: List[int] | None = None) -> "TraceColliderArrays":
        """Concatenate datasets base-sample-wise (all parts must share the
        same fixed shapes and rotation set). ``copies[i]`` tiles part i —
        the domain-mixing knob for folding a handful of real captures into
        a large synthetic set (the reference's own workflow trains on its
        dataset/train captures; no analog for mixing exists there)."""
        if copies is None:
            copies = [1] * len(parts)
        first = parts[0]
        for p in parts[1:]:
            if p.raw.shape[1:] != first.raw.shape[1:] or \
                    p.boxes.shape[1:] != first.boxes.shape[1:]:
                raise ValueError("concat: mismatched fixed shapes "
                                 f"{p.raw.shape} vs {first.raw.shape}")
            if p.rotation_angles != first.rotation_angles:
                raise ValueError("concat: mismatched rotation sets")

        def tile(arr_name):
            return np.concatenate([
                np.concatenate([getattr(p, arr_name)] * c)
                for p, c in zip(parts, copies)])

        self = cls.__new__(cls)
        self.cfg = first.cfg
        self.augment = first.augment
        self.data_dir = None
        for name in ("raw", "length", "boxes", "labels", "valid"):
            setattr(self, name, tile(name))
        self.names = [n for p, c in zip(parts, copies)
                      for _ in range(c) for n in p.names]
        self.rotation_angles = first.rotation_angles
        self.n_base = self.raw.shape[0]
        self.num_samples = self.n_base * len(self.rotation_angles)
        return self

    def __len__(self) -> int:
        return self.num_samples

    @property
    def max_valid(self) -> int:
        """Largest number of valid GT colliders in any sample. Training
        configs must keep this <= model.num_queries: the fast Hungarian
        matcher silently truncates to the first Q valid columns beyond that
        (ops/hungarian.py caveat)."""
        return int(self.valid.sum(axis=1).max()) if len(self.valid) else 0

    def sample_spec(self, i: int) -> Tuple[int, int]:
        """Map an expanded index to (base_pair_index, rotation_k)."""
        n_rot = len(self.rotation_angles)
        return i // n_rot, self.rotation_angles[i % n_rot] // 90

    def gather(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        """Assemble a batch dict for the given expanded indices (host numpy;
        callers put it on device)."""
        n_rot = len(self.rotation_angles)
        base = indices // n_rot
        rot_k = np.asarray(
            [self.rotation_angles[j % n_rot] // 90 for j in indices],
            dtype=np.int32,
        )
        return {
            "raw": self.raw[base],
            "length": self.length[base],
            "boxes": self.boxes[base],
            "labels": self.labels[base],
            "valid": self.valid[base],
            "rotation_k": rot_k,
            "weight": np.ones((len(indices),), dtype=np.float32),
        }

    def epoch_batches(
        self, batch_size: int, seed: int = 0, shuffle: bool = True
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yield fixed-shape batches covering the epoch once.

        The final partial batch is padded by repeating index 0 with
        ``weight = 0`` so every step compiles to the same shape (the
        reference instead pads traces to the per-batch max length and
        recompiles nothing because it is eager — dataloader.py:510-559).
        """
        rng = np.random.default_rng(seed)
        order = (
            rng.permutation(self.num_samples)
            if shuffle
            else np.arange(self.num_samples)
        )
        for lo in range(0, self.num_samples, batch_size):
            chunk = order[lo: lo + batch_size]
            pad = batch_size - len(chunk)
            idx = np.concatenate([chunk, np.zeros((pad,), dtype=chunk.dtype)])
            batch = self.gather(idx)
            if pad:
                batch["weight"][-pad:] = 0.0
            yield batch

    def num_batches(self, batch_size: int) -> int:
        return -(-self.num_samples // batch_size)

    def device_arrays(self) -> Dict[str, np.ndarray]:
        """The full base dataset as one dict (callers jnp.asarray/device_put
        it once; epochs then only ship tiny index plans)."""
        return {
            "raw": self.raw,
            "length": self.length,
            "boxes": self.boxes,
            "labels": self.labels,
            "valid": self.valid,
        }

    def epoch_plan(self, batch_size: int, seed: int = 0,
                   shuffle: bool = True) -> Dict[str, np.ndarray]:
        """Index plan for a whole epoch: base_idx / rotation_k / weight,
        each ``[n_batches, batch_size]`` (the device-resident epoch loop's
        only per-epoch input)."""
        rng = np.random.default_rng(seed)
        order = (rng.permutation(self.num_samples) if shuffle
                 else np.arange(self.num_samples))
        nb = self.num_batches(batch_size)
        pad = nb * batch_size - len(order)
        idx = np.concatenate([order, np.zeros(pad, dtype=order.dtype)])
        weight = np.ones(len(idx), np.float32)
        if pad:
            weight[-pad:] = 0.0
        n_rot = len(self.rotation_angles)
        base = (idx // n_rot).astype(np.int32)
        rot_k = np.asarray(
            [self.rotation_angles[j % n_rot] // 90 for j in idx],
            dtype=np.int32)
        return {
            "base_idx": base.reshape(nb, batch_size),
            "rotation_k": rot_k.reshape(nb, batch_size),
            "weight": weight.reshape(nb, batch_size),
        }


def print_dataset_statistics(data_dir: str, cfg: DataConfig | None = None,
                             augment_rotation: bool = True) -> None:
    """Analog of the reference's dataset report
    (ref: src/benchmark/dataloader.py:626-686)."""
    cfg = cfg or DataConfig()
    ds = TraceColliderArrays(data_dir, cfg, augment=augment_rotation)
    print("=" * 50)
    print("Dataset Statistics")
    print("=" * 50)
    print(f"Base samples: {ds.n_base}")
    print(f"Total samples (with rotation expansion): {len(ds)}")
    print(f"Rotations: {ds.rotation_angles}°")
    lengths = ds.length
    print(f"\nTrace lengths (after window cap {cfg.max_trace_len}):")
    print(f"  Min: {lengths.min()}  Max: {lengths.max()}  "
          f"Avg: {lengths.mean():.1f}")
    counts = ds.valid.sum(axis=1)
    print(f"\nColliders per sample: min {counts.min()} max {counts.max()} "
          f"avg {counts.mean():.1f}")
    from room_slam_tpu.config import BENCH_ID_TO_LABEL

    flat = ds.labels[ds.valid]
    print("\nLabel distribution (base samples):")
    for lid, name in BENCH_ID_TO_LABEL.items():
        print(f"  {name}: {(flat == lid).sum()}")
    print("=" * 50)


if __name__ == "__main__":
    # dataset smoke report, like the reference dataloader's __main__
    # (ref: src/benchmark/dataloader.py:689-765)
    import sys

    data_dir = sys.argv[1] if len(sys.argv) > 1 else "dataset/train"
    print("=== WITH rotation expansion ===")
    print_dataset_statistics(data_dir, augment_rotation=True)
    print("=== WITHOUT rotation expansion ===")
    print_dataset_statistics(data_dir, augment_rotation=False)
