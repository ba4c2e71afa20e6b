"""Host-side I/O: JSON / CSV parsing and serialization.

Covers every on-disk format of the reference:

- trace JSON: list of ``{"timestamp","x","y","z"}`` rows, or a dict with a
  ``traces`` / ``trajectory`` key (ref: src/benchmark/inference.py:213).
- collider JSON: ``{"colliders": [{"type","label","center","size","radius",
  "height"}, ...]}`` (ref: dataset/train/colliders.json, inference.py:172-197).
- legacy CSV traces: ``timestamp, x, y`` rows (ref: README.md:84-91).
- legacy prediction JSON: ``{"objects": [...]}`` (ref: README.md:93-108).

Parsing lands in numpy; everything downstream is fixed-shape device code.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from room_slam_tpu.config import BENCH_ID_TO_LABEL, BENCH_LABELS

# Native fast-path JSON trace parser (C++ via ctypes); optional.
try:  # pragma: no cover - exercised when the native lib is built
    from room_slam_tpu.native import trace_parser as _native_parser
except Exception:  # noqa: BLE001
    _native_parser = None


def parse_trace_records(data) -> np.ndarray:
    """Convert a parsed JSON object to an ``[N, 4]`` float32 array of
    ``(x, y, z, t)``, tolerant to the same container shapes as the reference
    (list, or dict with 'traces'/'trajectory')."""
    if isinstance(data, dict):
        data = data.get("traces", data.get("trajectory", []))
    if not isinstance(data, list) or len(data) == 0:
        return np.zeros((0, 4), dtype=np.float32)
    arr = np.empty((len(data), 4), dtype=np.float32)
    for i, p in enumerate(data):
        arr[i, 0] = p.get("x", 0.0)
        arr[i, 1] = p.get("y", 0.0)
        arr[i, 2] = p.get("z", 0.0)
        arr[i, 3] = p.get("timestamp", 0.0)
    return arr


def load_trace_json(path: str | Path) -> np.ndarray:
    """Load a trace JSON file to ``[N, 4]`` (x, y, z, t) float32."""
    path = Path(path)
    if _native_parser is not None:
        arr = _native_parser.parse_trace_file(str(path))
        if arr is not None:
            return arr
    with open(path, "r") as f:
        return parse_trace_records(json.load(f))


def parse_collider_records(
    colliders: Sequence[Dict],
    label_to_id: Dict[str, int] = BENCH_LABELS,
) -> Tuple[np.ndarray, np.ndarray]:
    """Convert collider dicts to ``boxes [M, 6]`` (cx,cy,cz,sx,sy,sz) float32
    and ``labels [M]`` int32 (ref: src/benchmark/dataloader.py:459-507)."""
    m = len(colliders)
    boxes = np.zeros((m, 6), dtype=np.float32)
    labels = np.zeros((m,), dtype=np.int32)
    for i, col in enumerate(colliders):
        c = col.get("center", {})
        s = col.get("size", {})
        boxes[i] = [
            c.get("x", 0.0), c.get("y", 0.0), c.get("z", 0.0),
            s.get("x", 0.0), s.get("y", 0.0), s.get("z", 0.0),
        ]
        labels[i] = label_to_id.get(col.get("label", "BLOCK"), 0)
    return boxes, labels


def load_colliders_json(path: str | Path) -> Tuple[np.ndarray, np.ndarray]:
    """Load a collider JSON file; accepts ``{"colliders": [...]}`` or a bare
    list (ref: src/benchmark/visualize.py:155-160)."""
    with open(path, "r") as f:
        data = json.load(f)
    cols = data.get("colliders", []) if isinstance(data, dict) else data
    return parse_collider_records(cols)


def collider_to_dict(
    box: np.ndarray,
    label_id: int,
    confidence: Optional[float] = None,
) -> Dict:
    """Format one box as the reference's collider JSON dict
    (ref: src/benchmark/inference.py:179-195)."""
    d: Dict = {
        "type": "BoxCollider",
        "label": BENCH_ID_TO_LABEL[int(label_id)],
    }
    if confidence is not None:
        d["confidence"] = float(confidence)
    d["center"] = {"x": float(box[0]), "y": float(box[1]), "z": float(box[2])}
    d["size"] = {"x": float(box[3]), "y": float(box[4]), "z": float(box[5])}
    d["radius"] = 0.0
    d["height"] = 0.0
    return d


def save_predictions_json(
    path: str | Path,
    predictions: List[Dict],
    confidence_threshold: float,
    nms_threshold: float,
) -> None:
    """Write the inference output JSON (ref: src/benchmark/inference.py:314-325)."""
    out = {
        "colliders": predictions,
        "metadata": {
            "num_colliders": len(predictions),
            "confidence_threshold": confidence_threshold,
            "nms_threshold": nms_threshold,
        },
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


def save_trace_json(path: str | Path, arr: np.ndarray) -> None:
    """Write an ``[N, 4]`` (x, y, z, t) array as the trace JSON row format
    the Unity collector produces (ref: collector/Assets/src/RandomMovement.cs:236-264)."""
    rows = [
        {
            "timestamp": float(t),
            "x": float(x),
            "y": float(y),
            "z": float(z),
        }
        for x, y, z, t in arr
    ]
    with open(path, "w") as f:
        json.dump(rows, f)


def save_colliders_json(
    path: str | Path, boxes: np.ndarray, labels: np.ndarray
) -> None:
    """Write ``{"colliders": [...]}`` ground-truth format."""
    cols = [collider_to_dict(b, l) for b, l in zip(boxes, labels)]
    with open(path, "w") as f:
        json.dump({"colliders": cols}, f, indent=2)


# ---------------------------------------------------------------------------
# Legacy CSV surface (ref: README.md:84-91)
# ---------------------------------------------------------------------------


def load_trace_csv(path: str | Path) -> np.ndarray:
    """Load a legacy CSV trace (``timestamp, x, y`` rows, no header required)
    to ``[N, 3]`` float32 of (t, x, y)."""
    rows = []
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split(",")
            try:
                rows.append([float(p) for p in parts[:3]])
            except ValueError:
                continue  # header or malformed line
    if not rows:
        return np.zeros((0, 3), dtype=np.float32)
    return np.asarray(rows, dtype=np.float32)


def save_trace_csv(path: str | Path, arr: np.ndarray) -> None:
    """Write ``[N, 3]`` (t, x, y) as the legacy CSV format."""
    with open(path, "w") as f:
        for t, x, y in arr:
            f.write(f"{t}, {x}, {y}\n")


def save_objects_json(path: str | Path, objects: List[Dict]) -> None:
    """Write the legacy prediction JSON ``{"objects": [...]}``
    (ref: README.md:93-108)."""
    with open(path, "w") as f:
        json.dump({"objects": objects}, f, indent=2)


# ---------------------------------------------------------------------------
# Directory pairing — the three naming patterns of the reference
# (ref: src/benchmark/dataloader.py:97-150)
# ---------------------------------------------------------------------------


def find_data_pairs(data_dir: str | Path) -> List[Tuple[Path, Path]]:
    """Return (trace_file, collider_file) pairs.

    Pattern 1: ``*_trace.json`` + ``*_collider.json``
    Patterns 2+3: ``agent_data_*.json`` / ``human_data_*.json`` + shared
    ``colliders.json``.
    """
    data_dir = Path(data_dir)
    pairs: List[Tuple[Path, Path]] = []

    for trace_file in sorted(data_dir.glob("*_trace.json")):
        base = trace_file.stem.replace("_trace", "")
        collider_file = data_dir / f"{base}_collider.json"
        if collider_file.exists():
            pairs.append((trace_file, collider_file))

    if not pairs:
        shared = data_dir / "colliders.json"
        if shared.exists():
            trace_files = sorted(data_dir.glob("agent_data_*.json")) + sorted(
                data_dir.glob("human_data_*.json")
            )
            pairs = [(t, shared) for t in trace_files]

    return pairs


def sort_by_time(arr: np.ndarray, time_col: int = 3) -> np.ndarray:
    """Stable sort rows by timestamp (ref: dataloader.py:433-435)."""
    if arr.shape[0] == 0:
        return arr
    order = np.argsort(arr[:, time_col], kind="stable")
    return arr[order]


def linspace_downsample(arr: np.ndarray, max_len: int) -> np.ndarray:
    """Uniform index downsampling (ref: dataloader.py:453-456)."""
    if arr.shape[0] <= max_len:
        return arr
    idx = np.linspace(0, arr.shape[0] - 1, max_len, dtype=int)
    return arr[idx]
