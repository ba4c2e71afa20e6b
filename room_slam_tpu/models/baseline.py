"""Rule-based occupancy-heatmap baseline (legacy surface).

The reference README documents a rule-based baseline that predicts objects
from an occupancy heatmap of the movement trace (README.md:15, 34, 132); the
file it names (src/models/baseline.py) is absent from the snapshot, so this
implements the documented idea:

1. histogram the 2D trace onto a grid (device: one scatter-add),
2. GROUND = visited cells; candidate objects = unvisited cells inside the
   visited hull,
3. connected components of candidate cells -> axis-aligned boxes,
4. class heuristic: components touching the room border -> BLOCK (walls);
   interior components next to high-dwell cells -> LOW (people sit there);
   other interior components -> MID.

Steps 1-2 are jax; component labeling is a small host pass (eval-only code).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from room_slam_tpu.config import LEGACY_LABELS

LEGACY_ID = LEGACY_LABELS  # GROUND=0, LOW=1, MID=2, BLOCK=3


def occupancy_histogram(
    xy: jnp.ndarray,          # [N, 2]
    dwell: jnp.ndarray,       # [N] time spent at each point (dt)
    origin: jnp.ndarray,      # [2]
    cell: float,
    grid: int,
) -> jnp.ndarray:
    """Dwell-time-weighted occupancy grid [grid, grid] — one scatter-add."""
    ij = jnp.clip(((xy - origin) / cell).astype(jnp.int32), 0, grid - 1)
    flat = ij[:, 0] * grid + ij[:, 1]
    hist = jnp.zeros((grid * grid,), dtype=jnp.float32)
    hist = hist.at[flat].add(dwell)
    return hist.reshape(grid, grid)


def _connected_components(mask: np.ndarray) -> np.ndarray:
    """4-connected component labeling; scipy if present, else BFS."""
    try:
        from scipy import ndimage

        labels, _ = ndimage.label(mask)
        return labels
    except Exception:  # noqa: BLE001 - tiny fallback
        labels = np.zeros(mask.shape, dtype=np.int32)
        cur = 0
        for i in range(mask.shape[0]):
            for j in range(mask.shape[1]):
                if mask[i, j] and labels[i, j] == 0:
                    cur += 1
                    stack = [(i, j)]
                    labels[i, j] = cur
                    while stack:
                        a, b = stack.pop()
                        for da, db in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                            na, nb = a + da, b + db
                            if (0 <= na < mask.shape[0]
                                    and 0 <= nb < mask.shape[1]
                                    and mask[na, nb]
                                    and labels[na, nb] == 0):
                                labels[na, nb] = cur
                                stack.append((na, nb))
        return labels


class OccupancyBaseline:
    """Rule-based predictor: trace [N, 3] of (t, x, y) -> legacy objects."""

    def __init__(self, cell: float = 0.25, grid: int = 64,
                 min_cells: int = 2, max_objects: int = 10):
        self.cell = cell
        self.grid = grid
        self.min_cells = min_cells
        self.max_objects = max_objects

    def predict(self, trace_txy: np.ndarray) -> List[Dict]:
        t = trace_txy[:, 0]
        xy = trace_txy[:, 1:3].astype(np.float32)
        dt = np.diff(t, prepend=t[0]).astype(np.float32)
        dt = np.clip(dt, 0.0, 1.0)

        lo = xy.min(axis=0) - self.cell
        span = (xy.max(axis=0) - lo) + self.cell
        cell = max(float(span.max()) / self.grid, self.cell)

        hist = np.asarray(occupancy_histogram(
            jnp.asarray(xy), jnp.asarray(dt), jnp.asarray(lo), cell,
            self.grid))

        visited = hist > 0
        # room interior = bounding box of visited cells
        vi, vj = np.where(visited)
        if len(vi) == 0:
            return []
        i0, i1 = vi.min(), vi.max()
        j0, j1 = vj.min(), vj.max()
        interior = np.zeros_like(visited)
        interior[i0:i1 + 1, j0:j1 + 1] = True
        candidates = interior & ~visited

        labels = _connected_components(candidates)
        high_dwell = hist > np.percentile(hist[visited], 75)

        objects: List[Dict] = []
        for comp in range(1, labels.max() + 1):
            ci, cj = np.where(labels == comp)
            if len(ci) < self.min_cells:
                continue
            # grid-cell bounds -> world box
            x_min = lo[0] + ci.min() * cell
            x_max = lo[0] + (ci.max() + 1) * cell
            y_min = lo[1] + cj.min() * cell
            y_max = lo[1] + (cj.max() + 1) * cell

            touches_border = (
                ci.min() <= i0 or ci.max() >= i1
                or cj.min() <= j0 or cj.max() >= j1
            )
            if touches_border:
                cls = LEGACY_ID["BLOCK"]
            else:
                # does a neighboring cell have high dwell (someone lingers)?
                dil = np.zeros_like(candidates)
                dil[np.clip(ci + 1, 0, self.grid - 1), cj] = True
                dil[np.clip(ci - 1, 0, self.grid - 1), cj] = True
                dil[ci, np.clip(cj + 1, 0, self.grid - 1)] = True
                dil[ci, np.clip(cj - 1, 0, self.grid - 1)] = True
                cls = (LEGACY_ID["LOW"] if (dil & high_dwell).any()
                       else LEGACY_ID["MID"])

            objects.append({
                "class_id": int(cls),
                "class_name": [k for k, v in LEGACY_ID.items()
                               if v == cls][0],
                "position": [float((x_min + x_max) / 2),
                             float((y_min + y_max) / 2)],
                "size": [float(x_max - x_min), float(y_max - y_min)],
                "orientation": 0.0,
                "confidence": float(min(1.0, len(ci) / 20.0)),
            })

        objects.sort(key=lambda o: -o["confidence"])
        return objects[: self.max_objects]
