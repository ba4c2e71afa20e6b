"""room_slam_tpu: a TPU-native (JAX/XLA/Pallas) framework for semantic room-layout
inference from movement traces.

Re-designed from scratch for TPU hardware with the capabilities of the
Ex10si0n/room-slam reference (see SURVEY.md):

- device-resident data pipeline: featurization + augmentation run inside ``jit``
  (reference: per-item ``json.load`` + Python-loop augmentation,
  ``src/benchmark/dataloader.py``)
- DETR-style set-prediction models (BiLSTM / Transformer encoders + learnable-query
  decoders) in Flax (reference: ``src/benchmark/model.py``)
- jit-compatible exact Hungarian matching (reference syncs to CPU scipy per batch
  item, ``src/benchmark/train.py:56-57``)
- fused CE + L1 + GIoU set loss, vectorized Hungarian-aligned evaluation
- fixed-shape masked 3D NMS inference emitting collider JSON
- on-device synthetic room + random-walk trace generation (replaces the Unity
  collector, ``collector/Assets/src/RandomMovement.cs``)
- legacy GRU surface: CSV 2D traces, multi-head MLP decoder, occupancy-heatmap
  baseline, rotated-box IoU / mAP evaluation (reference top-level ``README.md``)
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: first compiles through the remote TPU
# tunnel cost minutes; caching them on disk makes every later process start
# warm. Opt out with ROOM_SLAM_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("ROOM_SLAM_TPU_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        _cache = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser("~/.cache/room_slam_tpu/xla"))
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - cache is an optimization only
        pass

from room_slam_tpu.config import (  # noqa: F401
    DataConfig,
    ModelConfig,
    TrainConfig,
    ExperimentConfig,
)
