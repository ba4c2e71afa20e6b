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

from room_slam_tpu.config import (  # noqa: F401
    DataConfig,
    ModelConfig,
    TrainConfig,
    ExperimentConfig,
)
