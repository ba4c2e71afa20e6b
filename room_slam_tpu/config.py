"""Configuration dataclasses for room_slam_tpu.

One serializable config tree with CLI overrides replaces the reference's
hard-coded dict (``src/benchmark/train.py:366-380``) and scattered argparse
defaults (``src/benchmark/inference.py:278-289``).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Tuple

# Class labels of the benchmark (3D JSON) surface.
# Reference: src/benchmark/dataloader.py:67-72
BENCH_LABELS: Dict[str, int] = {"BLOCK": 0, "LOW": 1, "MID": 2, "HIGH": 3}
BENCH_ID_TO_LABEL: Dict[int, str] = {v: k for k, v in BENCH_LABELS.items()}
NUM_BENCH_CLASSES = 4

# Class labels of the legacy (CSV 2D) surface.
# Reference: README.md:18-23
LEGACY_LABELS: Dict[str, int] = {"GROUND": 0, "LOW": 1, "MID": 2, "BLOCK": 3}
LEGACY_ID_TO_LABEL: Dict[int, str] = {v: k for k, v in LEGACY_LABELS.items()}
NUM_LEGACY_CLASSES = 4


@dataclass
class DataConfig:
    """Dataset + augmentation settings.

    Mirrors the reference dataloader kwargs (src/benchmark/dataloader.py:24-37)
    but everything stochastic is a pure function of a PRNG key on device.
    """

    data_dir: str = "dataset/train"
    val_dir: str = "dataset/val"
    max_trace_len: int = 3000   # fixed window length L (ref: dataloader.py:27)
    max_colliders: int = 50     # fixed object slots M (ref: dataloader.py:28)

    augment_rotation: bool = True
    augment_translation: bool = True
    augment_scale: bool = True
    augment_collider_dropout: bool = True
    rotation_angles: Tuple[int, ...] = (0, 90, 180, 270)
    scale_range: Tuple[float, float] = (0.8, 1.2)
    translation_range: float = 1.0
    collider_dropout_prob: float = 0.2

    # extra stochastic augmentations (ref: dataloader.py:357-392)
    reverse_prob: float = 0.5        # inert in the reference: see augment.py
    noise_prob: float = 0.8
    noise_sigma: Tuple[float, float, float] = (0.02, 0.01, 0.02)
    crop_prob: float = 0.5
    time_warp_prob: float = 0.5
    dropout_gate_prob: float = 0.5


@dataclass
class ModelConfig:
    """Model architecture. Defaults follow the reference training config
    (src/benchmark/train.py:366-380), not build_model's larger defaults."""

    model_type: str = "lstm"    # 'lstm' | 'transformer' | 'gru' (legacy)
    d_model: int = 128
    num_queries: int = 30
    nhead: int = 4
    enc_layers: int = 3
    dec_layers: int = 3
    dim_feedforward: int = 512
    dropout: float = 0.1
    lstm_layers: int = 2
    input_dim: int = 11
    num_classes: int = NUM_BENCH_CLASSES
    # Mixed precision: "bfloat16" streams every [B, N, D]-sized activation
    # (encoder projections, recurrence gate streams, decoder k/v memory)
    # in bf16 on the MXU's native path — halving the HBM traffic that
    # bounds the long-sequence configs. Params, recurrence carries, the
    # attention softmax, reductions, output heads, and the loss all stay
    # float32 (models/{lstm,gru}.py, ops/rnn_pallas.py).
    compute_dtype: str = "float32"
    # use the Pallas fused recurrence kernel when on TPU
    use_pallas_rnn: bool = True
    # add a sigmoid no-object head trained on the Hungarian match indicator.
    # Off (the default) reproduces the reference architecture exactly; on, it
    # fixes ranked-AP collapse from saturated softmax confidences (the
    # reference ranks by max softmax over 4 real classes,
    # src/benchmark/inference.py:138-143, which cannot separate matched from
    # hallucinated queries). See models/lstm.py SimpleQueryDecoder.
    objectness: bool = False
    # translation-invariant mode: center trace XZ at the model boundary and
    # un-center predicted boxes (models/common.center_traces_xz). The
    # encoder otherwise consumes absolute coordinates and memorizes that
    # synthetic rooms are origin-centered — on real ARKit captures (session
    # origin wherever tracking started) predictions land displaced by the
    # room's world offset. Off by default = reference behavior.
    center_xz: bool = False
    # iterative contact-evidence box refinement stages (0 = reference
    # decoder exactly). Each stage pools trace points around the current
    # box estimate (dwell density, mean approach offset, local memory) and
    # emits bounded center/size corrections — the localization evidence a
    # single global-attention readout blurs away for small furniture. See
    # models/common.ContactRefineStage.
    refine_stages: int = 0
    # Condition every refine stage on the trace's XZ extent planes: each
    # query sees the signed gaps between its current box faces and the
    # four planes bounding the visited free space (in normalized units —
    # translation/scale-equivariant). The extent pins boundary walls
    # model-free (tools/ceiling.py), but a FIXED post-hoc snap prior
    # cannot express per-side clearance ("touched east, 0.7 m off west" —
    # PARITY.md round 3 measured four post-processing dead ends); this
    # lets the refinement stages LEARN it. No-op without refine_stages.
    extent_features: bool = False
    # Append K interior-hole tokens to the decoder memory (LSTM model):
    # the walk raster's interior unvisited components (ops/refine.
    # hole_components — the measured 4x furniture enrichment signal)
    # enter the model as attendable tokens with their centroid as the
    # token coordinate, so a query's anchor can land ON a hole and read
    # "unvisited interior region of footprint s_x x s_z" directly —
    # candidate generation where trace tokens carry no evidence (the
    # round-4 diagnosis: 34/56 zero-shot furniture GT draw no candidate).
    # 0 = off (reference behavior, byte-identical).
    hole_tokens: int = 0
    # Switch-routed Mixture-of-Experts FFN in the transformer encoder
    # (models/common.MoEFFN): top-1 routing, static shapes, expert weights
    # sharded over the mesh 'model' axis (expert parallelism). 0 = the
    # reference's dense FFN exactly. Transformer only.
    moe_experts: int = 0


@dataclass
class TrainConfig:
    """Optimization settings (ref: src/benchmark/train.py:366-380,433-458)."""

    batch_size: int = 20
    num_epochs: int = 200
    lr: float = 2e-4
    weight_decay: float = 1e-4
    warmup_epochs: int = 10
    val_every: int = 1
    iou_thresh: float = 0.5
    grad_clip: float = 1.0
    # microbatches per optimizer step: the batch splits into this many
    # equal slices whose gradients accumulate (lax.scan) before ONE
    # update — effective batch sizes past the HBM wall (the seq=5000
    # scale-up config OOMs at batch 256 resident; accum 2 x 128 trains
    # the same effective batch). batch_size must divide evenly.
    grad_accum: int = 1
    # Polyak/EMA averaging of parameters (0 = off). When > 0, a running
    # exponential average of the post-update parameters (decay ~0.999)
    # is tracked on device and used for validation and the best_model
    # checkpoint; the raw online weights keep training and land in
    # final_model / periodic checkpoints.
    ema_decay: float = 0.0
    # PRNG implementation for the per-step stochasticity (augmentation
    # noise + dropout masks). "threefry2x32" (JAX's default, and ours) is
    # deterministic across backends, so a seeded run reproduces anywhere.
    # "rbg" (XLA RngBitGenerator) is ~13-23% faster per step at the
    # benchmark shapes (threefry's VPU cost over [B, N, D]-sized masks is
    # real) but deterministic only per backend; the performance configs
    # (bench.py, configs/flagship_v15.json) opt into it explicitly.
    # Dataset generation and param init stay threefry regardless, so the
    # DATA of a seeded run is identical under either choice.
    rng_impl: str = "threefry2x32"
    seed: int = 0
    save_dir: str = "./checkpoints"
    # class_loss / l1_loss / giou_loss weights (ref: train.py:433-437)
    loss_weights: Tuple[float, float, float] = (2.0, 5.0, 2.0)
    # auxiliary XZ-footprint GIoU weight (0.0 = reference loss exactly;
    # furniture box error is footprint-dominated, see ops/iou.iou_giou_2d_xz)
    footprint_weight: float = 0.0
    # BCE weight for the no-object head; only active when model.objectness
    # adds the head (the loss keys off the model's pred_objectness output)
    objectness_weight: float = 1.0
    # IoU-aware objectness: matched slots' BCE target is the pair's 3D IoU
    # (soft) instead of 1.0, so the learned score ranks by localization
    # quality — what AP actually orders by
    objectness_iou: bool = False
    # scale-relative |log(pred_size/gt_size)| weight (0.0 = reference loss
    # exactly); absolute L1 under-penalizes small-furniture size errors
    size_log_weight: float = 0.0
    # candidate-coverage weight (round-5): pull the nearest UNMATCHED query
    # toward every GT box so each object trains a redundant second
    # candidate (ops/losses.set_criterion coverage_loss). Targets the
    # measured zero-shot frontier — unseen-furniture candidate generation.
    coverage_weight: float = 0.0
    # restrict the coverage pull to furniture GT (labels != BLOCK) — the
    # measured blind set is furniture (34/56 vs 4/21 walls)
    coverage_furniture_only: bool = False
    # weight of the switch-MoE load-balance auxiliary loss when
    # model.moe_experts > 0 (Switch Transformer's alpha, arXiv:2101.03961
    # uses 0.01); the trainer collects the per-layer sowed terms via
    # mutable=['losses'] and adds moe_aux_weight * mean-over-layers
    moe_aux_weight: float = 0.01
    # weight of the auxiliary per-stage box losses when model.refine_stages
    # > 0: each intermediate box gets the same L1+GIoU supervision as the
    # final one (shared Hungarian assignment), scaled by this factor —
    # DETR-style deep supervision keeps early stages honest
    aux_weight: float = 0.5
    # LR schedule: 'plateau' (the reference's active ReduceLROnPlateau) or
    # 'cosine' (the warmup+cosine lr_lambda the reference defines but never
    # plugs in, train.py:447-458)
    lr_schedule: str = "plateau"
    # ReduceLROnPlateau equivalents (ref: train.py:454-458)
    plateau_factor: float = 0.5
    plateau_patience: int = 5
    plateau_cooldown: int = 1
    plateau_min_scale: float = 1e-6 / 2e-4  # min_lr / lr
    # steps per epoch for fixed-shape batching; 0 => derived from dataset size
    steps_per_epoch: int = 0
    # jax matmul precision for the train/eval path ('default' | 'bfloat16' |
    # 'highest'); bfloat16 is ~9% faster on v5e with indistinguishable loss
    matmul_precision: str = "bfloat16"


@dataclass
class MeshConfig:
    """Device-mesh / sharding settings (no analog in the reference, which is
    single-device — SURVEY.md section 2.3)."""

    data_axis: str = "data"
    model_axis: str = "model"
    # (n_data, n_model) for a 2-axis ('data', 'model') mesh — (0, 1) means
    # all devices on the data axis — or (n_data, n_seq, n_model) for the
    # 3-axis ('data', 'seq', 'model') mesh (sequence parallelism: the raw
    # trace's L dim shards over 'seq'; parallel/mesh.make_mesh3). Set from
    # the CLI with e.g. --set mesh.mesh_shape=[2,2,2]. Sequence
    # parallelism is for the attention/scan encoders (the transformer
    # variant and the scale-up configs); the fused Pallas recurrence
    # kernel expects the full sequence per device, so use
    # model.use_pallas_rnn=false with a 'seq' axis > 1.
    mesh_shape: Tuple[int, ...] = (0, 1)


@dataclass
class ExperimentConfig:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.to_dict(), indent=2))

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ExperimentConfig":
        def build(tp, sub):
            fields = {f.name: f for f in dataclasses.fields(tp)}
            kwargs = {}
            for k, v in (sub or {}).items():
                if k in fields:
                    # JSON round-trips tuples as lists
                    if isinstance(v, list):
                        v = tuple(v)
                    kwargs[k] = v
            return tp(**kwargs)

        return cls(
            data=build(DataConfig, d.get("data")),
            model=build(ModelConfig, d.get("model")),
            train=build(TrainConfig, d.get("train")),
            mesh=build(MeshConfig, d.get("mesh")),
        )

    @classmethod
    def from_json(cls, path: str | Path) -> "ExperimentConfig":
        return cls.from_dict(json.loads(Path(path).read_text()))

    def apply_overrides(self, overrides: List[str]) -> "ExperimentConfig":
        """Apply 'section.key=value' CLI overrides in place."""
        for ov in overrides:
            key, _, raw = ov.partition("=")
            section, _, name = key.partition(".")
            target = getattr(self, section)
            old = getattr(target, name)  # raises if unknown
            if isinstance(old, bool):
                val: Any = raw.lower() in ("1", "true", "yes")
            elif isinstance(old, int):
                val = int(raw)
            elif isinstance(old, float):
                val = float(raw)
            elif isinstance(old, tuple):
                val = tuple(json.loads(raw))
            else:
                val = raw
            setattr(target, name, val)
        return self
