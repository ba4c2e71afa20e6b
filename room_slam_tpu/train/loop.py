"""Jitted training / evaluation steps and the epoch driver.

The reference's hot loop re-parses JSON, augments in Python, pads per batch,
syncs to CPU for Hungarian matching, and steps AdamW eagerly
(ref: src/benchmark/train.py:190-232 + SURVEY.md 3.1 hot-spot notes).
Here one fixed-shape XLA program does augment -> featurize -> forward ->
match -> loss -> grad -> clip -> AdamW per step; batches shard over the
'data' mesh axis and parameters are replicated (SURVEY.md 2.3).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from room_slam_tpu.config import ExperimentConfig
from room_slam_tpu.data.augment import Sample, make_augment_batch
from room_slam_tpu.data.features import featurize
from room_slam_tpu.ops.losses import set_criterion


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg: ExperimentConfig) -> optax.GradientTransformation:
    """clip(1.0) -> AdamW, with the learning rate injected as a mutable
    hyperparameter so the plateau scheduler can drive it per epoch
    (ref: train.py:440-458)."""

    def opt(learning_rate):
        return optax.chain(
            optax.clip_by_global_norm(cfg.train.grad_clip),
            optax.adamw(learning_rate, weight_decay=cfg.train.weight_decay),
        )

    return optax.inject_hyperparams(opt)(learning_rate=cfg.train.lr)


def set_learning_rate(opt_state, lr: float):
    """Mutate the injected learning rate."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(
        lr, dtype=jnp.float32)
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


class PlateauScheduler:
    """Host-side ReduceLROnPlateau with torch semantics: mode=min,
    relative threshold, cooldown, min_lr (ref: train.py:454-458)."""

    def __init__(self, lr: float, factor: float = 0.5, patience: int = 5,
                 threshold: float = 1e-3, cooldown: int = 1,
                 min_lr: float = 1e-6):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.cooldown = cooldown
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad = 0
        self.cooldown_counter = 0

    def step(self, value: float) -> float:
        if value < self.best * (1.0 - self.threshold):
            self.best = value
            self.num_bad = 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad = 0
        return self.lr


def batch_to_sample(batch: Dict[str, jnp.ndarray]) -> Sample:
    return Sample(
        raw=batch["raw"],
        length=batch["length"],
        boxes=batch["boxes"],
        labels=batch["labels"],
        valid=batch["valid"],
    )


def make_train_step(
    model, tx: optax.GradientTransformation, cfg: ExperimentConfig,
    augment: bool = True,
) -> Callable:
    """Build the donated, jitted train step: (state, batch, key) ->
    (state, losses)."""
    aug_fn = make_augment_batch(cfg.data) if augment else None
    lw = {
        "class_loss": cfg.train.loss_weights[0],
        "l1_loss": cfg.train.loss_weights[1],
        "giou_loss": cfg.train.loss_weights[2],
    }

    def step(state: TrainState, batch: Dict[str, jnp.ndarray],
             key: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        akey, dkey = jax.random.split(key)
        sample = batch_to_sample(batch)
        if aug_fn is not None:
            sample = aug_fn(akey, sample, batch["rotation_k"])
        feats, mask = featurize(sample.raw, sample.length)
        targets = {
            "boxes": sample.boxes,
            "labels": sample.labels,
            "valid_mask": sample.valid,
        }

        def loss_fn(params):
            out = model.apply(
                params, feats, mask, deterministic=False,
                rngs={"dropout": dkey})
            losses = set_criterion(out, targets, batch["weight"], lw)
            return losses["total_loss"], losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), losses

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(model, cfg: ExperimentConfig) -> Callable:
    """Validation loss step (no augmentation, deterministic forward) —
    analog of validate() (ref: train.py:330-353). Returns weighted-sum loss
    pieces so the driver can average over batches."""
    lw = {
        "class_loss": cfg.train.loss_weights[0],
        "l1_loss": cfg.train.loss_weights[1],
        "giou_loss": cfg.train.loss_weights[2],
    }

    @jax.jit
    def step(params, batch):
        feats, mask = featurize(batch["raw"], batch["length"])
        out = model.apply(params, feats, mask, deterministic=True)
        targets = {
            "boxes": batch["boxes"],
            "labels": batch["labels"],
            "valid_mask": batch["valid"],
        }
        losses = set_criterion(out, targets, batch["weight"], lw)
        return losses, out

    return step


def make_forward(model) -> Callable:
    """Plain jitted deterministic forward: (params, feats, mask) -> outputs."""

    @jax.jit
    def fwd(params, feats, mask):
        return model.apply(params, feats, mask, deterministic=True)

    return fwd
