"""Jitted training / evaluation steps and the epoch driver.

The reference's hot loop re-parses JSON, augments in Python, pads per batch,
syncs to CPU for Hungarian matching, and steps AdamW eagerly
(ref: src/benchmark/train.py:190-232 + SURVEY.md 3.1 hot-spot notes).
Here one fixed-shape XLA program does augment -> featurize -> forward ->
match -> loss -> grad -> clip -> AdamW per step; batches shard over the
'data' mesh axis and parameters are replicated (SURVEY.md 2.3).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from room_slam_tpu.config import ExperimentConfig
from room_slam_tpu.data.augment import Sample, make_augment_batch
from room_slam_tpu.data.features import featurize
from room_slam_tpu.ops.losses import set_criterion


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class EMAState(NamedTuple):
    """optax state slot holding the Polyak average of the parameters."""
    ema: Any


def _params_ema(decay: float) -> optax.GradientTransformation:
    """Pass-through transform, placed LAST in the chain (after AdamW), that
    tracks an exponential moving average of the post-update parameters in
    its own state. Living inside opt_state means checkpointing, buffer
    donation, and the fused multi-epoch scan all carry the average with no
    TrainState or driver changes."""

    def init_fn(params):
        # jnp.copy, not asarray: the EMA must NOT alias params — both are
        # donated to the train step (same-buffer-twice INVALID_ARGUMENT)
        return EMAState(ema=jax.tree_util.tree_map(jnp.copy, params))

    def update_fn(updates, state, params=None):
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p,
            state.ema, new_params)
        return updates, EMAState(ema=ema)

    return optax.GradientTransformation(init_fn, update_fn)


def _find_ema(obj):
    if isinstance(obj, EMAState):
        return obj.ema
    if isinstance(obj, dict):
        items = obj.values()
    elif isinstance(obj, (tuple, list)):  # includes NamedTuple states
        items = obj
    else:
        return None
    for item in items:
        found = _find_ema(item)
        if found is not None:
            return found
    return None


def eval_params(state: "TrainState"):
    """Parameters to validate with / save as best_model: the Polyak
    average when ``train.ema_decay > 0`` (an EMAState is then present in
    opt_state), else the raw online parameters. Pure structural lookup —
    safe under jit."""
    ema = _find_ema(state.opt_state)
    return state.params if ema is None else ema


def make_optimizer(cfg: ExperimentConfig) -> optax.GradientTransformation:
    """clip(1.0) -> AdamW, with the learning rate injected as a mutable
    hyperparameter so the plateau scheduler can drive it per epoch
    (ref: train.py:440-458). With ``train.ema_decay > 0`` a parameter-EMA
    tracker is appended (see _params_ema)."""

    def opt(learning_rate):
        txs = [
            optax.clip_by_global_norm(cfg.train.grad_clip),
            optax.adamw(learning_rate, weight_decay=cfg.train.weight_decay),
        ]
        if cfg.train.ema_decay > 0:
            txs.append(_params_ema(cfg.train.ema_decay))
        return optax.chain(*txs)

    return optax.inject_hyperparams(opt)(learning_rate=cfg.train.lr)


def warmup_cosine_lr(cfg: ExperimentConfig, epoch: int) -> float:
    """The warmup + cosine schedule the reference defines (but never plugs
    in — train.py:447-458): linear warmup over warmup_epochs, then cosine
    decay to 0 across the remaining epochs. Selected with
    ``train.lr_schedule = 'cosine'``."""
    t = cfg.train
    if epoch < t.warmup_epochs:
        scale = (epoch + 1) / t.warmup_epochs
    else:
        import math

        scale = 0.5 * (1 + math.cos(
            math.pi * (epoch - t.warmup_epochs)
            / max(t.num_epochs - t.warmup_epochs, 1)))
    return t.lr * scale


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
        # torch order (lr_scheduler.ReduceLROnPlateau.step): count the bad
        # epoch first, then — if in cooldown — decrement the counter every
        # step and suppress num_bad, regardless of improvement.
        if value < self.best * (1.0 - self.threshold):
            self.best = value
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        if self.num_bad > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad = 0
        return self.lr

    def state_dict(self) -> Dict[str, float]:
        return {"lr": self.lr, "best": self.best, "num_bad": self.num_bad,
                "cooldown_counter": self.cooldown_counter}

    def load_state_dict(self, state: Dict[str, float]) -> None:
        self.lr = float(state["lr"])
        self.best = float(state["best"])
        self.num_bad = int(state["num_bad"])
        self.cooldown_counter = int(state["cooldown_counter"])


def batch_to_sample(batch: Dict[str, jnp.ndarray]) -> Sample:
    return Sample(
        raw=batch["raw"],
        length=batch["length"],
        boxes=batch["boxes"],
        labels=batch["labels"],
        valid=batch["valid"],
    )


def _loss_weight_dict(cfg: ExperimentConfig) -> Dict[str, float]:
    return {
        "class_loss": cfg.train.loss_weights[0],
        "l1_loss": cfg.train.loss_weights[1],
        "giou_loss": cfg.train.loss_weights[2],
        "footprint_loss": cfg.train.footprint_weight,
        "objectness_loss": cfg.train.objectness_weight,
        "objectness_iou": 1.0 if cfg.train.objectness_iou else 0.0,
        "size_log_loss": cfg.train.size_log_weight,
        "aux_loss": cfg.train.aux_weight,
        "coverage_loss": cfg.train.coverage_weight,
        "coverage_furniture_only":
            1.0 if cfg.train.coverage_furniture_only else 0.0,
    }


def _step_impl(model, tx, cfg: ExperimentConfig, augment: bool):
    """Un-jitted single-step body shared by the per-step and per-epoch APIs."""
    aug_fn = make_augment_batch(cfg.data) if augment else None
    lw = _loss_weight_dict(cfg)
    # switch-MoE load-balance term: only MoE models sow under 'losses'
    # (models/common.MoEFFN); the non-MoE path keeps the plain apply so
    # the flagship's training program is bit-identical
    moe_w = (cfg.train.moe_aux_weight
             if getattr(cfg.model, "moe_experts", 0) else 0.0)

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

        def loss_fn(params, feats, mask, targets, weight, dkey):
            if moe_w:
                out, mut = model.apply(
                    params, feats, mask, deterministic=False,
                    rngs={"dropout": dkey}, mutable=["losses"])
                losses = set_criterion(out, targets, weight, lw)
                # mean over the per-layer sowed terms so the weight is
                # independent of encoder depth
                leaves = jax.tree_util.tree_leaves(mut.get("losses", {}))
                aux = (sum(jnp.sum(v) for v in leaves) / len(leaves)
                       if leaves else jnp.float32(0.0))
                losses["moe_aux"] = aux
                losses["total_loss"] = losses["total_loss"] + moe_w * aux
            else:
                out = model.apply(
                    params, feats, mask, deterministic=False,
                    rngs={"dropout": dkey})
                losses = set_criterion(out, targets, weight, lw)
            return losses["total_loss"], losses

        A = max(1, int(cfg.train.grad_accum))
        if A == 1:
            grads, losses = jax.grad(loss_fn, has_aux=True)(
                state.params, feats, mask, targets, batch["weight"], dkey)
        else:
            # gradient accumulation: scan over A microbatches, ONE update.
            # Only one microbatch's activations are live at a time, so the
            # effective batch can exceed the resident-batch HBM wall.
            # Each microbatch normalizes its own weighted loss mean
            # (standard accumulation semantics; equal to the full-batch
            # gradient when sample weights are uniform).
            B = feats.shape[0]
            if B % A:
                raise ValueError(
                    f"train.grad_accum={A} must divide the per-step batch "
                    f"size {B} (shapes are static under jit)")
            mb = B // A

            def split(x):
                return x.reshape(A, mb, *x.shape[1:])

            mbs = (split(feats), split(mask),
                   jax.tree_util.tree_map(split, targets),
                   split(batch["weight"]),
                   jax.random.split(dkey, A))

            def body(acc, m):
                f, k, t, w, dk = m
                g, l = jax.grad(loss_fn, has_aux=True)(
                    state.params, f, k, t, w, dk)
                return jax.tree_util.tree_map(jnp.add, acc, g), l

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            grads, losses_stack = jax.lax.scan(body, zeros, mbs)
            grads = jax.tree_util.tree_map(lambda g: g / A, grads)
            losses = jax.tree_util.tree_map(
                lambda x: jnp.mean(x, axis=0), losses_stack)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), losses

    return step


def make_train_step(
    model, tx: optax.GradientTransformation, cfg: ExperimentConfig,
    augment: bool = True,
) -> Callable:
    """Build the donated, jitted train step: (state, batch, key) ->
    (state, losses)."""
    return jax.jit(_step_impl(model, tx, cfg, augment), donate_argnums=(0,))


def make_train_steps(
    model, tx: optax.GradientTransformation, cfg: ExperimentConfig,
    augment: bool = True,
) -> Callable:
    """Build a jitted MULTI-step runner: (state, batch, keys[N]) ->
    (state, total_loss[N]) — N train steps on one repeated batch as a
    single ``lax.scan`` dispatch.

    This is the production dispatch granularity (the fused-run driver
    scans whole epochs on device); bench.py times the headline with it so
    the measurement is per-step-round-trip-free — through the remote axon
    tunnel a host-driven step loop pays ~2-10 ms of tunnel latency per
    step (infra-weather dependent), which at the flagship's ~6 ms step
    swings the number 2x while the chip does identical work."""
    step = _step_impl(model, tx, cfg, augment)

    def run(state, batch, keys):
        def body(st, k):
            st, losses = step(st, batch, k)
            return st, losses["total_loss"]
        return jax.lax.scan(body, state, keys)

    return jax.jit(run, donate_argnums=(0,))


def _batch_constrainer(mesh):
    """Shard a gathered batch over the 'data' axis inside jit (no-op
    without a mesh). On a mesh with a 'seq' axis > 1, the raw trace
    [B, L, 4] additionally shards its sequence dim (sequence parallelism
    — mirrors parallel/mesh.shard_batch; featurize's neighbor diffs
    become XLA halo exchanges)."""
    if mesh is None:
        return lambda batch: batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    seq = "seq" in mesh.axis_names and mesh.shape["seq"] > 1

    def constrain(batch):
        out = {}
        for k, v in batch.items():
            spec = (P("data", "seq", None) if seq and k == "raw"
                    else P("data"))
            out[k] = jax.lax.with_sharding_constraint(
                v, NamedSharding(mesh, spec))
        return out

    return constrain


def make_train_epoch(
    model, tx: optax.GradientTransformation, cfg: ExperimentConfig,
    augment: bool = True, mesh=None,
) -> Callable:
    """Whole-epoch device loop: ONE jitted call per epoch.

    The per-step host loop costs several round-trips through the (remote)
    device per batch — dispatch latency plus blocking loss fetches. With the
    dataset resident on device, an epoch is a ``lax.scan`` over shuffled
    index batches that gathers, augments, featurizes, and updates entirely
    on device, returning only the epoch-mean losses (SURVEY.md 2.3: the
    north-star device-resident data path).

    Signature: (state, data, plan, key) -> (state, mean_losses) where
      data: dict of full dataset arrays — raw [P,L,4], length [P],
            boxes [P,M,6], labels [P,M], valid [P,M]
      plan: dict of base_idx/rotation_k/weight, each [n_batches, B]
    """
    step = _step_impl(model, tx, cfg, augment)
    constrain = _batch_constrainer(mesh)

    def epoch(state: TrainState, data: Dict[str, jnp.ndarray],
              plan: Dict[str, jnp.ndarray], key: jax.Array):
        n_batches = plan["base_idx"].shape[0]

        def body(carry, inp):
            st = carry
            idx, rot_k, weight, k = inp
            batch = constrain({
                "raw": data["raw"][idx],
                "length": data["length"][idx],
                "boxes": data["boxes"][idx],
                "labels": data["labels"][idx],
                "valid": data["valid"][idx],
                "rotation_k": rot_k,
                "weight": weight,
            })
            st, losses = step(st, batch, k)
            return st, losses

        keys = jax.random.split(key, n_batches)
        state, losses = jax.lax.scan(
            body, state,
            (plan["base_idx"], plan["rotation_k"], plan["weight"], keys))
        mean_losses = jax.tree_util.tree_map(jnp.mean, losses)
        return state, mean_losses

    return jax.jit(epoch, donate_argnums=(0,))


class SchedState(NamedTuple):
    """Device-side ReduceLROnPlateau state (torch semantics, mirrors
    PlateauScheduler)."""

    lr: jnp.ndarray
    best: jnp.ndarray
    num_bad: jnp.ndarray
    cooldown: jnp.ndarray


def sched_init(cfg: ExperimentConfig) -> SchedState:
    return SchedState(
        lr=jnp.asarray(cfg.train.lr, jnp.float32),
        best=jnp.asarray(jnp.inf, jnp.float32),
        num_bad=jnp.asarray(0, jnp.int32),
        cooldown=jnp.asarray(0, jnp.int32),
    )


def sched_update(s: SchedState, value: jnp.ndarray,
                 cfg: ExperimentConfig) -> SchedState:
    """One plateau step on device (ref: train.py:454-458 semantics)."""
    t = cfg.train
    min_lr = t.lr * t.plateau_min_scale
    improved = value < s.best * (1.0 - 1e-3)
    best = jnp.where(improved, value, s.best)
    num_bad = jnp.where(improved, 0, s.num_bad + 1)
    # torch semantics: while in cooldown, decrement every step and zero
    # num_bad regardless of improvement
    in_cooldown = s.cooldown > 0
    cooldown = jnp.where(in_cooldown, s.cooldown - 1, s.cooldown)
    num_bad = jnp.where(in_cooldown, 0, num_bad)
    decay = num_bad > t.plateau_patience
    lr = jnp.where(decay, jnp.maximum(s.lr * t.plateau_factor, min_lr), s.lr)
    cooldown = jnp.where(decay, t.plateau_cooldown, cooldown)
    num_bad = jnp.where(decay, 0, num_bad)
    return SchedState(lr=lr, best=best, num_bad=num_bad, cooldown=cooldown)


def _set_lr_in_tree(opt_state, lr):
    """Functionally replace the injected learning rate inside jit."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = lr
    return opt_state._replace(hyperparams=hp)


def make_fused_run(model, tx: optax.GradientTransformation,
                   cfg: ExperimentConfig, mesh=None) -> Callable:
    """Fuse an ENTIRE multi-epoch training run into one jitted dispatch.

    For datasets that fit on device (this problem's always do), the
    per-epoch host round trip — dispatch latency plus loss fetches, ~1 s
    through a remote TPU tunnel — dominates wall time. Here train epochs,
    validation, metrics, the plateau LR scheduler, and best-checkpoint
    selection all run under one ``lax.scan`` over epochs; the host gets
    back the final state, the best parameters (tracked functionally on
    device), and per-epoch history arrays.

    Signature:
        run(state, train_data, val_data, plans, val_plan, key)
          -> (state, best, history)
        plans: dict of [E, nb, B] index arrays (one epoch plan per epoch)
        best:  dict with 'params', 'val_loss', 'epoch'
        history: dict of [E] arrays (train_loss, val_loss, lr, metric sums)
    """
    step = _step_impl(model, tx, cfg, augment=True)
    eval_epoch_fn = _eval_epoch_impl(model, cfg, cfg.train.iou_thresh, mesh)
    constrain = _batch_constrainer(mesh)

    def run(state: TrainState, sched: SchedState, best,
            train_data, val_data, plans, val_plan, epoch_ids,
            key: jax.Array):
        """One segment of epochs. sched/best thread through so callers can
        bound the length of a single device execution (a multi-minute
        dispatch can trip worker watchdogs) while keeping everything on
        device between segments."""
        E = plans["base_idx"].shape[0]
        keys = jax.random.split(key, E)

        def epoch_body(carry, inp):
            state, sched, best = carry
            plan, k, epoch_idx = inp

            def batch_body(st, binp):
                idx, rot_k, weight, bk = binp
                batch = constrain({
                    "raw": train_data["raw"][idx],
                    "length": train_data["length"][idx],
                    "boxes": train_data["boxes"][idx],
                    "labels": train_data["labels"][idx],
                    "valid": train_data["valid"][idx],
                    "rotation_k": rot_k,
                    "weight": weight,
                })
                st, losses = step(st, batch, bk)
                return st, losses["total_loss"]

            bkeys = jax.random.split(k, plan["base_idx"].shape[0])
            state, tl = jax.lax.scan(
                batch_body, state,
                (plan["base_idx"], plan["rotation_k"], plan["weight"],
                 bkeys))
            train_loss = jnp.mean(tl)

            p_eval = eval_params(state)  # EMA when enabled, else raw
            val_losses, sums = eval_epoch_fn(p_eval, val_data, val_plan)
            val_loss = val_losses["total_loss"]

            sched = sched_update(sched, val_loss, cfg)
            state = state._replace(
                opt_state=_set_lr_in_tree(state.opt_state, sched.lr))

            is_best = val_loss < best["val_loss"]
            best = {
                "params": jax.tree_util.tree_map(
                    lambda new, old: jnp.where(is_best, new, old),
                    p_eval, best["params"]),
                "val_loss": jnp.where(is_best, val_loss, best["val_loss"]),
                "epoch": jnp.where(is_best, epoch_idx, best["epoch"]),
            }
            record = {
                "train_loss": train_loss,
                "val_loss": val_loss,
                "lr": sched.lr,
                **{k2: v.astype(jnp.float32) for k2, v in sums.items()},
            }
            return (state, sched, best), record

        (state, sched, best), history = jax.lax.scan(
            epoch_body, (state, sched, best), (plans, keys, epoch_ids))
        return state, sched, best, history

    return jax.jit(run, donate_argnums=(0, 1, 2))


def fused_run_init(cfg: ExperimentConfig, state: TrainState):
    """Initial (sched, best) carry for make_fused_run segments.

    best['params'] must NOT alias state.params: both are donated to the
    fused run, and donating two views of one buffer is undefined (surfaces
    as an async INVALID_ARGUMENT at the next fetch)."""
    best = {
        "params": jax.tree_util.tree_map(jnp.copy, state.params),
        "val_loss": jnp.asarray(jnp.inf, jnp.float32),
        "epoch": jnp.asarray(-1, jnp.int32),
    }
    return sched_init(cfg), best


def _eval_epoch_impl(model, cfg: ExperimentConfig,
                     iou_thresh: float = 0.5, mesh=None) -> Callable:
    """Whole-val-split evaluation: mean loss + metric sums (the reference
    loops batches eagerly with a CPU Hungarian per item, train.py:234-353).
    Un-jitted so the fused run can inline it."""
    from room_slam_tpu.train.metrics import metrics_sums

    lw = _loss_weight_dict(cfg)
    constrain = _batch_constrainer(mesh)

    def epoch(params, data: Dict[str, jnp.ndarray],
              plan: Dict[str, jnp.ndarray]):
        def body(carry, inp):
            idx, weight = inp
            batch = constrain({
                "raw": data["raw"][idx],
                "length": data["length"][idx],
                "boxes": data["boxes"][idx],
                "labels": data["labels"][idx],
                "valid": data["valid"][idx],
                "weight": weight,
            })
            feats, mask = featurize(batch["raw"], batch["length"])
            out = model.apply(params, feats, mask, deterministic=True)
            targets = {
                "boxes": batch["boxes"],
                "labels": batch["labels"],
                "valid_mask": batch["valid"],
            }
            losses = set_criterion(out, targets, weight, lw)
            sums = metrics_sums(out, batch, iou_thresh)
            return carry, (losses, sums)

        _, (losses, sums) = jax.lax.scan(
            body, None, (plan["base_idx"], plan["weight"]))
        mean_losses = jax.tree_util.tree_map(jnp.mean, losses)
        total_sums = jax.tree_util.tree_map(lambda x: jnp.sum(x), sums)
        return mean_losses, total_sums

    return epoch


def make_eval_epoch(model, cfg: ExperimentConfig, iou_thresh: float = 0.5,
                    mesh=None) -> Callable:
    """Jitted whole-val-split evaluation (see _eval_epoch_impl)."""
    return jax.jit(_eval_epoch_impl(model, cfg, iou_thresh, mesh))


def make_eval_step(model, cfg: ExperimentConfig) -> Callable:
    """Validation loss step (no augmentation, deterministic forward) —
    analog of validate() (ref: train.py:330-353). Returns weighted-sum loss
    pieces so the driver can average over batches."""
    lw = {
        "class_loss": cfg.train.loss_weights[0],
        "l1_loss": cfg.train.loss_weights[1],
        "giou_loss": cfg.train.loss_weights[2],
        # keep val_loss comparable to the reference's validate():
        # auxiliary heads are monitored but excluded from the val total
        "objectness_loss": 0.0,
        # ...but the monitored objectness_loss must track the TRAINING
        # target (IoU-aware when train.objectness_iou), not the binary one
        "objectness_iou": 1.0 if cfg.train.objectness_iou else 0.0,
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
