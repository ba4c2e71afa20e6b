"""High-level training drivers for both API surfaces.

``train_benchmark`` mirrors the reference's train.py main() flow
(ref: src/benchmark/train.py:356-507): aggressive augmentation on train,
clean val, AdamW + clip + ReduceLROnPlateau, per-epoch Hungarian-aligned
metrics, best + periodic checkpoints. ``train_legacy`` drives the documented
GRU surface (README.md:147-157).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from room_slam_tpu.config import ExperimentConfig
from room_slam_tpu.data.dataset import TraceColliderArrays
from room_slam_tpu.models.factory import build_model, count_parameters, \
    init_params
from room_slam_tpu.parallel import mesh as mesh_lib
from room_slam_tpu.train import checkpoint as ckpt_lib
from room_slam_tpu.train.loop import (PlateauScheduler, TrainState,
                                      eval_params, make_eval_epoch,
                                      make_optimizer, make_train_epoch,
                                      get_learning_rate, set_learning_rate)
from room_slam_tpu.train.metrics import summarize_metrics


def _device_batch(batch: Dict[str, np.ndarray], mesh=None):
    if mesh is not None:
        return mesh_lib.shard_batch(batch, mesh)
    return {k: jnp.asarray(v) for k, v in batch.items()}


def _check_query_capacity(cfg: ExperimentConfig, *datasets) -> None:
    """The fast Hungarian matcher wired into the loss keeps only the FIRST
    Q valid GT columns when a sample has more valid colliders than query
    slots (ops/hungarian.py). All shipped configs satisfy num_valid <= Q;
    warn loudly if a future config silently activates the truncation."""
    import warnings

    mv = max((ds.max_valid for ds in datasets if ds is not None), default=0)
    if mv > cfg.model.num_queries:
        warnings.warn(
            f"dataset has samples with {mv} valid colliders but the model "
            f"only has num_queries={cfg.model.num_queries}; the matcher "
            f"will truncate to the first {cfg.model.num_queries} valid GT "
            "boxes per sample (excess GT count as FN). Raise "
            "model.num_queries to cover max_valid.",
            stacklevel=3)


def make_synthetic_datasets(cfg: ExperimentConfig, n_rooms: int,
                            seed: int = 0, mode: str = "agent",
                            multi_room_prob: float = 0.0,
                            sim_factor: float | None = None,
                            wall_adjacent_prob: float = 0.0,
                            captures_per_room: int = 1,
                            evidence_mask: bool = False):
    """On-device synthetic train/val datasets (val = n_rooms // 8 + 1 extra
    rooms from an independent seed).

    mode: 'agent' (constant sensor height, like the Unity robot), 'human'
    (head-height with bob, like the ARKit captures), or 'mixed' (half each).
    multi_room_prob: share of layouts that are two rooms with a doorway.
    sim_factor: walk duration as a multiple of max_trace_len ticks; the
    trace is downsampled back to max_trace_len like real captures are
    (synthetic.py generate_rooms_and_traces). None = per-mode defaults
    matching the real recordings: human 2.4 (dataset/val is 3587 points
    -> 1500) and agent 4.0 (the Unity robot records minutes-long runs,
    dataset/train reaches 41k points).
    captures_per_room / evidence_mask: see
    synthetic.generate_rooms_and_traces (multi-capture rooms, the
    reference dataset's own structure; evidence-gated supervision).
    Both apply to the TRAIN split only — val keeps one full-GT walk per
    room so val metrics stay comparable across these settings.
    """
    from room_slam_tpu.data import synthetic

    # sampling rates of the real captures: the ARKit human stream runs
    # ~37 Hz (dataset/val: 3587 points over ~97 s); the Unity agent records
    # per frame, downsampled here to 30 Hz
    HUMAN_HZ, AGENT_HZ = 37.0, 30.0
    HUMAN_SIM, AGENT_SIM = 2.4, 4.0
    L = cfg.data.max_trace_len

    def steps(human: bool) -> int:
        f = sim_factor if sim_factor is not None else (
            HUMAN_SIM if human else AGENT_SIM)
        return int(round(L * f))

    def gen(key, n, cpr, emask):
        if mode == "mixed":
            k1, k2 = jax.random.split(key)
            a = synthetic.generate_rooms_and_traces(
                k1, n // 2, L,
                max_colliders=cfg.data.max_colliders, hz=AGENT_HZ,
                human=False, multi_room_prob=multi_room_prob,
                sim_steps=steps(False),
                wall_adjacent_prob=wall_adjacent_prob,
                captures_per_room=cpr, evidence_mask=emask)
            b = synthetic.generate_rooms_and_traces(
                k2, n - n // 2, L,
                max_colliders=cfg.data.max_colliders, hz=HUMAN_HZ,
                human=True, multi_room_prob=multi_room_prob,
                sim_steps=steps(True),
                wall_adjacent_prob=wall_adjacent_prob,
                captures_per_room=cpr, evidence_mask=emask)
            return {k: np.concatenate(
                [np.asarray(a[k]), np.asarray(b[k])]) for k in a}
        human = mode == "human"
        return jax.device_get(synthetic.generate_rooms_and_traces(
            key, n, L,
            max_colliders=cfg.data.max_colliders,
            hz=HUMAN_HZ if human else AGENT_HZ, human=human,
            multi_room_prob=multi_room_prob, sim_steps=steps(human),
            wall_adjacent_prob=wall_adjacent_prob,
            captures_per_room=cpr, evidence_mask=emask))

    n_val = max(n_rooms // 8, 4)
    train = gen(jax.random.key(seed), n_rooms, captures_per_room,
                evidence_mask)
    val = gen(jax.random.key(seed + 10_000), n_val, 1, False)
    return (TraceColliderArrays.from_arrays(train, cfg.data, augment=True),
            TraceColliderArrays.from_arrays(val, cfg.data, augment=False))


def train_benchmark_fused(
    cfg: ExperimentConfig,
    use_mesh: bool = True,
    verbose: bool = True,
    train_ds: TraceColliderArrays | None = None,
    val_ds: TraceColliderArrays | None = None,
) -> Dict:
    """Train a benchmark-surface model with the ENTIRE run fused into one
    XLA dispatch (epochs, validation, plateau LR, best-checkpoint selection
    all on device — see loop.make_fused_run). The host only builds index
    plans up front and reads back history arrays at the end."""
    import numpy as np

    from room_slam_tpu.train.loop import make_fused_run

    jax.config.update("jax_default_matmul_precision",
                      cfg.train.matmul_precision)
    mesh = None
    if use_mesh and len(jax.devices()) > 1:
        mesh = mesh_lib.make_mesh_from_config(cfg.mesh.mesh_shape)

    if train_ds is None:
        train_ds = TraceColliderArrays(cfg.data.data_dir, cfg.data,
                                       augment=True, verbose=verbose)
    if val_ds is None:
        val_ds = TraceColliderArrays(cfg.data.val_dir, cfg.data,
                                     augment=False, verbose=verbose)

    model = build_model(cfg.model)
    params = init_params(model, cfg.model, seed=cfg.train.seed,
                         seq_len=cfg.data.max_trace_len)
    if mesh is not None:
        params = mesh_lib.shard_params(params, mesh)
    n_params = count_parameters(params)
    if verbose:
        print(f"Model parameters: {n_params:,}")
    _check_query_capacity(cfg, train_ds, val_ds)

    from room_slam_tpu.train.loop import fused_run_init

    tx = make_optimizer(cfg)
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    run = make_fused_run(model, tx, cfg, mesh=mesh)
    sched, best = fused_run_init(cfg, state)

    E = cfg.train.num_epochs
    # bound each device execution: a single multi-minute dispatch can trip
    # the TPU worker watchdog; cap a segment at ~200 optimizer steps
    nb = train_ds.num_batches(cfg.train.batch_size)
    seg = max(1, min(20, E, max(1, 200 // nb)))
    plans_np = [train_ds.epoch_plan(cfg.train.batch_size,
                                    seed=cfg.train.seed + e)
                for e in range(E)]
    val_plan = {k: jnp.asarray(v)
                for k, v in val_ds.epoch_plan(cfg.train.batch_size,
                                              shuffle=False).items()}
    train_data = {k: jnp.asarray(v)
                  for k, v in train_ds.device_arrays().items()}
    val_data = {k: jnp.asarray(v)
                for k, v in val_ds.device_arrays().items()}

    t0 = time.time()
    key = jax.random.key(cfg.train.seed, impl=cfg.train.rng_impl)
    chunks = []
    for lo in range(0, E, seg):
        hi = min(lo + seg, E)  # full segments + at most one remainder shape
        idxs = list(range(lo, hi))
        plans = {k: jnp.asarray(np.stack([plans_np[i][k] for i in idxs]))
                 for k in plans_np[0]}
        epoch_ids = jnp.asarray(idxs, jnp.int32)
        key, sub = jax.random.split(key)
        state, sched, best, hist = run(
            state, sched, best, train_data, val_data, plans, val_plan,
            epoch_ids, sub)
        chunks.append({k: np.asarray(v)
                       for k, v in jax.device_get(hist).items()})
    history = {k: np.concatenate([c[k] for c in chunks]) for k in chunks[0]}
    best_val = float(best["val_loss"])
    wall = time.time() - t0

    save_dir = Path(cfg.train.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    cfg.to_json(save_dir / "config.json")

    from room_slam_tpu.train.metrics import summarize_metrics
    from room_slam_tpu.utils.logging import MetricsLogger

    mlog = MetricsLogger(save_dir / "history.jsonl")
    hist_rows = []
    for e in range(E):
        sums = {k: float(history[k][e]) for k in
                ("iou_sum", "iou_cnt", "tp", "fp", "fn", "cls_correct",
                 "cls_total")}
        m = summarize_metrics(sums)
        row = {"epoch": e, "train_loss": float(history["train_loss"][e]),
               "val_loss": float(history["val_loss"][e]),
               "lr": float(history["lr"][e]), **m}
        hist_rows.append(row)
        mlog.log(**{k: v for k, v in row.items()
                    if isinstance(v, (int, float))})
        if verbose and (e % 10 == 0 or e == E - 1):
            print(f"Epoch {e}: Train {row['train_loss']:.4f} | "
                  f"Val {row['val_loss']:.4f} | mIoU={row['mIoU']:.3f} "
                  f"F1={row['f1']:.3f} ClsAcc={row['cls_acc']:.3f} | "
                  f"LR={row['lr']:.6f}")

    best_epoch = int(best["epoch"])
    best_metrics = hist_rows[best_epoch] if 0 <= best_epoch < E else {}
    ckpt_lib.save_checkpoint(
        save_dir / "best_model", best["params"], epoch=best_epoch,
        val_loss=best_val, metrics=best_metrics, config=cfg)
    ckpt_lib.save_checkpoint(
        save_dir / "final_model", state.params, state.opt_state,
        epoch=E - 1, val_loss=hist_rows[-1]["val_loss"],
        metrics=hist_rows[-1], config=cfg)
    if verbose:
        print(f"✓ Saved BEST model from epoch {best_epoch} "
              f"(val_loss={best_val:.4f}) and final model")

    samples_seen = train_ds.num_samples * E
    return {
        "best_val_loss": best_val,
        "best_epoch": best_epoch,
        "history": hist_rows,
        "wall_time_s": wall,
        "samples_seen": samples_seen,
        "samples_per_sec": samples_seen / max(wall, 1e-9),
        "n_params": n_params,
        "save_dir": str(save_dir),
    }


def train_benchmark(
    cfg: ExperimentConfig,
    use_mesh: bool = True,
    verbose: bool = True,
    train_ds: TraceColliderArrays | None = None,
    val_ds: TraceColliderArrays | None = None,
    resume: Optional[str] = None,
    max_recoveries: int = 3,
) -> Dict:
    """Train a benchmark-surface model end to end; returns a summary dict.

    Beyond the reference (which has neither — SURVEY.md section 5):
    - ``resume``: continue from a checkpoint (params + optimizer state +
      epoch counter).
    - failure recovery: if the device runtime dies mid-epoch (the remote
      TPU worker can crash/restart), training reloads the last checkpoint
      and continues, up to ``max_recoveries`` times.
    """
    jax.config.update("jax_default_matmul_precision",
                      cfg.train.matmul_precision)
    mesh = None
    if use_mesh and len(jax.devices()) > 1:
        mesh = mesh_lib.make_mesh_from_config(cfg.mesh.mesh_shape)
        if verbose:
            print(f"Mesh: {dict(mesh.shape)}")

    if train_ds is None:
        train_ds = TraceColliderArrays(cfg.data.data_dir, cfg.data,
                                       augment=True, verbose=verbose)
    if val_ds is None:
        val_ds = TraceColliderArrays(cfg.data.val_dir, cfg.data,
                                     augment=False, verbose=verbose)

    model = build_model(cfg.model)
    params = init_params(model, cfg.model, seed=cfg.train.seed,
                         seq_len=cfg.data.max_trace_len)
    if mesh is not None:
        params = mesh_lib.shard_params(params, mesh)
    n_params = count_parameters(params)
    if verbose:
        print(f"Model parameters: {n_params:,}")
    _check_query_capacity(cfg, train_ds, val_ds)

    tx = make_optimizer(cfg)
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    train_epoch = make_train_epoch(model, tx, cfg, augment=True, mesh=mesh)
    eval_epoch = make_eval_epoch(model, cfg, cfg.train.iou_thresh, mesh=mesh)
    sched = PlateauScheduler(
        lr=cfg.train.lr,
        factor=cfg.train.plateau_factor,
        patience=cfg.train.plateau_patience,
        cooldown=cfg.train.plateau_cooldown,
        min_lr=cfg.train.lr * cfg.train.plateau_min_scale,
    )

    save_dir = Path(cfg.train.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    cfg.to_json(save_dir / "config.json")

    from room_slam_tpu.utils.logging import MetricsLogger

    mlog = MetricsLogger(save_dir / "history.jsonl")

    key = jax.random.key(cfg.train.seed, impl=cfg.train.rng_impl)
    best_val = float("inf")
    history = []
    t0 = time.time()
    samples_seen = 0
    start_epoch = 0
    last_ckpt: Optional[Path] = None

    if resume:
        import math

        params_r, opt_r, side = ckpt_lib.load_checkpoint(
            resume, state.params, state.opt_state)
        state = TrainState(params_r, opt_r or state.opt_state,
                           jnp.asarray(0))
        start_epoch = int(side.get("epoch", -1)) + 1
        # periodic checkpoints are saved without val_loss (sidecar NaN);
        # a NaN best_val would make 'val_loss < best_val' always False and
        # best-model saving dead for the whole resumed run
        bv = side.get("val_loss")
        if isinstance(bv, (int, float)) and math.isfinite(bv):
            best_val = float(bv)
        # restore the plateau scheduler (lr/best/num_bad/cooldown) so the
        # first sched.step() doesn't overwrite a decayed LR with cfg lr
        if isinstance(side.get("sched"), dict):
            sched.load_state_dict(side["sched"])
        elif opt_r is not None:
            sched.lr = get_learning_rate(state.opt_state)
        if cfg.train.lr_schedule != "cosine":
            state = state._replace(
                opt_state=set_learning_rate(state.opt_state, sched.lr))
        if verbose:
            print(f"Resumed from {resume} at epoch {start_epoch} "
                  f"(best_val={best_val:.4f}, lr={sched.lr:.6f})")

    # dataset arrays live on device for the whole run; epochs only ship
    # small index plans (device-resident data path, SURVEY.md section 7)
    def put_data():
        return (
            {k: jnp.asarray(v) for k, v in train_ds.device_arrays().items()},
            {k: jnp.asarray(v) for k, v in val_ds.device_arrays().items()},
            {k: jnp.asarray(v)
             for k, v in val_ds.epoch_plan(cfg.train.batch_size,
                                           shuffle=False).items()},
        )

    train_data, val_data, val_plan = put_data()
    recoveries = 0

    epoch = start_epoch
    while epoch < cfg.train.num_epochs:
        if cfg.train.lr_schedule == "cosine":
            from room_slam_tpu.train.loop import warmup_cosine_lr

            state = state._replace(opt_state=set_learning_rate(
                state.opt_state, warmup_cosine_lr(cfg, epoch)))
        try:
            # --- train: one device dispatch for the whole epoch ---
            plan = {
                k: jnp.asarray(v)
                for k, v in train_ds.epoch_plan(
                    cfg.train.batch_size,
                    seed=cfg.train.seed + epoch).items()
            }
            key, sub = jax.random.split(key)
            state, mean_losses = train_epoch(state, train_data, plan, sub)
            train_loss = float(mean_losses["total_loss"])
        except jax.errors.JaxRuntimeError as e:
            # device runtime died (remote TPU worker crash/restart):
            # re-upload data, restore the last checkpoint, redo the epoch
            recoveries += 1
            if recoveries > max_recoveries:
                raise
            print(f"⚠ device failure in epoch {epoch} "
                  f"({type(e).__name__}); recovery "
                  f"{recoveries}/{max_recoveries} from "
                  f"{last_ckpt or 'initial state'}")
            model_r = build_model(cfg.model)
            params_r = init_params(model_r, cfg.model, seed=cfg.train.seed,
                                   seq_len=cfg.data.max_trace_len)
            opt_r = tx.init(params_r)
            if last_ckpt is not None:
                params_r, opt_r2, side = ckpt_lib.load_checkpoint(
                    last_ckpt, params_r, opt_r)
                opt_r = opt_r2 or opt_r
                epoch = int(side.get("epoch", epoch - 1)) + 1
            else:
                epoch = start_epoch
            state = TrainState(params_r, opt_r, jnp.asarray(0))
            train_data, val_data, val_plan = put_data()
            continue
        samples_seen += train_ds.num_samples

        # --- validate + metrics: one device dispatch ---
        if (epoch + 1) % cfg.train.val_every == 0:
            p_eval = eval_params(state)  # EMA when enabled, else raw
            losses, sums = eval_epoch(p_eval, val_data, val_plan)
            val_loss = float(losses["total_loss"])
            metrics = summarize_metrics(
                {k: float(v) for k, v in sums.items()})

            if cfg.train.lr_schedule == "cosine":
                lr = get_learning_rate(state.opt_state)
            else:
                lr = sched.step(val_loss)
                state = state._replace(
                    opt_state=set_learning_rate(state.opt_state, lr))

            if verbose:
                print(
                    f"Epoch {epoch}: Train {train_loss:.4f} | "
                    f"Val {val_loss:.4f} | mIoU={metrics.get('mIoU', 0):.3f} "
                    f"P={metrics.get('precision', 0):.3f} "
                    f"R={metrics.get('recall', 0):.3f} "
                    f"F1={metrics.get('f1', 0):.3f} "
                    f"ClsAcc={metrics.get('cls_acc', 0):.3f} | LR={lr:.6f}")

            history.append({"epoch": epoch, "train_loss": train_loss,
                            "val_loss": val_loss, **metrics})
            mlog.log(epoch=epoch, train_loss=train_loss, val_loss=val_loss,
                     lr=lr, **{k: v for k, v in metrics.items()
                               if isinstance(v, (int, float))})

            if val_loss < best_val:
                best_val = val_loss
                ckpt_lib.save_checkpoint(
                    save_dir / "best_model", p_eval, state.opt_state,
                    epoch=epoch, val_loss=val_loss, metrics=metrics,
                    config=cfg, extra={"sched": sched.state_dict()})
                if verbose:
                    print(f"✓ Saved BEST model (val_loss={best_val:.4f})")
        elif verbose:
            print(f"Epoch {epoch}: Train {train_loss:.4f}")

        if (epoch + 1) % 10 == 0:
            last_ckpt = save_dir / f"checkpoint_epoch_{epoch}"
            ckpt_lib.save_checkpoint(
                last_ckpt, state.params, state.opt_state, epoch=epoch,
                config=cfg, extra={"sched": sched.state_dict()})
        epoch += 1

    wall = time.time() - t0
    return {
        "best_val_loss": best_val,
        "history": history,
        "wall_time_s": wall,
        "samples_seen": samples_seen,
        "samples_per_sec": samples_seen / max(wall, 1e-9),
        "n_params": n_params,
        "save_dir": str(save_dir),
    }


def train_legacy(
    data_dir: str,
    epochs: int = 100,
    batch_size: int = 32,
    lr: float = 1e-3,
    hidden_size: int = 128,
    seq_len: int = 500,
    max_objects: int = 10,
    save_dir: str = "./checkpoints",
    seed: int = 0,
    val_fraction: float = 0.2,
    verbose: bool = True,
) -> Dict:
    """Train the legacy GRU surface with the documented defaults
    (ref: README.md:149-157: batch=32, lr=1e-3, hidden=128, seq=500,
    max_objects=10, epochs=100)."""
    import optax

    from room_slam_tpu.data.legacy import LegacyArrays
    from room_slam_tpu.models.legacy_gru import RoomSlamGRU
    from room_slam_tpu.ops.losses import legacy_criterion

    ds = LegacyArrays(data_dir, seq_len=seq_len, max_objects=max_objects)
    n = len(ds)
    n_val = max(1, int(n * val_fraction))
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    val_idx, train_idx = perm[:n_val], perm[n_val:]
    if verbose:
        print(f"Legacy dataset: {n} windows ({len(train_idx)} train / "
              f"{n_val} val)")

    model = RoomSlamGRU(hidden_size=hidden_size, max_objects=max_objects)
    dummy = jnp.zeros((2, seq_len, 2), jnp.float32)
    params = jax.jit(lambda k: model.init(
        {"params": k}, dummy, deterministic=True))(jax.random.key(seed))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(lr))
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, batch, key):
        def loss_fn(p):
            out = model.apply(p, batch["traces"], deterministic=False,
                              rngs={"dropout": key})
            losses = legacy_criterion(
                out,
                {"boxes": batch["boxes"], "labels": batch["labels"],
                 "valid_mask": batch["valid"]},
                batch["weight"])
            return losses["total_loss"], losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, losses

    @jax.jit
    def val_step(params, batch):
        out = model.apply(params, batch["traces"], deterministic=True)
        return legacy_criterion(
            out,
            {"boxes": batch["boxes"], "labels": batch["labels"],
             "valid_mask": batch["valid"]},
            batch["weight"])

    def gather(idx_list, bs, seed_, shuffle):
        order = (np.random.default_rng(seed_).permutation(idx_list)
                 if shuffle else np.asarray(idx_list))
        for lo in range(0, len(order), bs):
            chunk = order[lo: lo + bs]
            pad = bs - len(chunk)
            sel = np.concatenate([chunk, np.zeros((pad,), chunk.dtype)])
            w = np.ones((bs,), np.float32)
            if pad:
                w[-pad:] = 0.0
            yield {
                "traces": jnp.asarray(ds.traces[sel, :, 1:3]),
                "boxes": jnp.asarray(ds.boxes[sel]),
                "labels": jnp.asarray(ds.labels[sel]),
                "valid": jnp.asarray(ds.valid[sel]),
                "weight": jnp.asarray(w),
            }

    save_path = Path(save_dir)
    save_path.mkdir(parents=True, exist_ok=True)
    key = jax.random.key(seed)
    best_val = float("inf")
    t0 = time.time()
    samples = 0
    for epoch in range(epochs):
        tr_loss, nb = 0.0, 0
        for batch in gather(train_idx, batch_size, seed + epoch, True):
            key, sub = jax.random.split(key)
            params, opt_state, losses = train_step(
                params, opt_state, batch, sub)
            tr_loss += float(losses["total_loss"])
            nb += 1
            samples += int(batch["weight"].sum())
        vl, nv = 0.0, 0
        for batch in gather(val_idx, batch_size, 0, False):
            vl += float(val_step(params, batch)["total_loss"])
            nv += 1
        vl /= max(nv, 1)
        if verbose:
            print(f"Epoch {epoch}: Train {tr_loss / max(nb, 1):.4f} | "
                  f"Val {vl:.4f}")
        if vl < best_val:
            best_val = vl
            ckpt_lib.save_checkpoint(
                save_path / "best_model_legacy", params,
                epoch=epoch, val_loss=vl)
    wall = time.time() - t0
    return {
        "best_val_loss": best_val,
        "wall_time_s": wall,
        "samples_per_sec": samples / max(wall, 1e-9),
        "save_dir": str(save_path),
        "model": model,
        "params": params,
        "dataset": ds,
        "val_idx": val_idx,
    }


def load_model_for_inference(checkpoint: str):
    """Rebuild a model + params from one of our checkpoints, or import a
    reference ``.pth`` directly (ref behavior: inference.py:8-21)."""
    if checkpoint.endswith(".pth"):
        from room_slam_tpu.train.torch_import import load_pth_checkpoint

        params, ref_cfg = load_pth_checkpoint(checkpoint)
        cfg = ExperimentConfig()
        cfg.model.model_type = ref_cfg.get("model_type", "transformer")
        cfg.model.d_model = ref_cfg.get("d_model", 256)
        cfg.model.num_queries = ref_cfg.get("num_queries", 50)
        cfg.model.use_pallas_rnn = False
        model = build_model(cfg.model)
        return model, params, cfg

    cfg = ckpt_lib.load_config_from_checkpoint(checkpoint)
    model = build_model(cfg.model)
    template = init_params(model, cfg.model)
    params, _, _ = ckpt_lib.load_checkpoint(checkpoint, template)
    return model, params, cfg
