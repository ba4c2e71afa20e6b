"""Resume, failure recovery, and the orbax checkpoint backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from room_slam_tpu.config import DataConfig, ExperimentConfig, ModelConfig, \
    TrainConfig
from room_slam_tpu.data import synthetic
from room_slam_tpu.data.dataset import TraceColliderArrays
from room_slam_tpu.models.factory import build_model, init_params
from room_slam_tpu.train import checkpoint as ckpt
from room_slam_tpu.train.driver import train_benchmark


def _cfg(save_dir, epochs=12):
    return ExperimentConfig(
        data=DataConfig(max_trace_len=128, max_colliders=16,
                        noise_prob=0.0, crop_prob=0.0, time_warp_prob=0.0,
                        augment_collider_dropout=False),
        model=ModelConfig(model_type="lstm", d_model=32, num_queries=10,
                          lstm_layers=1, dropout=0.0, use_pallas_rnn=False),
        train=TrainConfig(batch_size=4, lr=1e-3, num_epochs=epochs,
                          save_dir=str(save_dir)),
    )


def _datasets(cfg):
    data = jax.device_get(synthetic.generate_rooms_and_traces(
        jax.random.key(0), 4, cfg.data.max_trace_len,
        max_colliders=cfg.data.max_colliders))
    val = jax.device_get(synthetic.generate_rooms_and_traces(
        jax.random.key(1), 2, cfg.data.max_trace_len,
        max_colliders=cfg.data.max_colliders))
    return (TraceColliderArrays.from_arrays(data, cfg.data, augment=True),
            TraceColliderArrays.from_arrays(val, cfg.data, augment=False))


def test_resume_continues_training(tmp_path):
    cfg = _cfg(tmp_path / "a", epochs=12)
    tr, va = _datasets(cfg)
    r1 = train_benchmark(cfg, train_ds=tr, val_ds=va, verbose=False,
                         use_mesh=False)
    # checkpoint_epoch_9 exists (periodic at (epoch+1) % 10 == 0)
    resume_from = tmp_path / "a" / "checkpoint_epoch_9"
    assert resume_from.with_suffix(".msgpack").exists()

    cfg2 = _cfg(tmp_path / "b", epochs=12)
    r2 = train_benchmark(cfg2, train_ds=tr, val_ds=va, verbose=False,
                         use_mesh=False, resume=str(resume_from))
    # resumed run trains epochs 10..11 only
    assert len(r2["history"]) == 2
    assert r2["history"][0]["epoch"] == 10
    assert np.isfinite(r2["history"][-1]["val_loss"])
    # periodic checkpoints carry no val_loss (sidecar NaN); resuming from
    # one must NOT poison best_val — a best model must still be saved and
    # the returned best_val_loss must be finite
    assert np.isfinite(r2["best_val_loss"])
    best2 = tmp_path / "b" / "best_model"
    assert best2.with_suffix(".msgpack").exists()
    import json
    side = json.loads(best2.with_suffix(".json").read_text())
    assert np.isfinite(side["val_loss"])
    # the plateau scheduler state was persisted and restored: the sidecar of
    # the periodic checkpoint carries it
    side9 = json.loads(resume_from.with_suffix(".json").read_text())
    assert set(side9["sched"]) == {"lr", "best", "num_bad",
                                   "cooldown_counter"}


def test_orbax_backend_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    cfg = _cfg(tmp_path)
    model = build_model(cfg.model)
    params = init_params(model, cfg.model, seq_len=cfg.data.max_trace_len)
    ckpt.save_checkpoint_orbax(tmp_path / "ck", params, epoch=5,
                               val_loss=1.25)
    p2, _, side = ckpt.load_checkpoint_orbax(tmp_path / "ck", params)
    assert side["epoch"] == 5 and side["backend"] == "orbax"
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
