"""Checkpoint souping (tools/soup.py): uniform averaging semantics."""

import numpy as np
import pytest

from room_slam_tpu.config import (DataConfig, ExperimentConfig, ModelConfig,
                                  TrainConfig)
from room_slam_tpu.models.factory import build_model, init_params
from room_slam_tpu.tools.soup import soup_params
from room_slam_tpu.train import checkpoint as ckpt_lib


def _cfg():
    return ExperimentConfig(
        data=DataConfig(max_trace_len=64, max_colliders=8),
        model=ModelConfig(model_type="lstm", d_model=16, num_queries=4,
                          lstm_layers=1, use_pallas_rnn=False),
        train=TrainConfig(batch_size=2),
    )


def test_soup_is_uniform_mean(tmp_path):
    import jax

    cfg = _cfg()
    model = build_model(cfg.model)
    p1 = init_params(model, cfg.model, seq_len=64)
    p2 = jax.tree_util.tree_map(lambda a: a + 1.0, p1)
    ckpt_lib.save_checkpoint(tmp_path / "a", p1, config=cfg)
    ckpt_lib.save_checkpoint(tmp_path / "b", p2, config=cfg)

    tree, side = soup_params([tmp_path / "a", tmp_path / "b"])
    # the soup of {p, p+1} is p + 0.5 exactly, leaf for leaf
    flat_soup = jax.tree_util.tree_leaves(tree)
    flat_ref = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda a: np.asarray(a) + 0.5, p1))
    assert len(flat_soup) == len(flat_ref)
    got = sorted((a.shape, float(np.sum(a))) for a in flat_soup)
    want = sorted((a.shape, float(np.sum(a))) for a in flat_ref)
    for (gs, gv), (ws, wv) in zip(got, want):
        assert gs == ws
        assert gv == pytest.approx(wv, rel=1e-6, abs=1e-6)
    assert "config" in side

    # a souped checkpoint loads back through the normal path
    ckpt_lib.save_checkpoint(tmp_path / "soup", tree, config=cfg)
    params, _, _ = ckpt_lib.load_checkpoint(tmp_path / "soup", p1)
    out = jax.tree_util.tree_map(lambda a, b: np.allclose(
        np.asarray(a), np.asarray(b) + 0.5), params, p1)
    assert all(jax.tree_util.tree_leaves(out))


def test_soup_rejects_mismatched_trees(tmp_path):
    cfg = _cfg()
    model = build_model(cfg.model)
    p1 = init_params(model, cfg.model, seq_len=64)
    cfg2 = _cfg()
    cfg2.model.d_model = 32
    model2 = build_model(cfg2.model)
    p2 = init_params(model2, cfg2.model, seq_len=64)
    ckpt_lib.save_checkpoint(tmp_path / "a", p1, config=cfg)
    ckpt_lib.save_checkpoint(tmp_path / "c", p2, config=cfg2)
    with pytest.raises(SystemExit):
        soup_params([tmp_path / "a", tmp_path / "c"])
    with pytest.raises(SystemExit):
        soup_params([tmp_path / "a"])
