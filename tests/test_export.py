"""StableHLO serving export (tools/export.py): the serialized artifact must
reproduce the live predictor program bit-for-bit on the same inputs, through
a full save-checkpoint -> export -> deserialize round trip."""

import numpy as np
import pytest

from room_slam_tpu.config import ExperimentConfig, ModelConfig
from room_slam_tpu.models.factory import build_model, init_params
from room_slam_tpu.train import checkpoint as ckpt_lib


def test_export_roundtrip(tmp_path, rng):
    jexport = pytest.importorskip("jax.export")
    del jexport
    import jax.numpy as jnp

    from room_slam_tpu.predictor import build_predictor
    from room_slam_tpu.tools.export import (export_checkpoint,
                                            load_exported)

    cfg = ExperimentConfig()
    cfg.model = ModelConfig(model_type="lstm", d_model=32, num_queries=8,
                            lstm_layers=1, dropout=0.0, objectness=True,
                            center_xz=True, refine_stages=1,
                            use_pallas_rnn=False)
    model = build_model(cfg.model)
    params = init_params(model, cfg.model, seq_len=64)
    ck = tmp_path / "ckpt" / "best_model"
    ckpt_lib.save_checkpoint(ck, params, config=cfg)

    out = tmp_path / "model.shlo"
    meta = export_checkpoint(str(ck), str(out), max_trace_len=64,
                             threshold=0.0, nms=0.1, refine=0.3,
                             extent=1.0, top_k=5, fuse=True)
    assert out.exists() and meta["bytes"] > 0
    assert meta["input"]["traces"] == [1, 64, 11]

    # identical inputs through the live predictor program and the artifact
    predict = build_predictor(
        model, params, max_trace_len=64, confidence_threshold=0.0,
        nms_threshold=0.1, refine_clearance=0.3, extent_slack=1.0,
        top_k=5, fuse=True, verbose=False)
    feats = np.asarray(rng.normal(size=(1, 64, 11)), np.float32)
    feats[..., 3] = np.cumsum(np.abs(feats[..., 3]) * 0.03, axis=-1)
    mask = np.ones((1, 64), bool)
    live = np.asarray(predict.run(params, jnp.asarray(feats),
                                  jnp.asarray(mask)))
    served = np.asarray(load_exported(str(out))(feats, mask))
    np.testing.assert_allclose(served, live, atol=1e-6)
