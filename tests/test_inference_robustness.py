"""Inference-time robustness shims matching the reference's behavioral
surface for odd checkpoints/inputs (ref: src/benchmark/inference.py:242-265):
feature-dim auto-adaptation and the mask-less model fallback."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from inference import adapt_features, model_input_dim, predict
from room_slam_tpu.config import ModelConfig
from room_slam_tpu.models.factory import build_model, init_params


def _trace_file(tmp_path, n=64):
    rng = np.random.default_rng(0)
    rows = [{"timestamp": i * 0.05,
             "x": float(rng.normal()), "y": float(rng.normal()),
             "z": float(rng.normal())} for i in range(n)]
    p = tmp_path / "trace.json"
    p.write_text(json.dumps(rows))
    return str(p)


def test_adapt_features_truncate_and_pad():
    f = np.arange(24, dtype=np.float32).reshape(2, 12)
    assert adapt_features(f, 12) is f
    t = adapt_features(f, 4)
    np.testing.assert_array_equal(t, f[:, :4])
    p = adapt_features(f, 15)
    assert p.shape == (2, 15)
    np.testing.assert_array_equal(p[:, :12], f)
    np.testing.assert_array_equal(p[:, 12:], 0.0)


def test_predict_adapts_to_4_feature_checkpoint(tmp_path):
    """A checkpoint trained on raw 4-D input (input_dim=4) still runs: the
    11-D featurization is truncated to the model's input_proj width."""
    cfg = ModelConfig(model_type="lstm", d_model=32, num_queries=10,
                      lstm_layers=1, dropout=0.0, use_pallas_rnn=False,
                      input_dim=4)
    model = build_model(cfg)
    params = init_params(model, cfg, seq_len=64)
    assert model_input_dim(params) == 4

    preds = predict(model, params, _trace_file(tmp_path), max_trace_len=64,
                    confidence_threshold=0.0)
    assert isinstance(preds, list)
    for p in preds:
        assert set(p) >= {"center", "size", "label", "confidence"}


def test_predict_maskless_model_fallback(tmp_path):
    """A model whose apply doesn't accept a mask is driven through the
    TypeError fallback (ref: inference.py:261-265)."""
    cfg = ModelConfig(model_type="lstm", d_model=32, num_queries=10,
                      lstm_layers=1, dropout=0.0, use_pallas_rnn=False)
    inner = build_model(cfg)
    params = init_params(inner, cfg, seq_len=64)

    class MasklessModel:
        def apply(self, params, traces, deterministic=True):
            mask = jnp.ones(traces.shape[:2], bool)
            return inner.apply(params, traces, mask,
                               deterministic=deterministic)

    preds = predict(MasklessModel(), params, _trace_file(tmp_path),
                    max_trace_len=64, confidence_threshold=0.0)
    assert isinstance(preds, list)


def test_model_input_dim_default_when_absent():
    assert model_input_dim({"params": {"head": {"w": jnp.zeros((3, 3))}}},
                           default=11) == 11
