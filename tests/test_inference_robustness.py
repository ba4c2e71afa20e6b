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


def test_tta_rotations_exact_for_covariant_model(tmp_path):
    """End-to-end contract of rotation TTA (predictor.build_predictor
    tta_rotations): host-side trace rotation -> featurize -> forward ->
    unrotate_boxes must be an exact identity for a model that is
    rotation-covariant by construction. The extent-box model below
    predicts the trace's axis-aligned XZ bounding box, which commutes
    with 90-degree rotations exactly, so all four rotations' un-rotated
    candidates coincide and the TTA output must equal the plain output."""
    import flax.linen as nn

    from room_slam_tpu.predictor import build_predictor

    class ExtentBoxModel(nn.Module):
        num_queries: int = 4

        @nn.compact
        def __call__(self, feats, mask, deterministic=True):
            # feature columns 0..3 are the raw (x, y, z, t) trace
            big = jnp.asarray(1e9, feats.dtype)
            x, y, z = feats[..., 0], feats[..., 1], feats[..., 2]
            xmin = jnp.min(jnp.where(mask, x, big), axis=1)
            xmax = jnp.max(jnp.where(mask, x, -big), axis=1)
            zmin = jnp.min(jnp.where(mask, z, big), axis=1)
            zmax = jnp.max(jnp.where(mask, z, -big), axis=1)
            ymean = jnp.sum(jnp.where(mask, y, 0.0), axis=1) / \
                jnp.sum(mask, axis=1)
            # every coordinate is linear in the trace AND the y size is
            # rotation-invariant ((x+z)/2 extent), so the box commutes
            # exactly with rotation, mirror, and uniform scaling (a
            # constant y size would break scale covariance; a bare x
            # extent would break rotation covariance)
            box = jnp.stack([
                (xmin + xmax) / 2, ymean, (zmin + zmax) / 2,
                xmax - xmin, (xmax - xmin + zmax - zmin) / 2,
                zmax - zmin], axis=-1)
            boxes = jnp.repeat(box[:, None], self.num_queries, axis=1)
            logits = jnp.zeros((*boxes.shape[:2], 4)).at[..., 0].set(5.0)
            # unused param so init_params-style flows have a tree to carry
            _ = self.param("dummy", nn.initializers.zeros, (1,))
            return {"pred_boxes": boxes, "pred_classes": logits}

    model = ExtentBoxModel()
    rng = np.random.default_rng(3)
    arr = np.column_stack([
        rng.normal(size=50) * 2 + 1.0,
        np.full(50, 1.2),
        rng.normal(size=50) * 3 - 0.5,
        np.sort(rng.uniform(0, 10, 50)),
    ]).astype(np.float32)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 64, 11)), jnp.ones((1, 64), bool))

    outs = {}
    # the extent box also commutes with the x-mirror and with uniform
    # scaling exactly, so every view family (rotations, reflections,
    # scales, all combined) must collapse to the plain output under NMS
    cases = ((False, False, ()), (True, False, ()), (False, True, ()),
             (True, True, ()), (False, False, (0.9, 1.1)),
             (True, True, (0.9, 1.1)))
    for tta, refl, scales in cases:
        pred = build_predictor(
            model, params, max_trace_len=64, confidence_threshold=0.1,
            nms_threshold=0.3, tta_rotations=tta, tta_reflect=refl,
            tta_scales=scales, verbose=False)
        outs[(tta, refl, scales)] = pred(arr)
    assert all(len(v) == 1 for v in outs.values())
    a = outs[cases[0]][0]
    for case in cases[1:]:
        b = outs[case][0]
        assert a["label"] == b["label"]
        for key in ("center", "size"):
            for ax in ("x", "y", "z"):
                np.testing.assert_allclose(a[key][ax], b[key][ax],
                                           atol=1e-5)


def test_ensemble_checkpoint_pooling(tmp_path):
    """calibrate._forward_val_set with a comma-separated checkpoint list
    pools candidates along the query axis: same checkpoint twice ->
    [N, 2Q] arrays whose halves are identical."""
    from room_slam_tpu.config import DataConfig, ExperimentConfig, \
        TrainConfig
    from room_slam_tpu.data.synthetic import write_synthetic_dataset
    from room_slam_tpu.models.factory import build_model, init_params
    from room_slam_tpu.tools.calibrate import _forward_val_set
    from room_slam_tpu.train import checkpoint as ckpt_lib

    cfg = ExperimentConfig(
        data=DataConfig(max_trace_len=128, max_colliders=16),
        model=ModelConfig(model_type="lstm", d_model=32, num_queries=8,
                          lstm_layers=1, use_pallas_rnn=False),
        train=TrainConfig(batch_size=4),
    )
    model = build_model(cfg.model)
    params = init_params(model, cfg.model, seq_len=cfg.data.max_trace_len)
    write_synthetic_dataset(str(tmp_path / "data"), 2, 128, seed=5)
    for d in ("a", "b"):
        ckpt_lib.save_checkpoint(tmp_path / d / "best_model", params,
                                 config=cfg)

    single = _forward_val_set(str(tmp_path / "a" / "best_model"),
                              str(tmp_path / "data"), batch_size=4)
    ens = _forward_val_set(
        f"{tmp_path}/a/best_model,{tmp_path}/b/best_model",
        str(tmp_path / "data"), batch_size=4)
    Q = single["pred_boxes"].shape[1]
    assert ens["pred_boxes"].shape[1] == 2 * Q
    np.testing.assert_array_equal(ens["pred_boxes"][:, :Q],
                                  ens["pred_boxes"][:, Q:])
    np.testing.assert_array_equal(ens["pred_boxes"][:, :Q],
                                  single["pred_boxes"])
    assert ens["pred_logits"].shape[1] == 2 * Q
    # gt/raw side untouched by pooling
    np.testing.assert_array_equal(ens["gt_boxes"], single["gt_boxes"])

    # dihedral TTA pooling: 4 rotations x 2 mirrors = 8 views along the
    # query axis; view order puts the un-mirrored k=0 view first, so the
    # leading Q columns equal the plain forward
    d8 = _forward_val_set(str(tmp_path / "a" / "best_model"),
                          str(tmp_path / "data"), batch_size=4,
                          tta=True, tta_reflect=True)
    assert d8["pred_boxes"].shape[1] == 8 * Q
    assert d8["pred_logits"].shape[1] == 8 * Q
    np.testing.assert_allclose(d8["pred_boxes"][:, :Q],
                               single["pred_boxes"], atol=1e-6)
    refl_only = _forward_val_set(str(tmp_path / "a" / "best_model"),
                                 str(tmp_path / "data"), batch_size=4,
                                 tta=False, tta_reflect=True)
    assert refl_only["pred_boxes"].shape[1] == 2 * Q
    # scale views multiply the count: (1 + len(scales)) x mirrors
    scaled = _forward_val_set(str(tmp_path / "a" / "best_model"),
                              str(tmp_path / "data"), batch_size=4,
                              tta=False, tta_reflect=True,
                              tta_scales=(0.9, 1.1))
    assert scaled["pred_boxes"].shape[1] == 6 * Q

    # temporal windows are extra input variants: full + 2 windows -> 3Q,
    # with the full-trace candidates leading; cached raw stays full-trace
    from room_slam_tpu.tools.calibrate import window_fractions

    assert window_fractions(1) == []
    fr = window_fractions(2)
    assert len(fr) == 2 and fr[0][0] == 0.0 and fr[1][1] == 1.0
    assert fr[0][1] > fr[1][0]  # overlap
    win = _forward_val_set(str(tmp_path / "a" / "best_model"),
                           str(tmp_path / "data"), batch_size=4,
                           tta_windows=2)
    assert win["pred_boxes"].shape[1] == 3 * Q
    np.testing.assert_array_equal(win["pred_boxes"][:, :Q],
                                  single["pred_boxes"])
    np.testing.assert_array_equal(win["raw"], single["raw"])
