"""UDP ingest round-trip and native parser parity."""

import json
import socket
import threading

import numpy as np
import pytest

from room_slam_tpu.data import formats, ingest


def _free_port():
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_udp_replay_record_roundtrip(tmp_path):
    """replay (the phone's test double) -> record -> same positions.

    Exercises the documented wire format and the handedness flip
    (FaceReceiver.cs:51-53): replay un-flips z, record re-flips it, so the
    recorded trace matches the original."""
    src = np.array(
        [[0.1, 0.2, 0.3, 0.0],
         [0.4, 0.5, 0.6, 0.033],
         [0.7, 0.8, 0.9, 0.066]], dtype=np.float32)
    trace_file = tmp_path / "trace.json"
    formats.save_trace_json(trace_file, src)

    port = _free_port()
    result = {}

    def recorder():
        result["path"] = ingest.record(
            out_dir=tmp_path, host="127.0.0.1", port=port,
            duration=3.0, max_points=3)

    th = threading.Thread(target=recorder)
    th.start()
    import time

    time.sleep(0.3)  # let the socket bind
    n = ingest.replay(str(trace_file), host="127.0.0.1", port=port, hz=0)
    th.join(timeout=5)
    assert n == 3
    rec = formats.load_trace_json(result["path"])
    assert rec.shape == (3, 4)
    np.testing.assert_allclose(rec[:, :3], src[:, :3], atol=1e-6)
    # recorded timestamps are relative and non-decreasing
    assert rec[0, 3] == 0.0
    assert np.all(np.diff(rec[:, 3]) >= 0)


def test_udp_listen_counts(tmp_path):
    port = _free_port()
    result = {}

    def listener():
        result["n"] = ingest.listen("127.0.0.1", port, max_packets=2)

    th = threading.Thread(target=listener)
    th.start()
    import time

    time.sleep(0.2)
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.sendto(b'{"x": 1}', ("127.0.0.1", port))
    s.sendto(b'{"x": 2}', ("127.0.0.1", port))
    th.join(timeout=5)
    assert result["n"] == 2


def test_native_parser_parity(tmp_path):
    from room_slam_tpu.native import trace_parser

    rows = [{"timestamp": float(i) * 0.1, "x": float(i), "y": -float(i),
             "z": float(i) * 2} for i in range(100)]
    p = tmp_path / "t.json"
    p.write_text(json.dumps(rows))
    native = trace_parser.parse_trace_file(str(p))
    if native is None:
        pytest.skip("native parser unavailable (no g++)")
    py = formats.parse_trace_records(rows)
    np.testing.assert_allclose(native, py, rtol=1e-6)

    # dict-wrapped variant
    p2 = tmp_path / "t2.json"
    p2.write_text(json.dumps({"traces": rows}))
    native2 = trace_parser.parse_trace_file(str(p2))
    np.testing.assert_allclose(native2, py, rtol=1e-6)

    # malformed input falls back (returns None), doesn't crash
    p3 = tmp_path / "bad.json"
    p3.write_text("{unclosed")
    assert trace_parser.parse_trace_file(str(p3)) is None

    # a metadata OBJECT carrying x/y/z/timestamp keys must not inject a
    # phantom row: rows are only accepted from array elements, anything
    # else is a parse anomaly (None -> python fallback)
    p4 = tmp_path / "meta.json"
    p4.write_text(json.dumps(
        {"origin": {"x": 9.0, "y": 9.0, "z": 9.0, "timestamp": 0.0},
         "traces": rows}))
    assert trace_parser.parse_trace_file(str(p4)) is None

    # mismatched brackets are an anomaly too
    p5 = tmp_path / "mismatch.json"
    p5.write_text('[{"x": 1, "y": 2, "z": 3, "timestamp": 0}}')
    assert trace_parser.parse_trace_file(str(p5)) is None


def test_load_trace_json_uses_native_or_python(tmp_path):
    """formats.load_trace_json must give identical results either way."""
    rows = [{"timestamp": 0.5, "x": 1.25, "y": 2.5, "z": -3.75}]
    p = tmp_path / "t.json"
    p.write_text(json.dumps(rows))
    arr = formats.load_trace_json(p)
    np.testing.assert_allclose(
        arr, [[1.25, 2.5, -3.75, 0.5]], rtol=1e-6)


def test_live_inference_over_udp(tmp_path):
    """replay -> live: streamed poses produce a predictions JSON via the
    shared fixed-shape predictor (ingest.py live, the reference's
    FaceReceiver only shows the live marker — FaceReceiver.cs:64-83)."""
    import jax
    import jax.numpy as jnp

    from room_slam_tpu.config import (DataConfig, ExperimentConfig,
                                      ModelConfig)
    from room_slam_tpu.models.factory import build_model, init_params
    from room_slam_tpu.train.checkpoint import save_checkpoint

    cfg = ExperimentConfig(
        data=DataConfig(max_trace_len=64, max_colliders=8),
        model=ModelConfig(model_type="lstm", d_model=16, num_queries=4,
                          lstm_layers=1, use_pallas_rnn=False,
                          objectness=True))
    model = build_model(cfg.model)
    params = init_params(model, cfg.model, seq_len=64)
    ckpt = tmp_path / "ck" / "best_model"
    save_checkpoint(ckpt, params, config=cfg)

    rng = np.random.default_rng(3)
    src = np.column_stack([
        rng.normal(size=(40, 3)).astype(np.float32),
        np.cumsum(rng.uniform(0.02, 0.05, size=40)).astype(np.float32)])
    trace_file = tmp_path / "trace.json"
    formats.save_trace_json(trace_file, src)

    port = _free_port()
    out_json = tmp_path / "live_preds.json"
    result = {}

    def runner():
        result["preds"] = ingest.live(
            str(ckpt), host="127.0.0.1", port=port, interval=0.2,
            min_points=10, duration=30.0, max_points=40,
            output=str(out_json), threshold=0.0)

    th = threading.Thread(target=runner)
    th.start()
    import time

    time.sleep(1.0)  # model load + socket bind
    ingest.replay(str(trace_file), host="127.0.0.1", port=port, hz=0)
    th.join(timeout=120)
    assert not th.is_alive()
    assert "preds" in result
    saved = json.loads(out_json.read_text())
    assert "colliders" in saved
    # threshold 0 with an untrained model: every query slot survives NMS or
    # not, but the pipeline must produce well-formed collider dicts
    for c in saved["colliders"]:
        assert set(c) >= {"label", "center", "size", "confidence"}
