"""End-to-end CLI tests: drive the public entry points as subprocesses on
the CPU backend (tiny sizes). These guard the argument wiring and the
surface auto-detection — the unit suite can't see argparse regressions."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent

ENV = {
    **os.environ,
    "JAX_PLATFORM_NAME": "cpu",
    "JAX_PLATFORMS": "cpu",
    # unset -> the axon sitecustomize skips TPU-plugin registration
    # entirely. Without this, its get_backend hook initializes the axon
    # client even under JAX_PLATFORMS=cpu, and every subprocess BLOCKS
    # whenever the remote TPU worker is down.
    "PALLAS_AXON_POOL_IPS": "",
}


def run_cli(*args, timeout=600):
    return subprocess.run(
        [sys.executable, *args], cwd=REPO, env=ENV, timeout=timeout,
        capture_output=True, text=True)


@pytest.fixture(scope="module")
def legacy_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("legacy")
    r = run_cli("train.py", "--create_sample_data", "--data_dir", str(d),
                "--num_sample_traces", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    return d


def test_legacy_train_evaluate_cli(legacy_data, tmp_path):
    ckpt_dir = tmp_path / "ck"
    r = run_cli("train.py", "--data_dir", str(legacy_data), "--epochs", "2",
                "--batch_size", "8", "--save_dir", str(ckpt_dir))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "auto-detected surface: legacy" in r.stdout
    assert (ckpt_dir / "best_model_legacy.msgpack").exists()

    r = run_cli("evaluate.py", "--checkpoint",
                str(ckpt_dir / "best_model_legacy"),
                "--data_dir", str(legacy_data), "--compare_baseline",
                "--threshold", "0.2")
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout[r.stdout.index("{"):])
    assert "mAP" in out and "baseline_mAP" in out


def test_bench_surface_train_infer_cli(tmp_path):
    # tiny synthetic bench-surface dataset on disk -> train -> inference
    r = run_cli("-c",
                "from room_slam_tpu.data.synthetic import "
                "write_synthetic_dataset; "
                f"write_synthetic_dataset(r'{tmp_path}/data', 3, 200, seed=1)")
    assert r.returncode == 0, r.stderr[-2000:]

    ckpt_dir = tmp_path / "ck"
    r = run_cli("train.py", "--surface", "bench",
                "--data_dir", str(tmp_path / "data"),
                "--val_dir", str(tmp_path / "data"),
                "--epochs", "2", "--batch_size", "4",
                "--max_trace_len", "200", "--d_model", "32",
                "--num_queries", "8", "--no_fused",
                "--save_dir", str(ckpt_dir))
    assert r.returncode == 0, r.stderr[-2000:]
    assert (ckpt_dir / "best_model.msgpack").exists()
    assert (ckpt_dir / "history.jsonl").exists()

    trace = next((tmp_path / "data").glob("*_trace.json"))
    r = run_cli("inference.py", "--checkpoint", str(ckpt_dir / "best_model"),
                "--input", str(trace), "--threshold", "0.1",
                "--output", str(tmp_path / "preds.json"))
    assert r.returncode == 0, r.stderr[-2000:]
    preds = json.loads((tmp_path / "preds.json").read_text())
    assert "colliders" in preds and "metadata" in preds


def test_demo_cli(tmp_path):
    r = run_cli("demo.py", "--n_rooms", "1", "--num_steps", "400",
                "--output", str(tmp_path / "demo.json"))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "baseline predicted" in r.stdout
    out = json.loads((tmp_path / "demo.json").read_text())
    assert out["results"][0]["objects"] is not None


def test_visualize_cli(tmp_path):
    r = run_cli("-c",
                "from room_slam_tpu.data.synthetic import "
                "write_synthetic_dataset; "
                f"write_synthetic_dataset(r'{tmp_path}', 1, 100, seed=2)")
    assert r.returncode == 0, r.stderr[-2000:]
    trace = next(Path(tmp_path).glob("*_trace.json"))
    coll = next(Path(tmp_path).glob("*_collider.json"))
    r = run_cli("visualize.py", "--input", str(trace),
                "--colliders", str(coll),
                "--output", str(tmp_path / "viz.png"), "--side_view")
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "viz.png").stat().st_size > 10_000


def test_realbench_and_honest_calibration_cli(tmp_path):
    """realbench: pooled multi-capture benchmark with bootstrap CI, operating
    point chosen on a SEPARATE calibration dir; calibrate --eval_dir: sweep
    on A, score the chosen cell on untouched B."""
    for name, seed in (("a", 11), ("b", 12), ("calib", 13)):
        r = run_cli("-c",
                    "from room_slam_tpu.data.synthetic import "
                    "write_synthetic_dataset; "
                    f"write_synthetic_dataset(r'{tmp_path}/{name}', 2, 200, "
                    f"seed={seed})")
        assert r.returncode == 0, r.stderr[-2000:]

    ckpt_dir = tmp_path / "ck"
    r = run_cli("train.py", "--surface", "bench",
                "--data_dir", str(tmp_path / "a"),
                "--val_dir", str(tmp_path / "b"),
                "--epochs", "2", "--batch_size", "4",
                "--max_trace_len", "200", "--d_model", "32",
                "--num_queries", "8", "--no_fused",
                "--save_dir", str(ckpt_dir))
    assert r.returncode == 0, r.stderr[-2000:]

    out = tmp_path / "rb.json"
    r = run_cli("-m", "room_slam_tpu.tools.realbench",
                "--checkpoint", str(ckpt_dir / "best_model"),
                "--dirs", f"{tmp_path}/a,{tmp_path}/b",
                "--calib_dir", str(tmp_path / "calib"),
                "--bootstrap", "50", "--output", str(out))
    assert r.returncode == 0, r.stderr[-2000:]
    rb = json.loads(out.read_text())
    assert len(rb["captures"]) == 4
    assert rb["operating_point"]["calibrated_on"] == str(tmp_path / "calib")
    assert "mAP@0.25" in rb["aggregate"]
    assert rb["bootstrap"]["mAP@0.25"]["lo"] <= rb["bootstrap"]["mAP@0.25"]["hi"]

    r = run_cli("-m", "room_slam_tpu.tools.calibrate",
                "--checkpoint", str(ckpt_dir / "best_model"),
                "--data_dir", str(tmp_path / "calib"),
                "--eval_dir", str(tmp_path / "b"),
                "--thresholds", "0.3,0.5", "--nms", "0.3",
                "--refine", "none", "--output", str(tmp_path / "cal.json"))
    assert r.returncode == 0, r.stderr[-2000:]
    cal = json.loads((tmp_path / "cal.json").read_text())
    assert cal["best"]["scored_on"] == str(tmp_path / "b")
    assert cal["best"]["calibrated_on"] == str(tmp_path / "calib")

    # per-GT zero-shot failure decomposition on the untouched dir: every GT
    # box gets a ceiling class, a best-IoU row, and the miss buckets add up
    r = run_cli("-m", "room_slam_tpu.tools.diagnose_zeroshot",
                "--checkpoint", str(ckpt_dir / "best_model"),
                "--zero_shot_dir", str(tmp_path / "b"),
                "--nms", "0.3", "--fuse",
                "--output", str(tmp_path / "diag.json"))
    assert r.returncode == 0, r.stderr[-2000:]
    diag = json.loads((tmp_path / "diag.json").read_text())
    assert len(diag["captures"]) == 2
    agg = diag["aggregate"]["all"]
    assert agg["n"] == sum(len(c["boxes"]) for c in diag["captures"])
    assert agg["hit@0.25"] + agg["near_miss"] + agg["no_candidate"] == agg["n"]
    for c in diag["captures"]:
        for row in c["boxes"]:
            assert row["ceiling"] in ("contacted", "plane_inferable",
                                      "unrecoverable")
            assert 0.0 <= row["best_iou"] <= row["best_iou_anyclass"] + 1e-9
