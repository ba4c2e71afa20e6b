"""UDP pose ingestion — host-side replacement for the reference's Unity
receiver + iOS sender + debug listener.

Wire format (documented from the reference, ref: sender/SLAM World
Sender/ContentView.swift:115-130 and collector/Assets/src/FaceReceiver.cs:41-62):
one JSON object per UDP datagram on port 4399:

    {"x": 0.12, "y": 1.43, "z": -0.88,
     "qx": 0.0, "qy": 0.0, "qz": 0.0, "qw": 1.0}

positions in ARKit's right-handed frame; the receiver flips handedness into
Unity's left-handed frame (z -> -z, qz -> -qz, qw -> -qw, FaceReceiver.cs:51-53).

Subcommands:
    listen  — print incoming packets (ref: test/udp_listener.py)
    record  — receive poses, apply the handedness flip, write
              ``human_data_YYYYMMDD_HHMMSS.json`` rows
              {timestamp, x, y, z} (ref: FaceReceiver.cs:64-133)
    replay  — stream a recorded/synthetic trace back out as pose packets at a
              configurable rate (the reference's iOS sender rate-limits to
              1-60 Hz, default 30 — ContentView.swift:108-112); serves as the
              test double for the phone
    live    — record AND run the model on the growing trace every
              ``--interval`` seconds, printing the current room estimate and
              (optionally) rewriting a predictions JSON. The reference only
              visualizes the live pose marker (FaceReceiver.cs:64-83); here
              the fixed-shape jitted forward (one compile, reused every
              refresh) makes live room inference practical while walking.
"""

from __future__ import annotations

import argparse
import json
import socket
import time
from datetime import datetime
from pathlib import Path
from typing import List, Optional

DEFAULT_PORT = 4399  # FaceReceiver.cs:12


def listen(host: str = "0.0.0.0", port: int = DEFAULT_PORT,
           max_packets: Optional[int] = None) -> int:
    """Debug echo listener (ref: test/udp_listener.py:1-19)."""
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind((host, port))
    print(f"Listening on {host}:{port} ... Ctrl+C to stop")
    n = 0
    try:
        while max_packets is None or n < max_packets:
            data, addr = sock.recvfrom(4096)
            print(f"[{addr[0]}:{addr[1]}] {data.decode(errors='replace')}")
            n += 1
    except KeyboardInterrupt:
        pass
    finally:
        sock.close()
    return n


def record(
    out_dir: str = ".",
    host: str = "0.0.0.0",
    port: int = DEFAULT_PORT,
    duration: Optional[float] = None,
    max_points: Optional[int] = None,
    flip_handedness: bool = True,
) -> Path:
    """Receive pose packets and write a trace JSON.

    Timestamps are seconds since the first packet (the Unity receiver uses
    ``Time.time``, also a relative clock — FaceReceiver.cs:77-83).
    """
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind((host, port))
    sock.settimeout(0.5)
    print(f"Recording poses from {host}:{port} "
          f"(duration={duration}, max_points={max_points}) ...")
    rows: List[dict] = []
    t_start = None
    t_send0 = None
    t_wall = time.monotonic()
    try:
        while True:
            if duration is not None and time.monotonic() - t_wall > duration:
                break
            if max_points is not None and len(rows) >= max_points:
                break
            try:
                data, _ = sock.recvfrom(4096)
            except socket.timeout:
                continue
            try:
                pose = json.loads(data)
            except json.JSONDecodeError:
                continue
            now = time.monotonic()
            # prefer the sender-side clock when the packet carries one
            # (our replay extension) — receive time is distorted whenever
            # packets queue in the kernel buffer
            ts = pose.get("timestamp")
            if ts is not None:
                if t_send0 is None:
                    t_send0 = float(ts)
                t_rel = float(ts) - t_send0
            else:
                if t_start is None:
                    t_start = now
                t_rel = now - t_start
            z = float(pose.get("z", 0.0))
            rows.append({
                "timestamp": t_rel,
                "x": float(pose.get("x", 0.0)),
                "y": float(pose.get("y", 0.0)),
                "z": -z if flip_handedness else z,
            })
    except KeyboardInterrupt:
        pass
    finally:
        sock.close()

    stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    out = Path(out_dir) / f"human_data_{stamp}.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(rows, f)
    print(f"Recorded {len(rows)} poses -> {out}")
    return out


def replay(
    trace_file: str,
    host: str = "127.0.0.1",
    port: int = DEFAULT_PORT,
    hz: float = 30.0,
    realtime: bool = False,
    flip_handedness: bool = True,
) -> int:
    """Stream a trace file out as pose packets (the phone's test double)."""
    from room_slam_tpu.data import formats

    arr = formats.sort_by_time(formats.load_trace_json(trace_file))
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    n = 0
    period = 1.0 / hz if hz > 0 else 0.0
    for x, y, z, t in arr:
        pose = {
            "x": float(x), "y": float(y),
            # undo the receiver-side flip so record() round-trips
            "z": float(-z) if flip_handedness else float(z),
            "qx": 0.0, "qy": 0.0, "qz": 0.0, "qw": 1.0,
            # sender-side clock (extension over the reference wire format):
            # receivers prefer it over receive time, so queued bursts keep
            # their true inter-point dt
            "timestamp": float(t),
        }
        sock.sendto(json.dumps(pose).encode(), (host, port))
        n += 1
        if realtime and period:
            time.sleep(period)
    sock.close()
    return n


def live(
    checkpoint: str,
    host: str = "0.0.0.0",
    port: int = DEFAULT_PORT,
    interval: float = 2.0,
    min_points: int = 50,
    duration: Optional[float] = None,
    max_points: Optional[int] = None,
    output: Optional[str] = None,
    threshold: float = 0.5,
    nms: float = 0.3,
    refine: Optional[float] = None,
    extent_slack: Optional[float] = None,
    consensus: bool = False,
    tta: bool = False,
    tta_reflect: bool = False,
    flip_handedness: bool = True,
) -> list:
    """Streamed room inference: accumulate poses like ``record`` and rerun
    the predictor on the full trace-so-far every ``interval`` seconds.

    Returns the final prediction list. The predictor pads/downsamples to the
    checkpoint's fixed max_trace_len, so every refresh after the first
    reuses one compiled program (room_slam_tpu/predictor.py)."""
    import numpy as np

    from room_slam_tpu.data import formats
    from room_slam_tpu.predictor import build_predictor
    from room_slam_tpu.train.driver import load_model_for_inference

    # bind BEFORE the (slow) model load so early packets queue in the
    # kernel receive buffer instead of being dropped
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind((host, port))
    t_bind = time.monotonic()
    sock.settimeout(0.2)

    print(f"Loading model from {checkpoint}")
    model, params, cfg = load_model_for_inference(checkpoint)
    predict_array = build_predictor(
        model, params, max_trace_len=cfg.data.max_trace_len,
        confidence_threshold=threshold, nms_threshold=nms,
        refine_clearance=refine, extent_slack=extent_slack,
        consensus=consensus, tta_rotations=tta, tta_reflect=tta_reflect,
        verbose=False)
    print(f"Live inference on {host}:{port} "
          f"(refresh every {interval}s once {min_points}+ points) ...")
    rows: List[List[float]] = []  # [x, y, z, t]
    preds: list = []
    t_start = None
    t_send0 = None

    def add_pose(pose: dict, recv_t: float) -> None:
        nonlocal t_start, t_send0
        # sender-side clock (when present) keeps true inter-point dt even
        # when packets queued in the kernel buffer; receive times of a
        # drained burst are near-identical and would blow up the
        # diff(pos)/clip(dt) velocity features downstream
        ts = pose.get("timestamp")
        if ts is not None:
            if t_send0 is None:
                t_send0 = float(ts)
            t_rel = float(ts) - t_send0
        else:
            if t_start is None:
                t_start = recv_t
            t_rel = recv_t - t_start
        z = float(pose.get("z", 0.0))
        rows.append([
            float(pose.get("x", 0.0)),
            float(pose.get("y", 0.0)),
            -z if flip_handedness else z,
            t_rel,
        ])

    # Drain the backlog that queued during the model load: those packets
    # all *arrive* now in one burst, so back-date their receive times
    # uniformly over the load window (timestamp-carrying packets are exact
    # regardless).
    t_loaded = time.monotonic()
    burst: List[dict] = []
    sock.setblocking(False)
    while True:
        try:
            data, _ = sock.recvfrom(4096)
        except (BlockingIOError, OSError):
            break
        try:
            burst.append(json.loads(data))
        except json.JSONDecodeError:
            continue
    sock.settimeout(0.2)
    for i, pose in enumerate(burst):
        frac = (i + 1) / len(burst)
        add_pose(pose, t_bind + frac * (t_loaded - t_bind))

    t_wall = time.monotonic()
    last_run = t_wall

    def refresh(now: float) -> list:
        p = predict_array(np.asarray(rows, dtype=np.float32))
        summary = ", ".join(
            f"{d['label']}@({d['center']['x']:.1f},{d['center']['z']:.1f})"
            f":{d['confidence']:.2f}" for d in p[:6])
        print(f"[t={now - t_wall:6.1f}s n={len(rows):5d}] "
              f"{len(p)} colliders  {summary}")
        if output:
            formats.save_predictions_json(output, p, threshold, nms)
        return p

    try:
        while True:
            now = time.monotonic()
            if duration is not None and now - t_wall > duration:
                break
            if max_points is not None and len(rows) >= max_points:
                break
            try:
                data, _ = sock.recvfrom(4096)
            except socket.timeout:
                data = None
            if data is not None:
                try:
                    pose = json.loads(data)
                except json.JSONDecodeError:
                    pose = None
                if pose is not None:
                    add_pose(pose, now)
            if len(rows) >= min_points and now - last_run >= interval:
                preds = refresh(now)
                last_run = time.monotonic()
    except KeyboardInterrupt:
        pass
    finally:
        sock.close()

    if len(rows) >= min_points:
        preds = refresh(time.monotonic())
    print(f"Final estimate: {len(preds)} colliders from {len(rows)} poses")
    return preds


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pl = sub.add_parser("listen")
    pl.add_argument("--host", default="0.0.0.0")
    pl.add_argument("--port", type=int, default=DEFAULT_PORT)
    pl.add_argument("--max_packets", type=int, default=None)

    pr = sub.add_parser("record")
    pr.add_argument("--out_dir", default=".")
    pr.add_argument("--host", default="0.0.0.0")
    pr.add_argument("--port", type=int, default=DEFAULT_PORT)
    pr.add_argument("--duration", type=float, default=None)
    pr.add_argument("--max_points", type=int, default=None)

    ps = sub.add_parser("replay")
    ps.add_argument("trace_file")
    ps.add_argument("--host", default="127.0.0.1")
    ps.add_argument("--port", type=int, default=DEFAULT_PORT)
    ps.add_argument("--hz", type=float, default=30.0)
    ps.add_argument("--realtime", action="store_true")

    pv = sub.add_parser("live")
    pv.add_argument("--checkpoint", required=True)
    pv.add_argument("--host", default="0.0.0.0")
    pv.add_argument("--port", type=int, default=DEFAULT_PORT)
    pv.add_argument("--interval", type=float, default=2.0,
                    help="seconds between model refreshes")
    pv.add_argument("--min_points", type=int, default=50)
    pv.add_argument("--duration", type=float, default=None)
    pv.add_argument("--max_points", type=int, default=None)
    pv.add_argument("--output", default=None,
                    help="predictions JSON, rewritten at each refresh")
    pv.add_argument("--threshold", type=float, default=0.5)
    pv.add_argument("--nms", type=float, default=0.3)
    pv.add_argument("--refine", type=float, default=None,
                    metavar="CLEARANCE")
    pv.add_argument("--extent_slack", type=float, default=None,
                    metavar="METERS")
    pv.add_argument("--consensus", action="store_true")
    pv.add_argument("--tta", action="store_true",
                    help="4-way rotation test-time augmentation per "
                         "refresh (see predictor.build_predictor)")
    pv.add_argument("--tta_reflect", action="store_true",
                    help="also pool the x-mirrored copy of every TTA view "
                         "(8-view dihedral pooling with --tta)")

    args = p.parse_args()
    if args.cmd == "listen":
        listen(args.host, args.port, args.max_packets)
    elif args.cmd == "record":
        record(args.out_dir, args.host, args.port, args.duration,
               args.max_points)
    elif args.cmd == "replay":
        n = replay(args.trace_file, args.host, args.port, args.hz,
                   args.realtime)
        print(f"Sent {n} pose packets")
    elif args.cmd == "live":
        live(args.checkpoint, args.host, args.port, args.interval,
             args.min_points, args.duration, args.max_points, args.output,
             args.threshold, args.nms, args.refine, args.extent_slack,
             args.consensus, args.tta, args.tta_reflect)


if __name__ == "__main__":
    main()
