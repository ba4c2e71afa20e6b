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
            if t_start is None:
                t_start = now
            z = float(pose.get("z", 0.0))
            rows.append({
                "timestamp": now - t_start,
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
        }
        sock.sendto(json.dumps(pose).encode(), (host, port))
        n += 1
        if realtime and period:
            time.sleep(period)
    sock.close()
    return n


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


if __name__ == "__main__":
    main()
