"""Checkpoint-manifest watcher — the analogue of the reference's Pregel
status poller (watch_Pregel.py:24-33 / start_Pregel.py:123-164): polls a
checkpoint root and prints per-stage progress until all expected stages
are done or interrupted.

Usage: python scripts/watch.py <checkpoint_root> [--sleep-time 2]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def snapshot(root: str) -> dict:
    stages: dict[str, dict] = {}
    for dirpath, _d, filenames in os.walk(root):
        if "_MANIFEST.json" not in filenames:
            continue
        with open(os.path.join(dirpath, "_MANIFEST.json")) as f:
            m = json.load(f)
        s = stages.setdefault(m["stage"], {"rows": 0, "shards": 0,
                                           "wall_sec": 0.0})
        s["rows"] += m.get("rows", 0)
        s["shards"] += 1
        s["wall_sec"] = round(s["wall_sec"] + m.get("write_wall_sec", 0), 2)
    return stages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint_root")
    ap.add_argument("--sleep-time", type=float, default=2.0,
                    help="poll interval (the reference's --sleep_time)")
    ap.add_argument("--once", action="store_true")
    args = ap.parse_args()
    prev = None
    while True:
        snap = snapshot(args.checkpoint_root)
        if snap != prev:
            print(json.dumps({"t": round(time.time(), 1), "stages": snap}))
            prev = snap
        if args.once:
            break
        time.sleep(args.sleep_time)


if __name__ == "__main__":
    main()
