"""Checkpoint-manifest watcher — the analogue of the reference's Pregel
status poller (watch_Pregel.py:24-33 / start_Pregel.py:123-164): polls a
checkpoint root and prints per-stage progress until interrupted, and on
``--once`` (or exit) prints the consolidated end-of-run report — the
per-stage totals table the reference prints after the final GSS
(start_Pregel.py:123-164).

Usage: python scripts/watch.py <checkpoint_root> [--sleep-time 2] [--once]
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
        try:
            with open(os.path.join(dirpath, "_MANIFEST.json")) as f:
                m = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue  # a commit is mid-write; the next poll will see it
        s = stages.setdefault(m["stage"], {"rows": 0, "shards": 0,
                                           "wall_sec": 0.0, "files": 0})
        s["rows"] += m.get("rows", 0)
        s["shards"] += 1
        s["files"] += m.get("files", 0)
        s["wall_sec"] = round(s["wall_sec"] + m.get("write_wall_sec", 0), 2)
    return stages


# stage display order follows the pipeline's dataflow
_STAGE_ORDER = ["records", "linked", "pairs", "triples", "entities"]


def report(root: str) -> str:
    """Consolidated per-stage totals for a (possibly finished) run."""
    stages = snapshot(root)
    order = [s for s in _STAGE_ORDER if s in stages] + sorted(
        s for s in stages if s not in _STAGE_ORDER)
    lines = [f"run report: {root}",
             f"{'stage':<10} {'shards':>6} {'files':>6} {'rows':>12} "
             f"{'write_s':>8} {'rows/s':>10}"]
    tot_rows = tot_wall = 0.0
    for s in order:
        m = stages[s]
        rate = m["rows"] / m["wall_sec"] if m["wall_sec"] else float("inf")
        lines.append(f"{s:<10} {m['shards']:>6} {m['files']:>6} "
                     f"{m['rows']:>12,} {m['wall_sec']:>8.2f} "
                     f"{rate:>10,.0f}")
        tot_rows += m["rows"]
        tot_wall += m["wall_sec"]
    lines.append(f"{'TOTAL':<10} {'':>6} {'':>6} {int(tot_rows):>12,} "
                 f"{tot_wall:>8.2f}")
    res = os.path.join(root, "resolution.json")
    if os.path.exists(res):
        with open(res) as f:
            n_map = len(json.load(f).get("map", {}))
        lines.append(f"resolution map: {n_map:,} surfaces")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint_root")
    ap.add_argument("--sleep-time", type=float, default=2.0,
                    help="poll interval (the reference's --sleep_time)")
    ap.add_argument("--once", action="store_true",
                    help="print one snapshot + the final report and exit")
    args = ap.parse_args()
    prev = None
    try:
        while True:
            snap = snapshot(args.checkpoint_root)
            if snap != prev:
                print(json.dumps({"t": round(time.time(), 1),
                                  "stages": snap}))
                prev = snap
            if args.once:
                break
            time.sleep(args.sleep_time)
    except KeyboardInterrupt:
        pass
    print(report(args.checkpoint_root))


if __name__ == "__main__":
    main()
