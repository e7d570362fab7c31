#!/usr/bin/env python
"""One-shot TPU benchmark sweep: headline oracle + GDINO + train step.

Runs the three benchmark entry points as SEQUENTIAL subprocesses (the axon
tunnel allows one JAX process at a time) and writes a combined JSON report.
Each stage is individually timed out and failure-tolerant, so a wedged
tunnel yields a partial report instead of a hang.

Usage: python tools/bench_all.py [--out /tmp/bench_all.json] [--timeout S]
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

STAGES = [
    ("headline", [sys.executable, "bench.py"]),
    ("gdino_800", [sys.executable, "tools/bench_gdino.py"]),
    ("train_step", [sys.executable, "tools/bench_train.py"]),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/bench_all.json")
    ap.add_argument("--timeout", type=int, default=1800,
                    help="per-stage timeout (s); first compiles dominate")
    args = ap.parse_args()

    report = {}
    for name, cmd in STAGES:
        t0 = time.time()
        try:
            proc = subprocess.run(
                cmd, cwd=REPO, capture_output=True, text=True,
                timeout=args.timeout,
            )
            tail = (proc.stdout or "").strip().splitlines()[-8:]
            report[name] = {
                "rc": proc.returncode,
                "seconds": round(time.time() - t0, 1),
                "tail": tail,
            }
        except subprocess.TimeoutExpired:
            report[name] = {
                "rc": "timeout",
                "seconds": round(time.time() - t0, 1),
            }
        print(f"[{name}] {report[name]}", flush=True)

    Path(args.out).write_text(json.dumps(report, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
