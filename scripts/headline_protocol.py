#!/usr/bin/env python
"""Multi-session headline throughput protocol (VERDICT r4 item 1).

The headline metric's round-3/4 captures disagreed by ~9-14% (BENCH_r03
5.28e8, RESULTS 5.30e8, round-4 same-day XLA A/B 4.57e8, BENCH_r04
4.84e8).  The round-5 interleaved A/B (scripts/mul_exp_ab.py) showed the
``mul_exp`` arithmetic accounts for <~1% of that — the spread is
SESSION-level variance of the axon-tunneled chip (clock/queueing state
that is constant within a session and differs between sessions, plus
occasional full startup stalls).

Protocol: run ``bench.py`` N times as SEPARATE processes (fresh backend
session each, bench.py's own watchdog handles tunnel stalls), separated
by ``--gap`` seconds, and report per-session values plus the median —
the number RESULTS.md quotes.  A single-session capture is NOT a
reproducible headline statement; the recorded protocol is
``median of >= 3 separated sessions``.

Usage: python scripts/headline_protocol.py [--sessions 3] [--gap 60]
                                           [-- bench args...]
"""
import argparse
import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sessions", type=int, default=3)
    p.add_argument("--gap", type=float, default=60.0)
    p.add_argument("bench_args", nargs="*", default=[])
    args = p.parse_args()

    values = []
    records = []
    for s in range(args.sessions):
        if s:
            time.sleep(args.gap)
        proc = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")] + args.bench_args,
            text=True, capture_output=True)
        line = None
        for ln in proc.stdout.splitlines():
            ln = ln.strip()
            if ln.startswith("{"):
                line = json.loads(ln)
        if line is None:
            print(f"session {s}: bench failed rc={proc.returncode}\n"
                  f"{proc.stderr[-2000:]}", file=sys.stderr, flush=True)
            continue
        values.append(line["value"])
        records.append(line)
        print(f"session {s}: {line['value']:.4e}  ({line['metric']})",
              flush=True)

    if not values:
        sys.exit("no successful sessions")
    med = statistics.median(values)
    print(json.dumps({
        "metric": records[0]["metric"] + "_median",
        "value": med,
        "unit": records[0]["unit"] + f", median of {len(values)} sessions",
        "sessions": values,
        "spread_pct": (max(values) - min(values)) / med * 100,
    }), flush=True)


if __name__ == "__main__":
    main()
