#!/usr/bin/env python
"""Job-level latency attribution from a Spark event log.

Usage: python scripts/joblog_profile.py <eventlog-dir-or-file> [cores]

Pairs with the bench knob `SPARK_GRAFT_EVENTLOG_DIR=/tmp/ev python
bench.py --crawl-rep 4`: reads the (possibly zstd-compressed, rolling
v2) event log and reports

  - total jobs and the union-of-job-spans wall coverage,
  - NO-JOB-RUNNING time (driver-serial plan construction / collect
    processing — the fixed-latency share no executor count can shrink),
  - the largest no-job gaps (these line up with the engine's
    CRAWLSPARK_TIMING=1 adm_plan/robots_parse_plan ticks),
  - in-job task occupancy vs `cores` (stage tails + scheduling slack).

This is the measurement behind BASELINE.md's "Event-log attribution of
the scaling fixed latency".
"""

import glob
import json
import os
import subprocess
import sys


def _read(path: str) -> str:
    if path.endswith(".zstd"):
        try:
            import zstandard as zstd

            with open(path, "rb") as fh:
                return zstd.ZstdDecompressor().stream_reader(fh).read().decode()
        except ImportError:
            return subprocess.run(
                ["zstd", "-dc", path], capture_output=True, check=True
            ).stdout.decode()
    with open(path) as fh:
        return fh.read()


def _event_files(target: str) -> list[str]:
    if os.path.isfile(target):
        return [target]
    # rolling v2 layout: <dir>/eventlog_v2_<app>/events_N_<app>[.zstd];
    # also accept a dir of plain single-file logs
    nested = sorted(glob.glob(os.path.join(target, "**", "events_*")))
    if nested:
        return [p for p in nested if not p.endswith(".crc")]
    return [
        p
        for p in sorted(glob.glob(os.path.join(target, "*")))
        if os.path.isfile(p) and not p.endswith(".crc")
    ]


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__.strip().splitlines()[2])
        return 2
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    jobs: dict[int, list] = {}
    task_ms = 0
    for path in _event_files(sys.argv[1]):
        for line in _read(path).splitlines():
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jobs[e["Job ID"]] = [e["Submission Time"], None]
            elif ev == "SparkListenerJobEnd" and e["Job ID"] in jobs:
                jobs[e["Job ID"]][1] = e["Completion Time"]
            elif ev == "SparkListenerTaskEnd":
                ti = e.get("Task Info") or {}
                if ti.get("Launch Time") and ti.get("Finish Time"):
                    task_ms += ti["Finish Time"] - ti["Launch Time"]
    spans = sorted(tuple(v) for v in jobs.values() if v[1])
    if not spans:
        print("no completed jobs found")
        return 1
    merged: list[tuple[int, int]] = []
    for a, b in spans:
        if merged and a <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], b))
        else:
            merged.append((a, b))
    t0, t1 = merged[0][0], merged[-1][1]
    covered = sum(b - a for a, b in merged)
    gaps = sorted(
        (merged[i + 1][0] - merged[i][1] for i in range(len(merged) - 1)),
        reverse=True,
    )
    print(f"jobs: {len(spans)}")
    print(
        f"wall {(t1 - t0) / 1e3:.1f}s  covered-by-jobs {covered / 1e3:.1f}s  "
        f"NO-JOB-RUNNING {(t1 - t0 - covered) / 1e3:.1f}s"
    )
    print("top no-job gaps (s):", [round(g / 1e3, 2) for g in gaps[:10]])
    print(
        f"task-time {task_ms / 1e3:.1f}s over {cores} cores x wall = "
        f"occupancy {task_ms / (cores * (t1 - t0)) * 100:.0f}%"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
