#!/usr/bin/env python
"""Validate a bench.py output line against the round-4 'done' criteria
(VERDICT.md round 3, items 1-4).

Usage: python scripts/check_bench.py <file-with-final-json-line>
       (picks the LAST line that parses as a JSON object with "metric")

Checks:
  1. artifact completeness — parses, metric/value/queries present,
     queries non-empty, budget block present (the round-3 artifact was
     rc=124 with zero bytes);
  2. scaling — efficiency present; >= 0.6 flagged pass/fail against the
     round bar (north 0.8), plus the calibrated projection field;
  3. bloom big-seen A/B — bigseen_bloom.seconds < bigseen.seconds with
     identical fetch counters, >= intended rep symmetry;
  4. deep arm — late_over_early ratios present, wall ratio <= 1.2 OR
     per-fetch ratio <= 1.2 (wave-size drift is reported alongside).

Exit 0 = every mandatory check green; 1 otherwise.  Prints one line per
check so a failed rehearsal says exactly which field to fix.
"""

import json
import sys


def main() -> int:
    path = sys.argv[1]
    obj = None
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith("{"):
                try:
                    cand = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if isinstance(cand, dict) and "metric" in cand:
                    obj = cand
    ok = True

    def check(name: str, cond: bool, detail: str = "") -> None:
        nonlocal ok
        ok = ok and cond
        print(f"{'PASS' if cond else 'FAIL'}  {name}  {detail}")

    check("artifact parses", obj is not None)
    if obj is None:
        return 1

    q = obj.get("queries") or {}
    check("queries present", len(q) >= 25, f"n={len(q)}")
    check("headline value > 0", (obj.get("value") or 0) > 0,
          f"value={obj.get('value')}")
    b = obj.get("budget") or {}
    check(
        "budget block",
        "elapsed_sec" in b and "arms_skipped" in b,
        f"elapsed={b.get('elapsed_sec')}s skipped={b.get('arms_skipped')} "
        f"failed={list((b.get('arms_failed') or {}))}",
    )

    s = obj.get("scaling") or {}
    eff = s.get("efficiency")
    check("scaling.efficiency present", eff is not None, f"eff={eff}")
    if eff is not None:
        check(
            "scaling.efficiency >= 0.6 (north 0.8)",
            eff >= 0.6,
            f"raw={eff} delivered={s.get('efficiency_delivered')} "
            f"low={s.get('throughput_low')}/s high={s.get('throughput_high')}/s",
        )
        check(
            "calibrated projection present",
            "projected_efficiency_at_work_multiple" in s,
            str(s.get("projected_efficiency_at_work_multiple")),
        )

    bs = obj.get("crawl_bigseen")
    bb = obj.get("crawl_bigseen_bloom")
    check("big-seen A/B both arms", bs is not None and bb is not None)
    if bs and bb:
        check(
            "bloom wins big-seen A/B",
            bb["seconds"] < bs["seconds"],
            f"bloom={bb['seconds']}s plain={bs['seconds']}s "
            f"({bs['seconds'] / bb['seconds']:.2f}x) "
            f"reps={len(bb.get('reps_sec') or [])}v{len(bs.get('reps_sec') or [])}",
        )
        check(
            "A/B counters identical",
            bb.get("fetches") == bs.get("fetches"),
            f"fetches {bb.get('fetches')} vs {bs.get('fetches')}",
        )

    d = obj.get("crawl_deep")
    check("deep arm present", d is not None)
    if d:
        wr, fr = d.get("late_over_early_wall_ratio"), d.get(
            "late_over_early_per_fetch_ratio"
        )
        check(
            "deep flat tail <= 1.2 (wall or per-fetch)",
            (wr is not None and wr <= 1.2) or (fr is not None and fr <= 1.2),
            f"wall_ratio={wr} per_fetch_ratio={fr}",
        )

    print("OVERALL", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
