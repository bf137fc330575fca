"""Bench-harness regression tests (no Spark): the round-4 official
artifact came back parsed=null because bench.py's final stdout line was
one multi-KB JSON blob that overflowed the driver's 2000-char tail
window (VERDICT r4, What's-wrong #1).  Round 5 prints a COMPACT
headline as the last line; these tests pin its size budget, field
coverage, and the check_bench.py validator contract (ADVICE r4 items).

No SparkSession needed — pure dict plumbing.
"""

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


QUERY_NAMES = [
    "flagship_schedule", "seen_anti_join", "frontier_dedup",
    "politeness_schedule", "harvest_explode", "group_agg_pricing",
    "seed_host_semi_join", "topk_per_host", "url_canonicalize",
    "robots_gate", "asof_latest", "maxvisits_limit", "dedup_exact",
    "dedup_minhash", "lsh_pairs", "ngram_jaccard", "dedup_pipeline",
    "dedup_clusters", "simhash", "lang_id", "lang_id_trigram",
    "quality_score", "token_count", "token_count_bpe",
    "doc_fingerprint", "embedding_topk", "embedding_ann_bucketed",
    "embedding_near_dup", "embedding_near_dup_lsh", "media_features",
    "crawl_wave_loop",
]


def _sample_out() -> dict:
    return {
        "metric": "crawl_urls_per_sec",
        "value": 23184.4,
        "unit": "sec",
        "sf": 0.1,
        "queries": {k: 123.456789 for k in QUERY_NAMES},
        "scaling": {
            "cores_low": 1, "cores_high": 4,
            "t_low_sec": 345.33, "t_high_sec": 143.09,
            "efficiency": 0.603, "efficiency_delivered": 0.603,
            "throughput_low": 8104.6, "throughput_high": 19559.4,
            "projected_efficiency_at_work_multiple": {
                "1": 0.603, "10": 0.924, "100": 0.992,
            },
        },
        "scaling_secondary": {"cores": [4, 8], "efficiency": 0.593},
        "crawl_bigseen": {
            "seconds": 69.96, "fetches": 811328, "seen": 16000000,
            "waves": 2, "seeds": 200000, "reps_sec": [77.08, 69.96],
        },
        "crawl_bigseen_bloom": {
            "seconds": 57.98, "fetches": 811328, "seen": 16000000,
            "waves": 2, "seeds": 200000, "reps_sec": [58.12, 57.98],
        },
        "crawl_bigseen2": {
            "seconds": 120.5, "fetches": 405000, "seen": 32000000,
            "waves": 2, "seeds": 100000, "reps_sec": [120.5],
        },
        "crawl_bigseen2_bloom": {
            "seconds": 66.1, "fetches": 405000, "seen": 32000000,
            "waves": 2, "seeds": 100000, "reps_sec": [66.1],
        },
        "crawl_deep": {
            "seconds": 127.89,
            "late_over_early_wall_ratio": 0.619,
            "late_over_early_per_fetch_ratio": 1.15,
            "wave_walls_sec": [9.0] * 10,
        },
        "budget": {
            "budget_sec": 3300, "elapsed_sec": 3173.2,
            "arms_skipped": ["low[2]", "high[2]"], "arms_failed": {},
        },
    }


def _run_check(stdout_text: str, tmp_path) -> tuple[int, str]:
    p = tmp_path / "stdout.txt"
    p.write_text(stdout_text)
    # explicit (absent) baseline path: these fixtures use synthetic
    # query times, which must not be compared against the repo's real
    # scripts/query_baseline.json (the guard has its own test below)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_bench.py"),
         str(p), str(tmp_path / "no_baseline.json")],
        capture_output=True, text=True,
    )
    return proc.returncode, proc.stdout


class TestCompactHeadline:
    def test_fits_tail_window_and_parses(self):
        bench = _load_bench()
        line = bench._compact_headline(_sample_out(), "/x/BENCH_FULL.json")
        assert len(line) <= bench.TAIL_LINE_BUDGET
        obj = json.loads(line)
        # driver-required schema fields survive compaction
        for field in ("metric", "value", "unit", "queries", "sf"):
            assert field in obj
        assert len(obj["queries"]) == len(QUERY_NAMES)
        # judge-gated headline fields survive compaction
        assert obj["scaling"]["efficiency"] == 0.603
        assert obj["bigseen_ab"]["bloom_sec"] == 57.98
        assert obj["bigseen_ab"]["waves"] == 2
        assert obj["bigseen_ab"]["fetches_equal"] is True
        assert obj["bigseen_ab2"]["seen"] == 32000000
        assert obj["bigseen_ab2"]["bloom_sec"] == 66.1
        assert obj["deep"]["per_fetch_ratio"] == 1.15
        assert obj["full"] == "BENCH_FULL.json"

    def test_degrades_rather_than_overflow(self):
        """A half-again-larger query surface (45 entries, 20-char
        names) still fits: precision drops, then optional diagnostic
        blocks, then integer query rounding — queries never dropped."""
        bench = _load_bench()
        out = _sample_out()
        out["queries"] = {
            f"future_query_name_{i:03d}": 123.456789 for i in range(45)
        }
        line = bench._compact_headline(out, "/x/BENCH_FULL.json")
        assert len(line) <= bench.TAIL_LINE_BUDGET
        obj = json.loads(line)
        assert len(obj["queries"]) == 45  # queries are never dropped

    def test_missing_arms_yield_null_blocks(self):
        bench = _load_bench()
        out = _sample_out()
        out["crawl_bigseen"] = None
        out["crawl_deep"] = None
        out["scaling_secondary"] = None
        line = bench._compact_headline(out, None)
        obj = json.loads(line)
        assert obj["bigseen_ab"] is None
        assert obj["deep"] is None
        assert obj["full"] is None


class TestCheckBench:
    def test_green_artifact_passes(self, tmp_path):
        bench = _load_bench()
        out = _sample_out()
        full = tmp_path / "BENCH_FULL.json"
        full.write_text(json.dumps(out))
        line = bench._compact_headline(out, str(full))
        rc, report = _run_check(
            "FULL_JSON " + json.dumps(out) + "\n" + line + "\n", tmp_path
        )
        assert rc == 0, report
        assert "OVERALL PASS" in report

    def test_no_args_prints_usage(self):
        proc = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts", "check_bench.py")],
            capture_output=True, text=True,
        )
        assert proc.returncode == 2
        assert "usage" in proc.stdout.lower()

    def test_asymmetric_reps_fail(self, tmp_path):
        """ADVICE r4: a single pair or asymmetric rep counts must FAIL
        the symmetry check, not just print them."""
        bench = _load_bench()
        out = _sample_out()
        out["crawl_bigseen"]["reps_sec"] = [69.96]  # one plain rep only
        line = bench._compact_headline(out, None)
        rc, report = _run_check(
            "FULL_JSON " + json.dumps(out) + "\n" + line + "\n", tmp_path
        )
        assert rc == 1
        assert "FAIL  16M A/B rep symmetry" in report

    def test_null_fetches_fail_not_vacuous(self, tmp_path):
        """ADVICE r4: None == None must not pass the counters check."""
        bench = _load_bench()
        out = _sample_out()
        out["crawl_bigseen"]["fetches"] = None
        out["crawl_bigseen_bloom"]["fetches"] = None
        line = bench._compact_headline(out, None)
        rc, report = _run_check(
            "FULL_JSON " + json.dumps(out) + "\n" + line + "\n", tmp_path
        )
        assert rc == 1
        assert "FAIL  16M A/B counters identical" in report

    def test_wave_depth_mismatch_fails(self, tmp_path):
        bench = _load_bench()
        out = _sample_out()
        out["crawl_bigseen_bloom"]["waves"] = 3
        line = bench._compact_headline(out, None)
        rc, report = _run_check(
            "FULL_JSON " + json.dumps(out) + "\n" + line + "\n", tmp_path
        )
        assert rc == 1
        assert "FAIL  16M A/B arms at same wave depth" in report

    def test_query_regression_guard(self, tmp_path):
        """VERDICT r4 stretch 8: an injected 2x slowdown on one query
        fails the validator when a baseline exists."""
        bench = _load_bench()
        out = _sample_out()
        line = bench._compact_headline(out, None)
        text = "FULL_JSON " + json.dumps(out) + "\n" + line + "\n"
        stdout = tmp_path / "stdout.txt"
        stdout.write_text(text)
        base = tmp_path / "baseline.json"

        def run(baseline: dict) -> tuple[int, str]:
            base.write_text(json.dumps(baseline))
            proc = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "scripts", "check_bench.py"),
                 str(stdout), str(base)],
                capture_output=True, text=True,
            )
            return proc.returncode, proc.stdout

        # within 2x: passes
        rc, rep = run({k: 123.456789 for k in QUERY_NAMES})
        assert "PASS  per-query within 2x recorded best" in rep
        assert rc == 0, rep
        # one query's recorded best is well under half its time: fails
        rc, rep = run(dict({k: 123.456789 for k in QUERY_NAMES},
                           dedup_exact=50.0))
        assert rc == 1
        assert "FAIL  per-query within 2x recorded best" in rep
        assert "dedup_exact" in rep

    def test_oversize_final_line_fails(self, tmp_path):
        out = _sample_out()
        # legacy layout: the whole artifact as the last line (what
        # round 4 actually printed) must now fail the window check
        big_line = json.dumps(
            dict(out, pad="x" * 2500), separators=(",", ":")
        )
        rc, report = _run_check(big_line + "\n", tmp_path)
        assert rc == 1
        assert "FAIL  final line fits driver tail window" in report

    def test_crossover_pair_semantics(self, tmp_path):
        """The WIN criterion binds on the deepest-regime pair present:
        a 16M tie/loss with a decisive 32M win passes (the round-5
        engine moved the crossover up); a 16M loss WITHOUT a 32M pair
        fails (criterion falls back)."""
        bench = _load_bench()
        out = _sample_out()
        out["crawl_bigseen"]["seconds"] = 50.0   # plain ahead at 16M
        out["crawl_bigseen_bloom"]["seconds"] = 51.0
        line = bench._compact_headline(out, None)
        rc, report = _run_check(
            "FULL_JSON " + json.dumps(out) + "\n" + line + "\n", tmp_path
        )
        assert rc == 0, report
        assert "INFO  16M A/B margin" in report
        assert "PASS  bloom wins 32M A/B" in report
        # without the 32M pair the 16M result becomes fatal
        out["crawl_bigseen2"] = None
        out["crawl_bigseen2_bloom"] = None
        line = bench._compact_headline(out, None)
        rc, report = _run_check(
            "FULL_JSON " + json.dumps(out) + "\n" + line + "\n", tmp_path
        )
        assert rc == 1
        assert "FAIL  bloom wins 16M A/B" in report
