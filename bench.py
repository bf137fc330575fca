"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "crawl_urls_per_sec", "value": <urls/sec at CPUS>, "unit": "sec",
   "queries": {<name>: seconds, ..., "crawl_wave_loop": seconds},
   "sf": <sf>, "crawl": {...}, "scaling": {"t_low": s, "t_high": s,
   "cores_low": 8, "cores_high": 32, "throughput_low": u/s,
   "throughput_high": u/s, "efficiency": e}}

Two phases:
1. operator queries from __spark_entry__.queries() at $SPARK_GRAFT_SF_DIR
   (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS];
2. the crawl wave loop over a deterministic synthetic Common-Crawl-style
   graph (Zipf host skew, no external data) at TWO parallelism levels —
   local[CPUS/4] and local[CPUS] — the sandbox evidence protocol for the
   north rule's N→4N scaling-efficiency criterion (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "150000"))
BENCH_HOSTS = int(os.environ.get("SPARK_GRAFT_BENCH_HOSTS", "2000"))
BENCH_SEEDS = int(os.environ.get("SPARK_GRAFT_BENCH_SEEDS", "400"))
BENCH_WAVES = int(os.environ.get("SPARK_GRAFT_BENCH_WAVES", "3"))
CACHE = os.environ.get(
    "SPARK_GRAFT_BENCH_CACHE",
    f"/tmp/crawlspark_bench_{BENCH_PAGES}_{BENCH_HOSTS}",
)


def _session(cores: int, shuffle: int):
    from crawlspark.session import get_spark

    return get_spark(
        app_name=f"crawlspark-bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=shuffle,
    )


def _ensure_pages(spark):
    from crawlspark.fixtures import synthetic_pages

    marker = os.path.join(CACHE, "_SUCCESS")
    if not os.path.exists(marker):
        shutil.rmtree(CACHE, ignore_errors=True)
        synthetic_pages(
            spark, BENCH_PAGES, BENCH_HOSTS, links_per_page=6, partitions=64
        ).write.mode("overwrite").parquet(CACHE)
    return CACHE


def _crawl_once(spark, pages_path: str) -> dict:
    from crawlspark.config import Options
    from crawlspark.fixtures import zipf_bounds
    from crawlspark.plans.engine import CrawlEngine
    from crawlspark.sources.pages import PagesSource

    bounds = zipf_bounds(BENCH_PAGES, BENCH_HOSTS)
    seeds = [
        f"http://host{h}.example/p{bounds[h]}.html" for h in range(BENCH_SEEDS)
    ]
    pages = PagesSource(spark.read.parquet(pages_path))
    opts = Options(
        crawl_delay_ms=100,
        same_host_only=False,
        max_waves=BENCH_WAVES,
        shuffle_partitions=CPUS,
    )
    eng = CrawlEngine(spark, pages, opts)
    t0 = time.perf_counter()
    res = eng.run(seeds)
    dt = time.perf_counter() - t0
    return {
        "seconds": dt,
        "fetches": res.counters.fetch,
        "visits": res.counters.visit,
        "candidates_filtered": res.counters.filter,
        "waves": res.waves,
        "urls_per_sec": res.counters.fetch / dt if dt > 0 else 0.0,
    }


def main() -> None:
    import __spark_entry__ as entry_mod

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    queries: dict[str, float] = {}

    low_cores = max(1, CPUS // 4)

    # --- phase A: scaling run at low parallelism (fresh JVM state) ------
    spark_low = _session(low_cores, low_cores)
    pages_path = _ensure_pages(spark_low)
    crawl_low = _crawl_once(spark_low, pages_path)
    spark_low.stop()

    # --- phase B: full parallelism — operator queries + crawl -----------
    spark = _session(CPUS, CPUS)
    for name, fn in entry_mod.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        queries[name] = round(time.perf_counter() - t0, 3)
        _ = n
    crawl_high = _crawl_once(spark, pages_path)
    queries["crawl_wave_loop"] = round(crawl_high["seconds"], 3)
    spark.stop()

    ratio = CPUS / low_cores
    eff = (
        (crawl_high["urls_per_sec"] / crawl_low["urls_per_sec"]) / ratio
        if crawl_low["urls_per_sec"] > 0
        else 0.0
    )
    out = {
        "metric": "crawl_urls_per_sec",
        "value": round(crawl_high["urls_per_sec"], 1),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "crawl": {
            "pages": BENCH_PAGES,
            "hosts": BENCH_HOSTS,
            "seeds": BENCH_SEEDS,
            "waves": crawl_high["waves"],
            "fetches": crawl_high["fetches"],
            "visits": crawl_high["visits"],
        },
        "scaling": {
            "cores_low": low_cores,
            "cores_high": CPUS,
            "t_low_sec": round(crawl_low["seconds"], 2),
            "t_high_sec": round(crawl_high["seconds"], 2),
            "throughput_low": round(crawl_low["urls_per_sec"], 1),
            "throughput_high": round(crawl_high["urls_per_sec"], 1),
            "efficiency": round(eff, 3),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
