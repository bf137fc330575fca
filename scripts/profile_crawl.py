"""Profile one bench-style crawl run with per-stage timing.

Usage: python scripts/profile_crawl.py <cores> [pages] [seeds] [waves]
Prints the CRAWLSPARK_TIMING breakdown plus total wall and urls/sec.
"""

import os
import sys
import time

os.environ.setdefault("CRAWLSPARK_TIMING", "1")

sys.path.insert(0, "/root/repo")

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
pages_n = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
seeds_n = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
waves = int(sys.argv[4]) if len(sys.argv) > 4 else 3
hosts_n = max(100, pages_n // 100)

import bench  # noqa: E402  (reuse its session/pages/seed helpers)

bench.BENCH_PAGES = pages_n
bench.BENCH_HOSTS = hosts_n
bench.BENCH_SEEDS = seeds_n
bench.BENCH_WAVES = waves
bench.CACHE = f"/root/repo/.bench_cache/pages_{pages_n}_{hosts_n}"

extra = {}
if os.environ.get("PROF_ADVISORY"):
    extra["spark.sql.adaptive.advisoryPartitionSizeInBytes"] = os.environ[
        "PROF_ADVISORY"
    ]
if os.environ.get("PROF_NO_COALESCE"):
    extra["spark.sql.adaptive.coalescePartitions.enabled"] = "false"
if os.environ.get("PROF_NO_AQE"):
    extra["spark.sql.adaptive.enabled"] = "false"

if extra:
    from crawlspark.session import get_spark

    def _session(c, shuffle):
        return get_spark(
            app_name=f"profile-{c}",
            master=f"local[{c}]",
            shuffle_partitions=shuffle,
            extra_conf=extra,
        )

    bench._session = _session

if os.environ.get("PROF_PARALLEL_CKPT"):
    _orig = bench._crawl_once

    def _crawl_once(spark, pages_path):
        from crawlspark.config import Options as _O

        old_init = _O.__init__

        def new_init(self, *a, **kw):
            old_init(self, *a, **kw)
            self.parallel_checkpoints = True

        _O.__init__ = new_init
        try:
            return _orig(spark, pages_path)
        finally:
            _O.__init__ = old_init

    bench._crawl_once = _crawl_once

reps = int(os.environ.get("PROF_REPS", "2"))
spark = bench._session(cores, shuffle=max(cores * 2, 8))
path = bench._ensure_pages(spark)
if os.environ.get("PROF_WARMUP"):
    real_seeds, real_waves = bench.BENCH_SEEDS, bench.BENCH_WAVES
    bench.BENCH_SEEDS, bench.BENCH_WAVES = 10_000, 2
    t0 = time.perf_counter()
    bench._crawl_once(spark, path)
    print(f"warmup: {time.perf_counter() - t0:.1f}s", flush=True)
    bench.BENCH_SEEDS, bench.BENCH_WAVES = real_seeds, real_waves
for i in range(reps):
    res = bench._crawl_once(spark, path)
    print(
        f"cores={cores} rep={i} pages={pages_n} seeds={seeds_n} "
        f"waves={res['waves']} fetches={res['fetches']} "
        f"wall={res['seconds']:.1f}s urls/sec={res['urls_per_sec']:.0f}"
    )
spark.stop()
