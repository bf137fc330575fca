"""spark-submit entry point for the crawl engine.

Usage (the north-rule deployment shape):

    python scripts/package.py                       # → dist/crawlspark.zip
    spark-submit --master <cluster> \
        --py-files dist/crawlspark.zip \
        scripts/submit_crawl.py \
        --pages /path/to/pages_parquet_or_iceberg \
        --seeds http://host0.example/p0.html,http://host1.example/p1.html \
        --max-waves 3 [--checkpoint-dir /path/ck] [--crawl-delay-ms 100] \
        [--same-host-only] [--bloom]

Prints one JSON line of crawl metrics.  On a cluster, swap --pages for
the Iceberg table (spark.read.format('iceberg')) — PagesSource takes
any DataFrame.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--seeds", required=True, help="comma-separated seed URLs or @file")
    ap.add_argument("--max-waves", type=int, default=1000)
    ap.add_argument("--crawl-delay-ms", type=int, default=5000)
    ap.add_argument("--same-host-only", action="store_true")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--bloom", action="store_true")
    ap.add_argument("--max-urls-per-host-per-wave", type=int, default=0)
    ap.add_argument("--lean", action="store_true", help="skip log tables")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from crawlspark.config import Options
    from crawlspark.plans.engine import CrawlEngine
    from crawlspark.sources.pages import PagesSource

    spark = SparkSession.builder.appName("crawlspark-submit").getOrCreate()

    if args.seeds.startswith("@"):
        with open(args.seeds[1:]) as fh:
            seeds = [l.strip() for l in fh if l.strip()]
    else:
        seeds = args.seeds.split(",")

    opts = Options(
        crawl_delay_ms=args.crawl_delay_ms,
        same_host_only=args.same_host_only,
        max_waves=args.max_waves,
        checkpoint_dir=args.checkpoint_dir,
        use_bloom_seen=args.bloom,
        max_urls_per_host_per_wave=args.max_urls_per_host_per_wave,
        collect_logs=not args.lean,
    )
    pages = PagesSource(spark.read.parquet(args.pages))
    eng = CrawlEngine(spark, pages, opts)
    t0 = time.perf_counter()
    res = eng.resume(seeds) if args.resume else eng.run(seeds)
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "waves": res.waves,
                "err": res.err,
                "seconds": round(dt, 2),
                "urls_per_sec": round(res.counters.fetch / dt, 1) if dt else 0,
                "counters": {
                    k: v
                    for k, v in vars(res.counters).items()
                    if k != "errors_by_kind"
                },
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
