"""Seen-increment compaction (Iceberg rewrite analog): deep crawls keep
flat per-wave cost instead of re-planning an O(waves)-way union, and
resume works across a compaction snapshot."""

import os
import statistics

from pyspark.sql import functions as F

from crawlspark.config import Options
from crawlspark.fixtures import PAGES_DDL
from crawlspark.plans.engine import CrawlEngine
from crawlspark.sources.pages import PagesSource


def _chain_pages(spark, n: int):
    """One host, a pure chain p0 → p1 → ... → p{n-1}: exactly one new
    candidate per wave, so wave count == chain length."""
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (
            f"http://chain/p{i}.html",
            ts,
            (
                f'<html><body><a href="/p{i + 1}.html">n</a></body></html>'
            ).encode(),
            None,
            None,
        )
        for i in range(n)
    ]
    return PagesSource(
        spark.createDataFrame(rows, schema=PAGES_DDL), versioned=False
    )


def test_deep_crawl_compacts_and_stays_flat(spark, tmp_path):
    n = 40
    pages = _chain_pages(spark, n)
    ck = str(tmp_path / "ck")
    res = CrawlEngine(
        spark,
        pages,
        Options(
            crawl_delay_ms=100,
            checkpoint_dir=ck,
            seen_compact_every=5,
            collect_logs=False,
        ),
    ).run(["http://chain/p0.html"])
    assert res.counters.visit == n
    # mark-at-stack semantics: the phantom p{n} link is admitted to
    # seen even though its fetch errors (crawler.go:263-269)
    assert {r[0] for r in res.seen.select("url_norm").collect()} == {
        f"http://chain/p{i}.html" for i in range(n + 1)
    }
    # snapshots exist and the probe-side union stayed bounded
    snaps = [
        d
        for d in os.listdir(ck)
        if d.startswith("wave=")
        and os.path.isdir(os.path.join(ck, d, "seen_snapshot"))
    ]
    assert len(snaps) >= 4
    # per-wave wall time flat-ish: late waves no worse than 3x early
    # waves (without compaction the seen union at wave 40 plans 41
    # relations and grows without bound)
    walls = [m["wall_ms"] for m in res.wave_metrics]
    early = statistics.median(walls[5:15])
    late = statistics.median(walls[-10:])
    assert late <= 3 * early, f"late waves {late}ms vs early {early}ms"


def test_resume_across_compaction_snapshot(spark, tmp_path):
    n = 18
    pages = _chain_pages(spark, n)
    ck = str(tmp_path / "ck")
    opts = dict(
        crawl_delay_ms=100, checkpoint_dir=ck, seen_compact_every=5,
    )
    part = CrawlEngine(spark, pages, Options(max_waves=9, **opts)).run(
        ["http://chain/p0.html"]
    )
    assert part.counters.visit == 9
    # the interrupted run compacted at least once
    import json

    with open(os.path.join(ck, "MANIFEST.json")) as fh:
        assert json.load(fh)["seen_snapshot_wave"] is not None

    resumed = CrawlEngine(spark, pages, Options(**opts)).resume(
        ["http://chain/p0.html"]
    )
    assert resumed.counters.visit == n
    assert {r[0] for r in resumed.seen.select("url_norm").collect()} == {
        f"http://chain/p{i}.html" for i in range(n + 1)
    }
    # per-host order of the resumed tail is the chain order
    order = [
        r[0]
        for r in resumed.visit_log.orderBy("seq").select("url_norm").collect()
    ]
    assert order == [f"http://chain/p{i}.html" for i in range(9, n)]
