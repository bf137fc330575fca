"""Round-3 fix coverage: null-hash bloom probes, resume of the
deferred frontier and of run(initial_seen=...), injection drain cap."""

import os

import pytest
from pyspark.sql import functions as F

from crawlspark.config import Options
from crawlspark.plans.engine import CrawlEngine


def _visit_order(res):
    return [r[0] for r in res.visit_log.orderBy("seq").select("url_norm").collect()]


class TestBloomNullHashes:
    """xxhash64(NULL) is NULL; every probe path must report
    maybe_seen=False for null url_norm (matching the JVM join path's
    CASE WHEN) instead of crashing in the int64 conversion."""

    @pytest.fixture(scope="class")
    def seen_and_cands(self, spark):
        seen = spark.createDataFrame(
            [(f"http://h{i}/p", f"h{i}", 0) for i in range(50)],
            "url_norm string, host string, wave_added int",
        )
        cands = spark.createDataFrame(
            [("http://h1/p",), ("http://new/x",), (None,), (None,)],
            "url_norm string",
        )
        return seen, cands

    def _check(self, rows):
        by_url = {}
        nulls = []
        for r in rows:
            if r["url_norm"] is None:
                nulls.append(r["maybe_seen"])
            else:
                by_url[r["url_norm"]] = r["maybe_seen"]
        assert by_url["http://h1/p"] is True  # no false negatives
        assert nulls == [False, False]  # null key → definitely unseen
        return by_url

    def test_cogroup_probe(self, spark, seen_and_cands):
        from crawlspark.operators.seen import apply_bloom_df, build_bloom

        seen, cands = seen_and_cands
        shards = build_bloom(seen, num_partitions=4)
        self._check(apply_bloom_df(cands, shards, num_partitions=4).collect())

    def test_collected_shard_probe(self, spark, seen_and_cands):
        from crawlspark.operators.seen import (
            apply_bloom, build_bloom, collect_shards,
        )

        seen, cands = seen_and_cands
        shards = collect_shards(build_bloom(seen, num_partitions=4))
        self._check(apply_bloom(cands, shards, num_partitions=4).collect())

    def test_join_probe(self, spark, seen_and_cands):
        from crawlspark.operators.seen import apply_bloom_join, build_bloom

        seen, cands = seen_and_cands
        shards = build_bloom(seen, num_partitions=4)
        self._check(apply_bloom_join(cands, shards, num_partitions=4).collect())

    def test_engine_cogroup_with_unparsable_link(self, spark, tmp_path):
        """A crawl whose pages harvest an unparsable URL (null url_norm
        after canonicalization) must not crash in cogroup bloom mode."""
        from crawlspark.fixtures import fixture_pages_df
        from crawlspark.sources.pages import PagesSource

        pages = fixture_pages_df(spark)
        # graft a busted link onto page1's html
        bad = b'<a href="http://[bad-bracket/oops">x</a>'
        pages = pages.withColumn(
            "html",
            F.when(
                F.col("url") == "http://hosta/page1.html",
                F.concat(F.col("html"), F.lit(bad)),
            ).otherwise(F.col("html")),
        )
        res = CrawlEngine(
            spark,
            PagesSource(pages),
            Options(
                crawl_delay_ms=1,
                use_bloom_seen=True, bloom_min_seen_rows=0,
                bloom_probe="cogroup",
                bloom_partitions=4,
            ),
        ).run(["http://hosta/page1.html"])
        assert res.counters.visit == 3


class TestResumeDeferred:
    def test_resume_restores_deferred_frontier(self, spark, fixture_pages, tmp_path):
        """Interrupt while the politeness cap is holding deferred URLs;
        resume must crawl them (they are in neither candidates nor
        re-admittable seen)."""
        opts = dict(crawl_delay_ms=100, max_urls_per_host_per_wave=1)
        full = CrawlEngine(spark, fixture_pages, Options(**opts)).run(
            ["http://hosta/page1.html"]
        )
        assert full.counters.visit == 3

        ckdir = str(tmp_path / "ck")
        part = CrawlEngine(
            spark, fixture_pages,
            Options(**opts, checkpoint_dir=ckdir, max_waves=2),
        ).run(["http://hosta/page1.html"])
        # with cap=1, wave1 visits page1, wave2 visits page2 and DEFERS
        # page3's sibling links beyond the cap
        assert part.counters.visit < full.counters.visit

        resumed = CrawlEngine(
            spark, fixture_pages, Options(**opts, checkpoint_dir=ckdir)
        ).resume(["http://hosta/page1.html"])
        assert resumed.counters.visit == full.counters.visit
        assert _visit_order(resumed) == _visit_order(full)[-len(
            _visit_order(resumed)
        ):]
        # seen sets identical
        assert {r[0] for r in resumed.seen.select("url_norm").collect()} == {
            r[0] for r in full.seen.select("url_norm").collect()
        }


class TestResumeInitialSeen:
    def test_initial_seen_survives_resume(self, spark, fixture_pages, tmp_path):
        """run(initial_seen=...) + crash + resume: the pre-populated
        seen set must persist — page2 pre-seen means page2 is never
        visited, before OR after the resume point."""
        initial = spark.createDataFrame(
            [("http://hosta/page2.html", "hosta", -1)],
            "url_norm string, host string, wave_added int",
        )
        ckdir = str(tmp_path / "ck")
        part = CrawlEngine(
            spark, fixture_pages,
            Options(crawl_delay_ms=100, checkpoint_dir=ckdir, max_waves=1),
        ).run(["http://hosta/page1.html"], initial_seen=initial)
        assert part.waves == 1

        resumed = CrawlEngine(
            spark, fixture_pages, Options(crawl_delay_ms=100, checkpoint_dir=ckdir)
        ).resume(["http://hosta/page1.html"])
        visited = set(_visit_order(part)) | set(_visit_order(resumed))
        assert "http://hosta/page2.html" not in visited
        seen = {r[0] for r in resumed.seen.select("url_norm").collect()}
        assert "http://hosta/page2.html" in seen


class TestInjectDrainCap:
    def test_drain_cap_spills_to_next_wave(self, spark, tmp_path):
        from crawlspark.streaming.inject import InjectionQueue

        q = InjectionQueue(spark, str(tmp_path / "inj"), max_rows_per_drain=3)
        # three published batches of 2 rows each, batch ids give FIFO
        for b in range(3):
            spark.createDataFrame(
                [(f"http://inj/b{b}p{i}", None) for i in range(2)],
                "url string, state string",
            ).write.mode("overwrite").parquet(
                os.path.join(q.pending_dir, f"batch={b}")
            )
        first = q.drain()
        # whole batches consumed until cap reached: b0 (2 rows) then b1
        # (2 rows, crossing the cap of 3) — b2 stays pending.  Batch
        # FIFO matters; row order WITHIN a batch doesn't (admission
        # re-orders candidates deterministically).
        assert {u for u, _ in first} == {
            "http://inj/b0p0", "http://inj/b0p1",
            "http://inj/b1p0", "http://inj/b1p1",
        }
        second = q.drain()
        assert {u for u, _ in second} == {"http://inj/b2p0", "http://inj/b2p1"}
        assert q.drain() == []


class TestBloomLazyFold:
    """The engine folds seen increments into the bitmaps lazily (pending
    increments are probed exactly via broadcast meanwhile).  Every fold
    policy must produce identical counters and visit order to the
    bloom-off crawl — and the never-fold case must not commit any
    per-wave bloom state."""

    def _crawl(self, spark, fixture_pages, ck, **opt_kw):
        res = CrawlEngine(
            spark,
            fixture_pages,
            Options(crawl_delay_ms=100, checkpoint_dir=ck, **opt_kw),
        ).run(["http://hosta/page1.html", "http://hostb/page1.html"])
        return res

    def test_fold_policies_match_plain(self, spark, fixture_pages, tmp_path):
        base = self._crawl(spark, fixture_pages, str(tmp_path / "p"))
        lazy = self._crawl(
            spark, fixture_pages, str(tmp_path / "l"),
            use_bloom_seen=True, bloom_min_seen_rows=0, bloom_partitions=4,
            bloom_expected_per_partition=1000,
            bloom_fold_min_rows=10_000,  # never folds at fixture scale
        )
        eager = self._crawl(
            spark, fixture_pages, str(tmp_path / "e"),
            use_bloom_seen=True, bloom_min_seen_rows=0, bloom_partitions=4,
            bloom_expected_per_partition=1000,
            bloom_fold_min_rows=1,  # folds after every wave
        )
        for res in (lazy, eager):
            assert vars(res.counters) == vars(base.counters)
            assert _visit_order(res) == _visit_order(base)
        # never-fold: only the seed-stage bloom commit exists — no
        # per-wave bloom maintenance jobs ran
        lazy_root = str(tmp_path / "l")
        assert os.path.exists(os.path.join(lazy_root, "seed", "bloom"))
        for w in range(lazy.waves):
            assert not os.path.exists(
                os.path.join(lazy_root, f"wave={w}", "bloom")
            )
        # eager: every wave with a nonempty increment re-committed shards
        eager_root = str(tmp_path / "e")
        assert any(
            os.path.exists(os.path.join(eager_root, f"wave={w}", "bloom"))
            for w in range(eager.waves)
        )
