"""Bloom seen-filter sidecar: no false negatives, bounded false
positives, shard merge correctness."""

from pyspark.sql import functions as F

from crawlspark.operators.seen import (
    apply_bloom,
    bloom_params,
    build_bloom,
    collect_shards,
    merge_blooms,
)


def test_bloom_params_sane():
    m, k = bloom_params(1000, 0.01)
    assert m > 9000 and m % 8 == 0
    assert 5 <= k <= 9


def test_no_false_negatives_and_low_fpp(spark):
    n = 2000
    seen = spark.range(n).select(
        F.concat(F.lit("http://h/p"), F.col("id")).alias("url_norm")
    )
    bloom = build_bloom(seen, num_partitions=8, expected_per_partition=1000, fpp=0.01)
    shards = collect_shards(bloom)
    assert 0 < len(shards) <= 8

    # candidates: half seen, half unseen
    cands = spark.range(n * 2).select(
        F.concat(F.lit("http://h/p"), F.col("id")).alias("url_norm")
    )
    out = apply_bloom(
        cands, shards, num_partitions=8, expected_per_partition=1000, fpp=0.01
    )
    rows = {r["url_norm"]: r["maybe_seen"] for r in out.collect()}
    # every seen URL must test maybe_seen (no false negatives)
    for i in range(n):
        assert rows[f"http://h/p{i}"], f"false negative at {i}"
    # unseen URLs: false-positive rate bounded (generous 5x margin)
    fps = sum(1 for i in range(n, 2 * n) if rows[f"http://h/p{i}"])
    assert fps / n < 0.05, f"fpp too high: {fps / n}"


def test_merge_blooms(spark):
    a = spark.createDataFrame([("http://h/a",)], "url_norm string")
    b = spark.createDataFrame([("http://h/b",)], "url_norm string")
    kw = dict(num_partitions=2, expected_per_partition=100, fpp=0.01)
    merged = merge_blooms(build_bloom(a, **kw).unionByName(build_bloom(b, **kw)))
    shards = collect_shards(merged)
    cands = spark.createDataFrame(
        [("http://h/a",), ("http://h/b",), ("http://h/zzz",)], "url_norm string"
    )
    rows = {
        r["url_norm"]: r["maybe_seen"]
        for r in apply_bloom(cands, shards, **kw).collect()
    }
    assert rows["http://h/a"] and rows["http://h/b"]
    assert not rows["http://h/zzz"]


def test_apply_bloom_df_matches_collected(spark):
    """The cogroup shard-table probe (the 10^10-URL path) returns the
    same maybe_seen verdicts as the collected-shard-list form, and ORs
    unmerged increment rows on the fly."""
    from crawlspark.operators.seen import apply_bloom_df

    kw = dict(num_partitions=4, expected_per_partition=500, fpp=0.01)
    a = spark.range(300).select(
        F.concat(F.lit("http://h/a"), F.col("id")).alias("url_norm")
    )
    b = spark.range(300).select(
        F.concat(F.lit("http://h/b"), F.col("id")).alias("url_norm")
    )
    # two UNMERGED increments in one shard table
    shards_df = build_bloom(a, **kw).unionByName(build_bloom(b, **kw))
    cands = spark.range(900).select(
        F.concat(F.lit("http://h/a"), F.col("id")).alias("url_norm")
    )
    via_df = {
        r["url_norm"]: r["maybe_seen"]
        for r in apply_bloom_df(cands, shards_df, **kw).collect()
    }
    via_list = {
        r["url_norm"]: r["maybe_seen"]
        for r in apply_bloom(
            cands, collect_shards(merge_blooms(shards_df)), **kw
        ).collect()
    }
    assert via_df == via_list
    for i in range(300):  # no false negatives
        assert via_df[f"http://h/a{i}"]


def test_apply_bloom_join_matches_collected(spark):
    """The pure-JVM broadcast-join probe agrees with the numpy probe
    (same signed-arithmetic bit layout) and has no false negatives."""
    from crawlspark.operators.seen import apply_bloom_join

    kw = dict(num_partitions=4, expected_per_partition=500, fpp=0.01)
    seen = spark.range(600).select(
        F.concat(F.lit("http://h/s"), F.col("id")).alias("url_norm")
    )
    shards_df = build_bloom(seen, **kw)
    cands = spark.range(1800).select(
        F.concat(F.lit("http://h/s"), F.col("id")).alias("url_norm")
    )
    via_join = {
        r["url_norm"]: r["maybe_seen"]
        for r in apply_bloom_join(cands, shards_df, **kw).collect()
    }
    via_list = {
        r["url_norm"]: r["maybe_seen"]
        for r in apply_bloom(
            cands, collect_shards(shards_df), **kw
        ).collect()
    }
    assert via_join == via_list
    for i in range(600):
        assert via_join[f"http://h/s{i}"], f"false negative at {i}"
    fps = sum(1 for i in range(600, 1800) if via_join[f"http://h/s{i}"])
    assert fps / 1200 < 0.05


def test_engine_with_bloom_cogroup_probe(spark, fixture_pages):
    """The distributed cogroup probe (10^10 path) gives identical crawl
    results to the broadcast-join probe."""
    from crawlspark.config import Options
    from crawlspark.plans.engine import CrawlEngine

    seeds = ["http://hosta/page1.html", "http://hosta/page4.html"]
    kw = dict(
        crawl_delay_ms=100, use_bloom_seen=True, bloom_min_seen_rows=0, bloom_partitions=4,
        bloom_expected_per_partition=1000, bloom_fpp=0.01,
    )
    a = CrawlEngine(
        spark, fixture_pages, Options(bloom_probe="join", **kw)
    ).run(seeds)
    b = CrawlEngine(
        spark, fixture_pages, Options(bloom_probe="cogroup", **kw)
    ).run(seeds)
    assert a.counters.visit == b.counters.visit == 5
    assert a.counters.filter == b.counters.filter == 13
    sa = {r[0] for r in a.seen.select("url_norm").collect()}
    sb = {r[0] for r in b.seen.select("url_norm").collect()}
    assert sa == sb


def test_resume_with_bloom_matches_full(spark, fixture_pages, tmp_path):
    """Bloom-on resume seeds the shard table from the checkpointed seen
    set — no false-negative hole across the resume boundary."""
    from crawlspark.config import Options
    from crawlspark.plans.engine import CrawlEngine

    seeds = ["http://hosta/page1.html", "http://hosta/page4.html"]
    bopts = dict(
        crawl_delay_ms=100, use_bloom_seen=True, bloom_min_seen_rows=0, bloom_partitions=4,
        bloom_expected_per_partition=1000, bloom_fpp=0.01,
    )
    full = CrawlEngine(
        spark, fixture_pages, Options(**bopts)
    ).run(seeds)
    ck = str(tmp_path / "ckb")
    CrawlEngine(
        spark, fixture_pages,
        Options(checkpoint_dir=ck, max_waves=1, **bopts),
    ).run(seeds)
    resumed = CrawlEngine(
        spark, fixture_pages, Options(checkpoint_dir=ck, **bopts)
    ).resume(seeds)
    assert resumed.counters.visit == full.counters.visit == 5
    assert resumed.counters.filter == full.counters.filter == 13
    s1 = {r[0] for r in full.seen.select("url_norm").collect()}
    s2 = {r[0] for r in resumed.seen.select("url_norm").collect()}
    assert s1 == s2


def test_engine_with_bloom_matches_exact(spark, fixture_pages):
    """Crawl with the Bloom pre-filter enabled: identical counters,
    seen set, and visit order vs the exact-join path."""
    from crawlspark.config import Options
    from crawlspark.plans.engine import CrawlEngine

    seeds = ["http://hosta/page1.html", "http://hosta/page4.html"]
    base = CrawlEngine(spark, fixture_pages, Options(crawl_delay_ms=100)).run(seeds)
    bloomed = CrawlEngine(
        spark,
        fixture_pages,
        Options(
            crawl_delay_ms=100,
            use_bloom_seen=True, bloom_min_seen_rows=0,
            bloom_partitions=4,
            bloom_expected_per_partition=1000,
            bloom_fpp=0.01,
        ),
    ).run(seeds)
    assert bloomed.counters.visit == base.counters.visit == 5
    assert bloomed.counters.filter == base.counters.filter == 13
    assert bloomed.counters.enqueued == base.counters.enqueued
    s1 = {r[0] for r in base.seen.select("url_norm").collect()}
    s2 = {r[0] for r in bloomed.seen.select("url_norm").collect()}
    assert s1 == s2


def test_initial_bloom_prebuilt_matches_build(spark, fixture_pages):
    """run(initial_seen=..., initial_bloom=...) with caller-prebuilt
    shards behaves identically to letting the engine build them from
    initial_seen (the mid-frontier shape: at 10^10 URLs the filter is
    durable state, never rebuilt at run start).  page2 pre-seen must
    stay unvisited; counters and seen set match the built path."""
    from crawlspark.config import Options
    from crawlspark.plans.engine import CrawlEngine

    initial = spark.createDataFrame(
        [("http://hosta/page2.html", "hosta", -1)],
        "url_norm string, host string, wave_added int",
    )
    bopts = dict(
        crawl_delay_ms=100, use_bloom_seen=True, bloom_min_seen_rows=0, bloom_partitions=4,
        bloom_expected_per_partition=1000, bloom_fpp=0.01,
    )
    seeds = ["http://hosta/page1.html"]
    built = CrawlEngine(spark, fixture_pages, Options(**bopts)).run(
        seeds, initial_seen=initial
    )
    prebuilt_shards = build_bloom(
        initial, num_partitions=4, expected_per_partition=1000, fpp=0.01
    )
    pre = CrawlEngine(spark, fixture_pages, Options(**bopts)).run(
        seeds, initial_seen=initial, initial_bloom=prebuilt_shards
    )
    assert vars(pre.counters) == vars(built.counters)
    s1 = {r[0] for r in built.seen.select("url_norm").collect()}
    s2 = {r[0] for r in pre.seen.select("url_norm").collect()}
    assert s1 == s2
    assert "http://hosta/page2.html" in s2
    visited = {
        r["url_norm"] for r in pre.visit_log.select("url_norm").collect()
    }
    assert "http://hosta/page2.html" not in visited


def test_resume_reads_committed_shards(
    spark, fixture_pages, tmp_path, monkeypatch
):
    """Bloom-on resume must consume the COMMITTED fold (manifest
    bloom_fold_wave → shards + post-fold increments as the pending
    set) rather than rebuilding from the seen union — pinned
    behaviorally: the store's ``bloom`` table must be READ, and
    ``build_bloom`` must never run during the resume (a regression
    that rebuilds from seen would call it; only a post-resume fold
    may, and this fixture's waves stay under the fold threshold)."""
    import crawlspark.operators.seen as seen_mod
    from crawlspark.config import Options
    from crawlspark.plans.engine import CrawlEngine
    from crawlspark.sources.statestore import ParquetStateStore

    bopts = dict(
        crawl_delay_ms=100, use_bloom_seen=True, bloom_min_seen_rows=0, bloom_partitions=4,
        bloom_expected_per_partition=1000, bloom_fpp=0.01,
    )
    seeds = ["http://hosta/page1.html", "http://hosta/page4.html"]
    full = CrawlEngine(spark, fixture_pages, Options(**bopts)).run(seeds)
    ck = str(tmp_path / "ck")
    CrawlEngine(
        spark, fixture_pages, Options(checkpoint_dir=ck, max_waves=1, **bopts)
    ).run(seeds)
    import json
    import os

    with open(os.path.join(ck, "MANIFEST.json")) as fh:
        manifest = json.load(fh)
    assert manifest.get("bloom_fold_wave") is not None

    build_calls: list = []
    real_build = seen_mod.build_bloom
    monkeypatch.setattr(
        seen_mod,
        "build_bloom",
        lambda *a, **kw: build_calls.append(1) or real_build(*a, **kw),
    )
    reads: list = []
    real_read = ParquetStateStore.read
    monkeypatch.setattr(
        ParquetStateStore,
        "read",
        lambda self, name, wave: reads.append(name)
        or real_read(self, name, wave),
    )
    resumed = CrawlEngine(
        spark, fixture_pages, Options(checkpoint_dir=ck, **bopts)
    ).resume(seeds)
    assert "bloom" in reads, "resume never read the committed shards"
    assert not build_calls, "resume rebuilt the bloom instead of reading it"
    assert resumed.counters.visit == full.counters.visit
    assert resumed.counters.filter == full.counters.filter
    s1 = {r[0] for r in full.seen.select("url_norm").collect()}
    s2 = {r[0] for r in resumed.seen.select("url_norm").collect()}
    assert s1 == s2


def test_bloom_dormant_below_crossover(spark, fixture_pages, tmp_path):
    """With seen below bloom_min_seen_rows the sidecar runs ZERO jobs —
    no shard state is ever committed — and every counter plus the seen
    set is identical to the engaged run (the gate is an optimization,
    never a correctness knob)."""
    import glob
    import os

    from crawlspark.config import Options
    from crawlspark.plans.engine import CrawlEngine

    bopts = dict(
        crawl_delay_ms=100, use_bloom_seen=True, bloom_partitions=4,
        bloom_expected_per_partition=1000, bloom_fpp=0.01,
    )
    seeds = ["http://hosta/page1.html", "http://hosta/page4.html"]
    engaged = CrawlEngine(
        spark, fixture_pages, Options(bloom_min_seen_rows=0, **bopts)
    ).run(seeds)
    ck = str(tmp_path / "ck_dormant")
    dormant = CrawlEngine(
        spark, fixture_pages,
        Options(
            checkpoint_dir=ck, bloom_min_seen_rows=10**9, **bopts
        ),
    ).run(seeds)
    assert dormant.counters.visit == engaged.counters.visit == 5
    assert dormant.counters.filter == engaged.counters.filter == 13
    s1 = {r[0] for r in engaged.seen.select("url_norm").collect()}
    s2 = {r[0] for r in dormant.seen.select("url_norm").collect()}
    assert s1 == s2
    assert glob.glob(os.path.join(ck, "*", "bloom")) == []


def test_bloom_engages_at_crossover(spark, fixture_pages, tmp_path):
    """A run that CROSSES bloom_min_seen_rows mid-crawl engages the
    sidecar with one build pass — shard state committed from that wave
    on, counters identical to both the plain and always-on runs."""
    import glob
    import os

    from crawlspark.config import Options
    from crawlspark.plans.engine import CrawlEngine

    seeds = ["http://hosta/page1.html", "http://hosta/page4.html"]
    plain = CrawlEngine(
        spark, fixture_pages, Options(crawl_delay_ms=100)
    ).run(seeds)
    ck = str(tmp_path / "ck_engage")
    # fixture crawl sees 2 URLs after wave 0 and 7+ after wave 1 →
    # threshold 3 keeps wave 0 dormant and engages at wave 1
    crossed = CrawlEngine(
        spark, fixture_pages,
        Options(
            crawl_delay_ms=100, use_bloom_seen=True, bloom_partitions=4,
            bloom_expected_per_partition=1000, bloom_fpp=0.01,
            checkpoint_dir=ck, bloom_min_seen_rows=3,
        ),
    ).run(seeds)
    assert crossed.counters.visit == plain.counters.visit == 5
    assert crossed.counters.filter == plain.counters.filter == 13
    s1 = {r[0] for r in plain.seen.select("url_norm").collect()}
    s2 = {r[0] for r in crossed.seen.select("url_norm").collect()}
    assert s1 == s2
    committed = sorted(glob.glob(os.path.join(ck, "*", "bloom")))
    assert committed, "crossing the threshold must commit shard state"
    assert os.path.join(ck, "seed", "bloom") not in committed


def test_bloom_default_ratio_gate(spark, fixture_pages, tmp_path):
    """Default options (bloom_min_seen_rows=-1) derive the dormancy
    threshold from the measured crossover RATIO (seen ≥ ratio × wave
    bound): a fixture-scale crawl (seen ≪ 160× the seed count) runs
    bloom-dormant with counters identical to the engaged run, while a
    run whose initial seen set already exceeds the ratio engages at
    run start and commits shard state."""
    import glob
    import os

    from crawlspark.config import Options
    from crawlspark.plans.engine import CrawlEngine

    bopts = dict(
        crawl_delay_ms=100, use_bloom_seen=True, bloom_partitions=4,
        bloom_expected_per_partition=1000, bloom_fpp=0.01,
    )
    seeds = ["http://hosta/page1.html", "http://hosta/page4.html"]
    engaged = CrawlEngine(
        spark, fixture_pages, Options(bloom_min_seen_rows=0, **bopts)
    ).run(seeds)
    ck = str(tmp_path / "ck_ratio_dormant")
    auto = CrawlEngine(
        spark, fixture_pages, Options(checkpoint_dir=ck, **bopts)
    ).run(seeds)  # default gate: 160 × 2 seeds = 320 ≫ fixture seen
    assert auto.counters.visit == engaged.counters.visit == 5
    assert auto.counters.filter == engaged.counters.filter == 13
    s1 = {r[0] for r in engaged.seen.select("url_norm").collect()}
    s2 = {r[0] for r in auto.seen.select("url_norm").collect()}
    assert s1 == s2
    assert glob.glob(os.path.join(ck, "*", "bloom")) == []

    # 2 seeds × ratio 160 = 320 < 400 initial-seen rows → engages with
    # one build pass at run start (shard state committed at seed stage)
    big_seen = spark.range(400).select(
        F.concat(F.lit("http://big.seen/p"), F.col("id")).alias("url_norm"),
        F.lit("big.seen").alias("host"),
        F.lit(-1).alias("wave_added"),
    )
    ck2 = str(tmp_path / "ck_ratio_engaged")
    eng2 = CrawlEngine(
        spark, fixture_pages, Options(checkpoint_dir=ck2, **bopts)
    ).run(seeds, initial_seen=big_seen)
    assert eng2.counters.visit == engaged.counters.visit == 5
    assert glob.glob(os.path.join(ck2, "*", "bloom")) != []
