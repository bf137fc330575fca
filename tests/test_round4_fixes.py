"""Round-4 fix coverage (ADVICE.md items).

1. Bloom probe int64 exactness: a nullable hash column converts to
   float64 pandas-side whenever an Arrow batch contains a null, so the
   VALID rows' 64-bit hashes lose low bits (float64 has a 53-bit
   mantissa) and probe indices diverge from the exactly-built bitmap —
   false negatives on seen URLs.  The fix keeps _h1/_h2 non-null
   JVM-side and carries validity as a separate _hvalid boolean.  The
   round-3 test didn't catch this because its 4 candidate rows each
   landed in their own Arrow batch; these tests force every row into
   ONE batch with coalesce(1).

2. Injection drain resilience: a stray non-``batch=<int>`` entry in
   pending/ (temp dir, partial manual write) must be skipped, not
   crash every subsequent drain with ValueError.
"""

import os

import pytest

BLOOM_KW = dict(num_partitions=4, expected_per_partition=1000, fpp=0.01)


class TestBloomNullBatchPrecision:
    @pytest.fixture(scope="class")
    def seen_cands_shards(self, spark):
        from crawlspark.operators.seen import build_bloom

        seen = spark.createDataFrame(
            [(f"http://host{i}.example/path/{i}",) for i in range(200)],
            "url_norm string",
        )
        # every row — all 200 seen URLs plus a null — in ONE partition,
        # hence one Arrow batch (maxRecordsPerBatch default is 10k)
        cands = seen.unionByName(
            spark.createDataFrame([(None,)], "url_norm string")
        ).coalesce(1)
        shards = build_bloom(seen, **BLOOM_KW)
        return seen, cands, shards

    def _check(self, rows):
        seen_flags = [r["maybe_seen"] for r in rows if r["url_norm"] is not None]
        null_flags = [r["maybe_seen"] for r in rows if r["url_norm"] is None]
        assert len(seen_flags) == 200 and len(null_flags) == 1
        # NO false negatives — every seen URL must test "maybe" even
        # sharing its Arrow batch with a null-key row
        assert all(seen_flags)
        assert null_flags == [False]

    def test_collected_shard_probe(self, spark, seen_cands_shards):
        from crawlspark.operators.seen import apply_bloom, collect_shards

        _, cands, shards = seen_cands_shards
        self._check(
            apply_bloom(cands, collect_shards(shards), **BLOOM_KW).collect()
        )

    def test_cogroup_probe(self, spark, seen_cands_shards):
        # null rows now hash to a REAL pid (non-null coalesced hashes),
        # so they share a cogroup with valid rows — same exactness bar
        from crawlspark.operators.seen import apply_bloom_df

        _, cands, shards = seen_cands_shards
        self._check(apply_bloom_df(cands, shards, **BLOOM_KW).collect())

    def test_join_probe(self, spark, seen_cands_shards):
        from crawlspark.operators.seen import apply_bloom_join

        _, cands, shards = seen_cands_shards
        self._check(apply_bloom_join(cands, shards, **BLOOM_KW).collect())


class TestDrainStrayEntry:
    def test_stray_pending_entry_is_skipped(self, spark, tmp_path):
        from crawlspark.streaming.inject import InjectionQueue

        q = InjectionQueue(spark, str(tmp_path / "inj"))
        for b in (10, 2):  # ids that expose lexicographic-vs-numeric too
            spark.createDataFrame(
                [(f"http://inj/b{b}", None)], "url string, state string"
            ).write.mode("overwrite").parquet(
                os.path.join(q.pending_dir, f"batch={b}")
            )
        # stray entries a crashed producer / operator might leave behind
        os.makedirs(os.path.join(q.pending_dir, "batch=tmp"))
        os.makedirs(os.path.join(q.pending_dir, "junk"))

        first = q.drain()  # must not raise; FIFO by numeric batch id
        assert [u for u, _ in first] == ["http://inj/b2", "http://inj/b10"]
        # strays stay pending (never consumed, never crash later drains)
        assert sorted(os.listdir(q.pending_dir)) == ["batch=tmp", "junk"]
        assert q.drain() == []
