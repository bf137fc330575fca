"""StateStore seam: the parquet backend round-trips through the
interface, the engine produces identical results through an explicit
store, and the Iceberg backend fails loudly without a catalog."""

import pytest
from pyspark.sql import functions as F

from crawlspark.config import Options
from crawlspark.plans.engine import CrawlEngine
from crawlspark.sources.statestore import IcebergStateStore, ParquetStateStore


def test_parquet_store_roundtrip(spark, tmp_path):
    store = ParquetStateStore(spark, str(tmp_path / "st"))
    df = spark.range(100).select(
        F.col("id"), F.concat(F.lit("u"), F.col("id")).alias("url_norm")
    )
    out = store.commit(df, "seen_inc", 3)
    assert out.count() == 100
    assert store.rows("seen_inc", 3) == 100  # footer metadata, no job
    assert store.read("seen_inc", 3).count() == 100
    # seed-stage namespace
    store.commit(df.limit(7), "seed_candidates", -1)
    assert store.rows("seed_candidates", -1) == 7
    assert store.rows("nonexistent", 9) is None


def test_engine_through_explicit_store(spark, fixture_pages, tmp_path):
    ck = str(tmp_path / "ck")
    store = ParquetStateStore(spark, ck)
    res = CrawlEngine(
        spark,
        fixture_pages,
        Options(crawl_delay_ms=100, checkpoint_dir=ck, state_store=store),
    ).run(["http://hosta/page1.html"])
    assert res.counters.visit == 3
    # the store sees every wave's commits
    assert store.rows("candidates", 0) is not None
    assert store.rows("metrics", 0) is not None


def test_iceberg_store_requires_catalog(spark):
    with pytest.raises(RuntimeError, match="no Iceberg catalog"):
        IcebergStateStore(spark, catalog="definitely_absent")
