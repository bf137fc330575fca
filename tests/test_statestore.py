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


def _find_iceberg_jar() -> str | None:
    """An iceberg-spark-runtime jar, if one is reachable on this host."""
    import glob
    import os

    env = os.environ.get("ICEBERG_SPARK_RUNTIME_JAR")
    if env and os.path.exists(env):
        return env
    for pat in (
        os.path.expanduser("~/.ivy2/jars/*iceberg-spark-runtime*.jar"),
        os.path.expanduser("~/.m2/**/iceberg-spark-runtime*.jar"),
        "/opt/spark/jars/*iceberg-spark-runtime*.jar",
        "/usr/local/lib/python*/site-packages/pyspark/jars/*iceberg*.jar",
    ):
        hits = glob.glob(pat, recursive=True)
        if hits:
            return hits[0]
    return None


def test_iceberg_live_catalog_smoke():
    """Engine end-to-end through a REAL Iceberg hadoop catalog.

    Runs scripts/iceberg_smoke.py in a subprocess (the catalog conf and
    jar must be set before the JVM starts, so the suite's shared session
    can't host it).  Skipped in this sandbox: no iceberg-spark-runtime
    jar ships in the image and there is no network to fetch one
    (repo1.maven.org fails DNS — verified 2026-08-17, jar-glob re-run
    2026-08-20: no iceberg-spark-runtime jar anywhere on this host).
    On any host with
    the jar, this test exercises create/append/DELETE-retry/snapshots/
    manifest/resume against the live catalog.
    """
    jar = _find_iceberg_jar()
    if jar is None:
        pytest.skip(
            "no iceberg-spark-runtime jar on this host and no network to "
            "fetch one (sandbox: repo1.maven.org does not resolve); set "
            "ICEBERG_SPARK_RUNTIME_JAR=/path/to/jar to run"
        )
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "iceberg_smoke.py")],
        env={**os.environ, "ICEBERG_SPARK_RUNTIME_JAR": jar},
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
