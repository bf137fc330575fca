"""Physical-plan quality gates — the 100-TB checklist:
filters/projections reach the parquet scan, the bucketed pages side of
the fetch join does not re-shuffle, expressions stay in whole-stage
codegen."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_str(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_parquet_pushdown_and_pruning(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    p = plan_str(q)
    assert "PushedFilters" in p
    assert "GreaterThan(l_quantity,30.0)" in p
    # column pruning: only the two selected columns in ReadSchema
    rs = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in rs and "l_quantity" in rs
    assert "l_extendedprice" not in rs and "l_shipdate" not in rs


def test_fetch_join_reuses_bucketed_pages_partitioning(spark, tmp_path):
    """With PagesSource(persist=True) the pages side is hash-partitioned
    on the fetch key at construction; the per-wave fetch join must not
    introduce a second Exchange for that side."""
    from crawlspark.fixtures import fixture_pages_df
    from crawlspark.sources.pages import PagesSource

    src = PagesSource(fixture_pages_df(spark), versioned=False, persist=True)
    src.pages.count()  # materialize the cache
    batch = spark.createDataFrame(
        [("http://hosta/page1.html",), ("http://hostb/page2.html",)],
        "url_norm string",
    )
    joined = src.fetch(batch)
    p = plan_str(joined)
    # the cached, pre-partitioned pages side must appear as an in-memory
    # scan NOT preceded by a fresh Exchange in this query
    assert "InMemoryTableScan" in p or "TableCacheQueryStage" in p
    # exactly one shuffle may target the join keys: the batch side
    n_exchanges = p.count("Exchange hashpartitioning(fetch_host")
    assert n_exchanges <= 1, f"pages side re-shuffled:\n{p}"


def test_group_agg_whole_stage_codegen(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.groupBy("l_returnflag").agg(
        F.sum(F.round(F.col("l_quantity") * 100).cast("bigint")).alias("s")
    )
    import io
    from contextlib import redirect_stdout

    # pre-execution plan: map-side combine (partial_sum) + single shuffle
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain()
    p = buf.getvalue()
    assert "partial_sum" in p, p
    assert p.count("Exchange hashpartitioning") == 1, p

    # post-execution (AQE-final) plan: whole-stage codegen spans present
    q.collect()
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain()
    p = buf.getvalue()
    assert "*(" in p or "isFinalPlan=true" in p, p


def test_politeness_schedule_single_host_shuffle(spark):
    """The schedule's seq + cumsum windows share the host partitioning —
    Catalyst must plan ONE exchange on host, not two."""
    from crawlspark.config import Options
    from crawlspark.operators.schedule import politeness_schedule

    rows = spark.createDataFrame(
        [("h1", None, None, 1, 0, "h", 1, 0), ("h1", None, None, 2, 0, "h", 2, 0)],
        "host string, robots_delay_ms int, next_free_ms bigint, fetch_rank int, "
        "ord_wave int, ord_host string, ord_seq bigint, ord_pos int",
    )
    import re

    sched = politeness_schedule(rows, Options(crawl_delay_ms=100))
    p = plan_str(sched)
    n_exchange_nodes = len(re.findall(r"^\(\d+\) Exchange", p, re.M))
    assert n_exchange_nodes == 1, p
    n_windows = len(re.findall(r"^\(\d+\) Window", p, re.M))
    assert n_windows >= 2  # seq row_number + cumsum share the exchange
