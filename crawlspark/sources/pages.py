"""The pages table as fetch source.

Fetching is a join against an Iceberg/parquet table of
Common-Crawl-style pages ``(url, warc_ts, html, text, lang)`` — the
sandbox analog of the reference test suite's file-based fetcher
(fileext_test.go:25-55): serve the row whose host+path matches (with a
leading ``www.`` stripped from the REQUEST host, as the file fetcher
does), and report a connection-level fetch error (null status) on a
miss, exactly like the file fetcher's non-nil error.

``pages`` may hold multiple ``warc_ts`` versions per URL; when
``versioned=True`` the source picks the latest (as-of semantics) via a
per-key window — computed ONCE at construction, not per wave.
``persist=True`` caches the keyed table across waves (right for
local/bench scale; on a real cluster leave False and rely on the
Iceberg table's bucket(url) layout so the per-wave fetch join is
storage-partitioned).

robots.txt rows are split into a tiny dedicated table at construction
so per-wave robots fetches never rescan the big pages table.

Optionally a ``redirects(url, status, location)`` side table models
HTTP redirects (reference: worker.go:229-248).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_fetch_key(df: DataFrame, url_col: str) -> DataFrame:
    host = F.lower(F.coalesce(F.parse_url(F.col(url_col), F.lit("HOST")), F.lit("")))
    path = F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit(""))
    return df.withColumn(
        "fetch_host",
        F.when(host.startswith("www."), F.substring(host, 5, 2**30)).otherwise(host),
    ).withColumn("fetch_path", path)


class PagesSource:
    def __init__(
        self,
        pages: DataFrame,
        redirects: DataFrame | None = None,
        versioned: bool = True,
        persist: bool = False,
        buckets: int | None = None,
    ):
        keyed = _with_fetch_key(pages, "url")
        if versioned:
            w = Window.partitionBy("fetch_host", "fetch_path").orderBy(
                F.col("warc_ts").desc()
            )
            keyed = (
                keyed.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        slim = keyed.select("fetch_host", "fetch_path", "html", "text")
        if persist:
            # hash-partition on the fetch key BEFORE persisting: the
            # cached table then advertises HashPartitioning(fetch key),
            # so every wave's fetch join shuffles only the (small)
            # candidate side — the local analog of an Iceberg table
            # bucketed on the fetch key (storage-partitioned join)
            # ... and SORT within partitions on the same key: the cached
            # plan then advertises both HashPartitioning AND the ordering,
            # so the per-wave sort-merge fetch join needs neither an
            # exchange nor a re-sort of the big side (re-sorting 10^6+
            # html-bearing rows per wave was the dominant wave cost and,
            # through sort spills, the main run-to-run variance).  This is
            # the local analog of an Iceberg table with bucket(url) layout
            # + sorted data files.
            n = buckets or slim.sparkSession.sparkContext.defaultParallelism
            slim = (
                slim.repartition(n, "fetch_host", "fetch_path")
                .sortWithinPartitions("fetch_host", "fetch_path")
                .persist()
            )
            self._buckets = n
        else:
            self._buckets = buckets
        self.pages = slim
        # tiny dedicated robots table: one fetch join per wave against
        # this instead of the full pages scan
        self.robots_pages = slim.filter(
            F.lower(F.col("fetch_path")) == "/robots.txt"
        ).persist()
        if (
            redirects is not None
            and versioned
            and "warc_ts" in redirects.columns
        ):
            # as-of semantics aligned with pages: a redirect URL with
            # multiple warc_ts versions serves its LATEST row, computed
            # once at construction (the side table is dim-sized, so the
            # window is cheap and the per-wave join stays broadcast)
            rw = Window.partitionBy("url").orderBy(F.col("warc_ts").desc())
            redirects = (
                redirects.withColumn("_rn", F.row_number().over(rw))
                .filter(F.col("_rn") == 1)
                .drop("_rn", "warc_ts")
            )
        self.redirects = redirects

    def _join(
        self, batch: DataFrame, url_col: str, pages: DataFrame, merge: bool = False
    ) -> DataFrame:
        b = _with_fetch_key(batch, url_col)
        if merge and self._buckets:
            # align the candidate side to the cached table's bucket layout
            # with an EXPLICIT numPartitions: AQE never coalesces a
            # user-specified repartition, so (a) the SMJ lines up 1:1
            # with the sorted cache (no exchange/sort on the big side),
            # and (b) everything downstream of the join — the HTML
            # extraction UDF above all — keeps this parallelism instead
            # of inheriting an AQE-coalesced 1-2 partitions (candidate
            # rows compress so well that coalescing-by-bytes collapses
            # the wave's whole Python stage onto one core).
            b = b.repartition(self._buckets, "fetch_host", "fetch_path")
        pages_side = pages.select(
            "fetch_host",
            "fetch_path",
            F.col("html").alias("_page_html"),
            F.col("text").alias("_page_text"),
        )
        if merge:
            # pin the big fetch join to sort-merge: for a LEFT OUTER join
            # Catalyst can only broadcast the RIGHT side — the pages
            # table — which must never happen at web scale (and, near the
            # size threshold, flip-flops plans run to run).  With the
            # persisted cache hash-partitioned AND sorted on the fetch
            # key the SMJ needs no exchange and no sort on the pages
            # side, so only the (per-wave) candidate batch shuffles.
            pages_side = pages_side.hint("merge")
        joined = b.join(
            pages_side,
            on=["fetch_host", "fetch_path"],
            how="left",
        )

        if self.redirects is not None:
            rd = self.redirects.select(
                F.col("url").alias("_rd_url"),
                F.col("status").alias("_rd_status"),
                F.col("location").alias("_rd_location"),
            )
            joined = joined.join(
                F.broadcast(rd), joined[url_col] == F.col("_rd_url"), "left"
            )
        else:
            joined = joined.withColumn(
                "_rd_status", F.lit(None).cast("int")
            ).withColumn("_rd_location", F.lit(None).cast("string"))

        return (
            joined.withColumn(
                "status",
                F.when(F.col("_rd_status").isNotNull(), F.col("_rd_status"))
                .when(F.col("_page_html").isNotNull(), F.lit(200))
                .otherwise(F.lit(None).cast("int")),
            )
            .withColumn("html", F.when(F.col("status") == 200, F.col("_page_html")))
            .withColumn(
                "page_text", F.when(F.col("status") == 200, F.col("_page_text"))
            )
            .withColumn("redirect_to", F.col("_rd_location"))
            .drop(
                "_page_html", "_page_text",
                "_rd_url", "_rd_status", "_rd_location",
                "fetch_host", "fetch_path",
            )
        )

    def fetch(self, batch: DataFrame, url_col: str = "url_norm") -> DataFrame:
        """Fetch page rows: left join on (host-no-www, path); adds
        status / html / page_text / redirect_to."""
        return self._join(batch, url_col, self.pages, merge=True)

    def fetch_robots(self, batch: DataFrame, url_col: str = "url_norm") -> DataFrame:
        """Fetch robots.txt rows against the tiny robots subtable
        (broadcast-able: one row per host that serves a robots.txt)."""
        return self._join(batch, url_col, self.robots_pages)
