"""The pages table as fetch source.

Fetching is a join against an Iceberg/parquet table of
Common-Crawl-style pages ``(url, warc_ts, html, text, lang)`` — the
sandbox analog of the reference test suite's file-based fetcher
(fileext_test.go:25-55): serve the row whose host+path matches (with a
leading ``www.`` stripped from the REQUEST host, as the file fetcher
does), 404 when the host is known but the path is not, and report a
connection-level fetch error when the host is entirely unknown.

``pages`` may hold multiple ``warc_ts`` versions per URL; the source
picks the latest (as-of semantics) via a per-key window.

Optionally a ``redirects(url, status, location)`` side table models
HTTP redirects (reference: worker.go:229-248): matching request URLs
get the redirect status + Location instead of a body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class PagesSource:
    """Wraps the pages DataFrame with fetch-key columns precomputed.

    The fetch key is ``(host_nowww, path)`` — scheme-insensitive and
    www-insensitive, like the reference's file fetcher.
    """

    def __init__(self, pages: DataFrame, redirects: DataFrame | None = None):
        host = F.lower(F.coalesce(F.parse_url("url", F.lit("HOST")), F.lit("")))
        path = F.coalesce(F.parse_url("url", F.lit("PATH")), F.lit(""))
        keyed = pages.withColumn("_host", host).withColumn("_path", path)
        keyed = keyed.withColumn(
            "fetch_host",
            F.when(F.col("_host").startswith("www."), F.expr("substring(_host, 5)")).otherwise(
                F.col("_host")
            ),
        ).withColumn("fetch_path", F.col("_path"))
        # as-of: latest warc_ts version per fetch key
        w = Window.partitionBy("fetch_host", "fetch_path").orderBy(F.col("warc_ts").desc())
        keyed = (
            keyed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_host", "_path")
        )
        self.pages = keyed
        self.redirects = redirects

    def fetch(self, batch: DataFrame, url_col: str = "url_norm") -> DataFrame:
        """Join a fetch batch against the pages table.

        Adds: status (200 / redirect status / null = miss → like the
        reference's file fetcher, a miss is a connection-level fetch
        error, fileext_test.go:42-47), html, page_text, redirect_to.
        The batch side keeps all its columns.  Pages side is the big
        table: equi join on (fetch_host, fetch_path).
        """
        req_host = F.lower(
            F.coalesce(F.parse_url(F.col(url_col), F.lit("HOST")), F.lit(""))
        )
        req_path = F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit(""))
        b = batch.withColumn(
            "fetch_host",
            F.when(req_host.startswith("www."), F.substring(req_host, 5, 2**30)).otherwise(
                req_host
            ),
        ).withColumn("fetch_path", req_path)

        joined = b.join(
            self.pages.select(
                "fetch_host",
                "fetch_path",
                F.col("html").alias("_page_html"),
                F.col("text").alias("_page_text"),
            ),
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
            joined = joined.withColumn("_rd_status", F.lit(None).cast("int")).withColumn(
                "_rd_location", F.lit(None).cast("string")
            )

        return (
            joined.withColumn(
                "status",
                F.when(F.col("_rd_status").isNotNull(), F.col("_rd_status"))
                .when(F.col("_page_html").isNotNull(), F.lit(200))
                .otherwise(F.lit(None).cast("int")),
            )
            .withColumn(
                "html",
                F.when(F.col("status") == 200, F.col("_page_html")),
            )
            .withColumn(
                "page_text",
                F.when(F.col("status") == 200, F.col("_page_text")),
            )
            .withColumn("redirect_to", F.col("_rd_location"))
            .drop(
                "_page_html", "_page_text",
                "_rd_url", "_rd_status", "_rd_location",
                "fetch_host", "fetch_path",
            )
        )
