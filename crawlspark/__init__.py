"""crawlspark — a PySpark-native URL-frontier + polite-fetch scheduler.

A brand-new batch-iterative crawl engine with the capabilities of
PuerkitoBio/gocrawl, re-expressed Spark-first: DataFrame waves over
Iceberg/parquet page tables, vectorized Arrow UDFs for URL
canonicalization / HTML extraction / robots evaluation, per-host
politeness as window/lag computations, and a partitioned Bloom
URL-seen sidecar for 10^10-URL frontiers.

Reference semantics: PuerkitoBio/gocrawl v1.1.0 (see SURVEY.md).
"""

__version__ = "0.1.0"

from crawlspark.config import Options, NormalizationFlags  # noqa: F401
