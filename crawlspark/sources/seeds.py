"""Polymorphic seed coercion (reference: urlcontext.go:139-219).

The reference's ``Run(seeds)`` accepts a string, []string, URL, []URL,
map[string]state, map[URL]state or URLContext.  Here: a str, an
iterable of str, a mapping url→state, an iterable of (url, state)
pairs, or an already-built DataFrame with (url[, state]) columns.
Raises TypeError otherwise (the reference panics, urlcontext.go:213-216).
"""

from __future__ import annotations

import json
from collections.abc import Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession

SEED_DDL = "url string, state string"


def _coerce_state(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, str):
        return v
    return json.dumps(v)


def to_seed_rows(seeds) -> list[tuple[str, str | None]]:
    if seeds is None:
        return []
    if isinstance(seeds, str):
        return [(seeds, None)]
    if isinstance(seeds, Mapping):
        return [(str(u), _coerce_state(s)) for u, s in seeds.items()]
    if isinstance(seeds, Iterable):
        out: list[tuple[str, str | None]] = []
        for item in seeds:
            if isinstance(item, str):
                out.append((item, None))
            elif isinstance(item, tuple) and len(item) == 2:
                out.append((str(item[0]), _coerce_state(item[1])))
            else:
                raise TypeError(f"unsupported seed element: {item!r}")
        return out
    raise TypeError(f"unsupported seed type: {type(seeds).__name__}")


def seeds_df(spark: SparkSession, seeds) -> DataFrame:
    if isinstance(seeds, DataFrame):
        from pyspark.sql import functions as F

        cols = seeds.columns
        if "url" not in cols:
            raise TypeError("seed DataFrame must have a 'url' column")
        if "state" not in cols:
            seeds = seeds.withColumn("state", F.lit(None).cast("string"))
        # DataFrame seeds are a SET: duplicate urls would carry
        # identical ordering tuples and both pass the within-wave
        # first-admit test (the list path handles dups via the visited
        # flag instead).  min(state) keeps the reduction deterministic.
        return (
            seeds.select("url", "state")
            .groupBy("url")
            .agg(F.min("state").alias("state"))
        )
    return spark.createDataFrame(to_seed_rows(seeds), schema=SEED_DDL)
