"""Arrow-vectorized pandas UDF wrappers around the pure functions.

One struct-returning UDF per stage keeps Arrow round trips to a
minimum (one batch transfer yields every derived column).  All UDFs
are module-level factories so parsers/caches compile once per Python
worker and are reused across batches (SURVEY §4 P6).
"""

from __future__ import annotations

import json
from functools import lru_cache

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from crawlspark.config import NormalizationFlags as NF
from crawlspark.functions import extract as _extract
from crawlspark.functions import robots as _robots
from crawlspark.functions import urlnorm as _urlnorm

CANON_SCHEMA = StructType(
    [
        StructField("url_norm", StringType()),
        StructField("host", StringType()),
        StructField("path", StringType()),
        StructField("is_robots", BooleanType()),
        StructField("is_abs_http", BooleanType()),
    ]
)


def make_canonicalize_udf(flags: NF):
    """(url) -> struct(url_norm, host, path, is_robots, is_abs_http).

    The single most correctness-critical scalar function (reference:
    urlcontext.go:229-248); one Arrow pass computes every URL-derived
    column the admission pipeline needs.
    """
    flags_value = int(flags)

    @F.pandas_udf(CANON_SCHEMA)
    def canonicalize(url: pd.Series) -> pd.DataFrame:
        from urllib.parse import urlsplit

        flag_set = NF(flags_value)
        norms, hosts, paths, robots_flags, abs_flags = [], [], [], [], []
        for u in url:
            n = _urlnorm.normalize_url(u, flag_set) if u is not None else None
            norms.append(n)
            if n is None:
                hosts.append(None)
                paths.append(None)
                robots_flags.append(False)
                abs_flags.append(False)
                continue
            hosts.append(_urlnorm.split_host(n))
            try:
                p = urlsplit(u).path  # robots check uses the RAW path
            except ValueError:
                p = ""
            paths.append(urlsplit(n).path)
            robots_flags.append(p.lower() == "/robots.txt")
            abs_flags.append(_urlnorm.is_absolute_http(n))
        return pd.DataFrame(
            {
                "url_norm": norms,
                "host": hosts,
                "path": paths,
                "is_robots": robots_flags,
                "is_abs_http": abs_flags,
            }
        )

    return canonicalize


LINKS_SCHEMA = ArrayType(StringType())


@F.pandas_udf(LINKS_SCHEMA)
def extract_links_udf(html: pd.Series, page_url: pd.Series) -> pd.Series:
    """Outlinks in document order (worker.go:385-412); explode downstream."""
    out = []
    for h, u in zip(html, page_url):
        if h is None or u is None:
            out.append([])
        else:
            out.append(_extract.extract_links(bytes(h), u))
    return pd.Series(out)


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Pinned text-extraction spec v1 (functions/extract.py)."""
    return html.map(lambda h: _extract.extract_text(bytes(h)) if h is not None else None)


PAGE_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField("links", ArrayType(StringType())),
    ]
)


@F.pandas_udf(PAGE_SCHEMA)
def extract_page_udf(html: pd.Series, page_url: pd.Series) -> pd.DataFrame:
    """Fused text + link extraction: ONE HTML parse per page yields both
    the pinned-spec text and the resolved outlinks (the engine's hot
    path — parsing twice would double the dominant CPU cost)."""
    texts, links = [], []
    for h, u in zip(html, page_url):
        if h is None:
            texts.append(None)
            links.append([])
            continue
        p = _extract.parse_page(bytes(h))
        texts.append("\n".join(p.text_chunks))
        if u is None:
            links.append([])
        else:
            out = []
            for href in p.hrefs:
                r = _extract.resolve_link(u, href, p.base_href)
                if r is not None:
                    out.append(r)
            links.append(out)
    return pd.DataFrame({"text": texts, "links": links})


@lru_cache(maxsize=4096)
def _parsed_rules(rules_json: str):
    rows = json.loads(rules_json)
    return rows


@F.pandas_udf(BooleanType())
def robots_allowed_udf(rules_json: pd.Series, path: pd.Series) -> pd.Series:
    """Longest-match Allow/Disallow gate; null rules → allow (no robots)."""
    out = []
    for rj, p in zip(rules_json, path):
        if rj is None:
            out.append(True)
        else:
            out.append(_robots.match_rows(_parsed_rules(rj), p or ""))
    return pd.Series(out)


ROBOTS_PARSE_SCHEMA = StructType(
    [
        StructField("rules_json", StringType()),
        StructField("crawl_delay_ms", IntegerType()),
    ]
)


def make_robots_parse_udf(robot_agent: str):
    """(status, body) -> struct(rules_json, crawl_delay_ms).

    Pre-selects the agent's group (FindGroup semantics) so the gate join
    only ever ships the relevant flattened rules.
    """

    @F.pandas_udf(ROBOTS_PARSE_SCHEMA)
    def parse(status: pd.Series, body: pd.Series) -> pd.DataFrame:
        rules_out, delay_out = [], []
        for st, b in zip(status, body):
            st = int(st) if st is not None else 404
            rules = _robots.robots_from_status_and_body(
                st, bytes(b) if b is not None else None
            )
            rows = _robots.rules_to_rows(rules, robot_agent)
            rules_out.append(json.dumps(rows, separators=(",", ":")))
            delay_out.append(rules.crawl_delay_ms(robot_agent))
        return pd.DataFrame(
            {"rules_json": rules_out, "crawl_delay_ms": pd.array(delay_out, dtype="Int32")}
        )

    return parse


VISIT_SCHEMA = ArrayType(
    StructType(
        [StructField("url", StringType()), StructField("state", StringType())]
    )
)


def make_visit_udf(visit_fn):
    """Wrap a user visit function
    (url_norm, src_url_norm, html, text) -> list[(url, state)] | None
    into the per-page harvest-override UDF (Extender.Visit analog,
    ext.go:180-182).  None → engine extracts links itself; an empty
    list → no harvest and no link extraction (doLinks=false)."""

    @F.pandas_udf(VISIT_SCHEMA)
    def visit(
        url_norm: pd.Series, src_url_norm: pd.Series, html: pd.Series, text: pd.Series
    ) -> pd.Series:
        out = []
        for u, s, h, t in zip(url_norm, src_url_norm, html, text):
            res = visit_fn(u, s, bytes(h) if h is not None else None, t)
            if res is None:
                out.append(None)
            else:
                out.append([{"url": ru, "state": rs} for ru, rs in res])
        return pd.Series(out)

    return visit
