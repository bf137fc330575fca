"""Deterministic synthesis of the `pages` table.

Two generators:

1. :func:`fixture_pages_rows` — the eight miniature golden site graphs
   (FIXTURES.md §3; same link structure and robots bodies as the
   reference's testdata/, re-authored HTML) used by the parity tests.
   robots.txt bodies are ordinary rows at path ``/robots.txt``, exactly
   like the reference's file-based fetcher (fileext_test.go:25-55).
2. :func:`synthetic_pages` — a seeded pseudo-random Common-Crawl-style
   graph with Zipf-distributed host sizes (hot-host skew) for the
   benchmark; generated distributively (mapInPandas over spark.range),
   no driver-side materialization, no external data.

`text` is produced by the pinned extraction oracle so the byte-identity
invariant (engine output ≡ oracle output) is meaningful.
"""

from __future__ import annotations

import datetime

from crawlspark.functions.extract import extract_text

FIXTURE_WARC_TS = datetime.datetime(2021, 5, 19, 0, 0, 0)

# host -> path -> (base_href | None, [href, ...]) ; link targets in DOM order
FIXTURE_GRAPHS: dict[str, dict[str, tuple[str | None, list[str]]]] = {
    "hosta": {
        "/page1.html": (None, ["page2.html", "page3.html", "http://hostb/page1.html"]),
        "/page2.html": (None, ["page1.html", "page3.html", "http://hostb/page1.html"]),
        "/page3.html": (None, ["page1.html", "http://hostb/page1.html", "http://hostc/page2.html"]),
        "/page4.html": (None, ["page5.html", "http://hostc/page3.html"]),
        "/page5.html": (None, []),
    },
    "hostb": {
        "/page1.html": (None, ["page1.html", "page2.html", "http://hostc/page1.html"]),
        "/page2.html": (
            None,
            ["page1.html", "unknown.html", "http://hosta/page1.html", "http://hostunknown/page1.html"],
        ),
        "/pageunlinked.html": (None, ["page1.html", "http://hosta/page1.html"]),
    },
    "hostc": {
        "/page1.html": (None, ["page2.html", "http://hosta/page2.html"]),
        "/page2.html": (None, ["page1.html"]),
        "/page3.html": (None, ["http://hostd/page1.html"]),
    },
    "hostd": {
        "/index.html": ("/index.html", ["/subdir/page2.html"]),
        "/subdir/page1.html": ("/", ["/subdir/page2.html"]),
        # two base tags: the FIRST one wins (worker.go:369: Attr returns
        # the first match) — page3.html must resolve to /page3.html
        "/subdir/page2.html": ("FIRST_OF:/,/subdir", ["page3.html"]),
        "/page3.html": ("/", ["//localhost:8080/subdir/page1.html"]),
        "/subdir/pagea.html": ("/index.html", ["/subdir/pageb.html"]),
        "/subdir/pageb.html": ("/index.html", []),
    },
    "robota": {
        "/page1.html": (None, ["page1.html", "page2.html"]),
        "/page2.html": (None, []),
    },
    "robotb": {
        "/page1.html": (None, ["page2.html", "page3.html"]),
        "/page2.html": (None, ["page4.html"]),
        "/page3.html": (None, ["page1.html"]),
        "/page4.html": (None, []),
    },
    "robotc": {
        "/page1.html": (None, ["page2.html", "page3.html"]),
        "/page2.html": (None, ["page4.html"]),
        "/page3.html": (None, ["page1.html"]),
        "/page4.html": (None, []),
    },
}

# robots.txt bodies (semantics per the reference fixtures; hosts absent
# from this map have NO robots.txt row → the fetch 404s → allow-all)
FIXTURE_ROBOTS: dict[str, str] = {
    "hosta": "",
    "hostb": "",
    "robota": "User-agent: *\nDisallow: /\n",
    "robotb": "User-agent: Googlebot\nDisallow: /page2.html\n",
    "robotc": (
        "User-agent: *\nDisallow: /\n\n"
        "User-agent: Googlebot\nAllow: /\ncrawl-delay: 0.2\n"
    ),
}


def _render_page(host: str, path: str, base: str | None, hrefs: list[str]) -> bytes:
    title = f"{host}{path}"
    if base == "FIRST_OF:/,/subdir":
        base_html = '<base href="/"/><base href="/subdir"/>'
    elif base is not None:
        base_html = f'<base href="{base}"/>'
    else:
        base_html = ""
    anchors = "\n    ".join(f'<a href="{h}">link</a>' for h in hrefs)
    body = f"""<html>
  <head><title>{title}</title>{base_html}</head>
  <body>
    <h1>Synthetic fixture {title}</h1>
    {anchors}
  </body>
</html>"""
    return body.encode("utf-8")


def fixture_pages_rows() -> list[dict]:
    rows: list[dict] = []
    for host, pages in FIXTURE_GRAPHS.items():
        for path, (base, hrefs) in pages.items():
            html = _render_page(host, path, base, hrefs)
            rows.append(
                {
                    "url": f"http://{host}{path}",
                    "warc_ts": FIXTURE_WARC_TS,
                    "html": html,
                    "text": extract_text(html),
                    "lang": "en",
                }
            )
    for host, body in FIXTURE_ROBOTS.items():
        b = body.encode("utf-8")
        rows.append(
            {
                "url": f"http://{host}/robots.txt",
                "warc_ts": FIXTURE_WARC_TS,
                "html": b,
                "text": body,
                "lang": "en",
            }
        )
    return rows


PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def fixture_pages_df(spark):
    return spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in fixture_pages_rows()],
        schema=PAGES_DDL,
    )


# ----------------------------------------------------------------------
# Synthetic Common-Crawl-style graph (bench input; seeded, distributed)
# ----------------------------------------------------------------------

def zipf_bounds(n_pages: int, n_hosts: int, zipf_s: float = 1.2) -> list[int]:
    """Zipf-proportional CONTIGUOUS id ranges per host (driver-side, tiny):
    host h owns page ids [bounds[h], bounds[h+1]) — same-host link targets
    are then knowable locally, and the rank-0 host is genuinely hot."""
    import numpy as np

    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    w = 1.0 / ranks**zipf_s
    sizes = np.maximum(1, np.round(w / w.sum() * n_pages)).astype(np.int64)
    bounds = np.concatenate([[0], np.cumsum(sizes)])
    bounds[-1] = max(bounds[-1], n_pages)
    return bounds.tolist()


def synthetic_pages(
    spark,
    n_pages: int,
    n_hosts: int,
    links_per_page: int = 8,
    zipf_s: float = 1.2,
    seed: int = 42,
    partitions: int | None = None,
):
    """Seeded pseudo-random pages table with Zipf host-size skew.

    Page i lives on host ``h = zipf_bucket(hash(i))`` so a few hosts own
    a large share of pages (the hot-host case P11 of SURVEY §4).  Links
    are deterministic functions of (seed, page id): mostly same-host
    (crawls are host-local), a fraction cross-host.  Generated with
    mapInPandas over ``spark.range`` — scales to any size without
    touching the driver.
    """
    bounds_list = zipf_bounds(n_pages, n_hosts, zipf_s)

    def gen(batches):
        import numpy as _np
        import pandas as _pd

        _bounds = _np.asarray(bounds_list)
        base_ts = datetime.datetime(2024, 1, 1)
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            host_idx = _np.clip(
                _np.searchsorted(_bounds, ids, side="right") - 1, 0, n_hosts - 1
            )
            rows = []
            for pid, hi in zip(ids.tolist(), host_idx.tolist()):
                local = _np.random.default_rng((seed << 20) ^ pid)
                lo, hi_b = int(_bounds[hi]), int(_bounds[hi + 1])
                n_links = int(local.integers(1, links_per_page + 1))
                hrefs = []
                for _ in range(n_links):
                    if local.random() < 0.85 and hi_b > lo:
                        tgt = int(local.integers(lo, hi_b))  # same-host, exists
                        hrefs.append(f"/p{tgt}.html")
                    else:
                        th = int(local.integers(0, n_hosts))
                        t_lo, t_hi = int(_bounds[th]), int(_bounds[th + 1])
                        tgt = int(local.integers(t_lo, max(t_lo + 1, t_hi)))
                        hrefs.append(f"http://host{th}.example/p{tgt}.html")
                host = f"host{hi}.example"
                path = f"/p{pid}.html"
                html = _render_page(host, path, None, hrefs)
                rows.append(
                    (
                        f"http://{host}{path}",
                        base_ts + datetime.timedelta(seconds=int(pid % 86400)),
                        html,
                        None,
                        "en",
                    )
                )
            yield _pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    rng_df = spark.range(
        0, n_pages, numPartitions=partitions or spark.sparkContext.defaultParallelism
    )
    return rng_df.mapInPandas(gen, schema=PAGES_DDL)
