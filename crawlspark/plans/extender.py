"""The engine's extension surface — vectorized analog of the reference's
13-method Extender interface (reference: ext.go:31-54).

Hooks that gate rows are **column-expression factories** (evaluated
JVM-side by Catalyst, whole-stage-codegen'd); only ``visit_fn`` is a
per-page Python function (wrapped in an Arrow-batched pandas UDF).
Counting hooks (Enqueued/Visited/Disallowed/Error/Log) have no callable
form — their invocation counts are stage metrics (SURVEY §5: stage
metrics, not callbacks, are the assertion surface).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from pyspark.sql import Column, DataFrame


@dataclass
class Extender:
    """Hook bundle; every member optional (defaults = reference defaults).

    start:          seeds -> seeds          (ext.go:89-91: passthrough)
    filter_factory: (df, is_visited: Column) -> Column
                    admission predicate given the visited flag
                    (ext.go:172-174: default ``~is_visited``)
    compute_delay:  df -> Column (ms)       given columns opts_delay_ms,
                    robots_delay_ms, last_delay_ms, last_fetch_dur_ms
                    (ext.go:109-114: robots delay if set else options)
    request_get:    df -> Column (bool)     after a HEAD, fetch the GET?
                    (ext.go:159-161: default 2xx status)
    head_factory:   df -> Column (nullable bool) per-URL HeadBeforeGet
                    override — the analog of the reference's Filter hook
                    mutating ctx.HeadBeforeGet (tbldef_test.go:800-861);
                    null → keep the candidate/options value
    visit_fn:       (url_norm, src_url_norm, html_bytes, text) ->
                    list[(url, state)] | None
                    None → engine extracts links; [] → no links at all
                    (the reference's (harvested, doLinks) pair,
                    ext.go:180-182)
    request_robots: host -> bytes | None    cached robots bodies
                    (ext.go:164-166; CachedRobot tbldef_test.go:647-667)
    on_wave_end:    (engine, wave_summary: dict) -> None
                    driver-side hook; may call engine.enqueue(...) — the
                    EnqueueChan analog (crawler.go:320-324)
    end:            err -> None
    """

    start: Optional[Callable[[Any], Any]] = None
    filter_factory: Optional[Callable[[DataFrame, Column], Column]] = None
    compute_delay: Optional[Callable[[DataFrame], Column]] = None
    request_get: Optional[Callable[[DataFrame], Column]] = None
    head_factory: Optional[Callable[[DataFrame], Column]] = None
    visit_fn: Optional[Callable] = None
    request_robots: dict[str, bytes] = field(default_factory=dict)
    on_wave_end: Optional[Callable] = None
    end: Optional[Callable[[Optional[str]], None]] = None
    # log(verbosity_flags, msg_level, msg) — the leveled Log hook
    # (ext.go:37, logger.go:10-19); None → the engine buffers enabled
    # lines into CrawlResult.log (the logAssert surface)
    log: Optional[Callable[[int, int, str], None]] = None
    # fetch_transform(fetched_df) -> df — per-fetch hook (ext.go:45,
    # Fetch): rewrite status/html/redirect_to after the pages join,
    # e.g. inject latency/status by URL pattern; None → passthrough
    fetch_transform: Optional[Callable[[DataFrame], DataFrame]] = None
    # fetched_robots(rows: list[(host, status)]) — notification after
    # real (non-cached) robots fetches (ext.go:48, worker.go:172);
    # requires a driver collect of the (small) per-wave new-host set
    fetched_robots: Optional[Callable] = None


@dataclass
class Counters:
    """Hook-invocation counts — the parity assertion surface (the
    reference's spy extender counts, spyext_test.go:100-124)."""

    start: int = 0
    end: int = 0
    filter: int = 0
    enqueued: int = 0
    visit: int = 0
    visited: int = 0
    disallowed: int = 0
    error: int = 0
    fetch: int = 0
    compute_delay: int = 0
    request_robots: int = 0
    request_get: int = 0
    fetched_robots: int = 0
    errors_by_kind: dict[str, int] = field(default_factory=dict)

    def add_error(self, kind: str, n: int) -> None:
        if n:
            self.error += n
            self.errors_by_kind[kind] = self.errors_by_kind.get(kind, 0) + n
