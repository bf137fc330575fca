"""Engine configuration.

Mirrors the reference's run options (reference: options.go:10-78) as a
plain dataclass consumed by the wave loop, plus the URL-normalization
flag set (reference default: purell ``FlagsAllGreedy``,
options.go:17).  The flag constants re-state purell's public
documentation; the normalization itself is implemented from scratch in
:mod:`crawlspark.functions.urlnorm`.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field


class NormalizationFlags(enum.IntFlag):
    """URL normalization flags (purell-compatible, public API surface).

    Only the combinations exercised by the reference's tests are
    correctness-pinned: ``ALL_GREEDY`` (the default,
    reference options.go:17), ``USUALLY_SAFE_NON_GREEDY``
    (tbldef_test.go:1049,1074) and ``SAFE | ADD_TRAILING_SLASH``
    (worker_test.go:39).
    """

    NONE = 0
    LOWERCASE_SCHEME = 1 << 0
    LOWERCASE_HOST = 1 << 1
    UPPERCASE_ESCAPES = 1 << 2
    DECODE_UNNECESSARY_ESCAPES = 1 << 3
    ENCODE_NECESSARY_ESCAPES = 1 << 4
    REMOVE_DEFAULT_PORT = 1 << 5
    REMOVE_EMPTY_QUERY_SEPARATOR = 1 << 6
    REMOVE_TRAILING_SLASH = 1 << 7
    ADD_TRAILING_SLASH = 1 << 8
    REMOVE_DOT_SEGMENTS = 1 << 9
    REMOVE_DIRECTORY_INDEX = 1 << 10
    REMOVE_FRAGMENT = 1 << 11
    FORCE_HTTP = 1 << 12
    REMOVE_DUPLICATE_SLASHES = 1 << 13
    REMOVE_WWW = 1 << 14
    ADD_WWW = 1 << 15
    SORT_QUERY = 1 << 16
    DECODE_DWORD_HOST = 1 << 17
    DECODE_OCTAL_HOST = 1 << 18
    DECODE_HEX_HOST = 1 << 19
    REMOVE_UNNECESSARY_HOST_DOTS = 1 << 20
    REMOVE_EMPTY_PORT_SEPARATOR = 1 << 21

    @classmethod
    def safe(cls) -> "NormalizationFlags":
        return (
            cls.LOWERCASE_SCHEME
            | cls.LOWERCASE_HOST
            | cls.UPPERCASE_ESCAPES
            | cls.DECODE_UNNECESSARY_ESCAPES
            | cls.ENCODE_NECESSARY_ESCAPES
            | cls.REMOVE_DEFAULT_PORT
            | cls.REMOVE_EMPTY_QUERY_SEPARATOR
        )

    @classmethod
    def usually_safe_greedy(cls) -> "NormalizationFlags":
        return cls.safe() | cls.REMOVE_TRAILING_SLASH | cls.REMOVE_DOT_SEGMENTS

    @classmethod
    def usually_safe_non_greedy(cls) -> "NormalizationFlags":
        return cls.safe() | cls.ADD_TRAILING_SLASH | cls.REMOVE_DOT_SEGMENTS

    @classmethod
    def unsafe_greedy(cls) -> "NormalizationFlags":
        return (
            cls.usually_safe_greedy()
            | cls.REMOVE_DIRECTORY_INDEX
            | cls.REMOVE_FRAGMENT
            | cls.FORCE_HTTP
            | cls.REMOVE_DUPLICATE_SLASHES
            | cls.REMOVE_WWW
            | cls.SORT_QUERY
        )

    @classmethod
    def all_greedy(cls) -> "NormalizationFlags":
        return (
            cls.unsafe_greedy()
            | cls.DECODE_DWORD_HOST
            | cls.DECODE_OCTAL_HOST
            | cls.DECODE_HEX_HOST
            | cls.REMOVE_UNNECESSARY_HOST_DOTS
            | cls.REMOVE_EMPTY_PORT_SEPARATOR
        )


FLAGS_SAFE = NormalizationFlags.safe()
FLAGS_USUALLY_SAFE_GREEDY = NormalizationFlags.usually_safe_greedy()
FLAGS_USUALLY_SAFE_NON_GREEDY = NormalizationFlags.usually_safe_non_greedy()
FLAGS_UNSAFE_GREEDY = NormalizationFlags.unsafe_greedy()
FLAGS_ALL_GREEDY = NormalizationFlags.all_greedy()

DEFAULT_USER_AGENT = (
    "Mozilla/5.0 (Windows NT 6.1; rv:15.0) Gecko/20120716 Firefox/15.0a2"
)
DEFAULT_ROBOT_USER_AGENT = "Googlebot (gocrawl v0.4)"


class LogFlags(enum.IntFlag):
    """Leveled log verbosity flags (reference: logger.go:10-19).

    ``Options.log_flags`` selects which levels are emitted; disabled
    levels cost nothing (the engine skips the driver collects that feed
    them).  Lines land in ``CrawlResult.log`` unless ``Extender.log``
    is set."""

    NONE = 0
    ERROR = 1 << 0
    INFO = 1 << 1
    ENQUEUED = 1 << 2
    IGNORED = 1 << 3
    TRACE = 1 << 4
    ALL = ERROR | INFO | ENQUEUED | IGNORED | TRACE


@dataclass
class Options:
    """Static run configuration (reference: options.go:22-78).

    Durations are milliseconds.  ``worker_idle_ttl_waves`` replaces the
    reference's wall-clock ``WorkerIdleTTL`` (options.go:16) with a
    wave-count eviction horizon, the batch-iterative analog: a host
    whose state has been inactive for more than this many waves is
    evicted from ``host_state`` (robots re-fetched on reappearance).
    """

    user_agent: str = DEFAULT_USER_AGENT
    robot_user_agent: str = DEFAULT_ROBOT_USER_AGENT
    max_visits: int = 0  # 0 = unlimited (crawler.go:303-309)
    crawl_delay_ms: int = 5000  # DefaultCrawlDelay = 5s (options.go:15)
    worker_idle_ttl_waves: int = 0  # 0 = never evict
    same_host_only: bool = True
    head_before_get: bool = False
    url_normalization_flags: NormalizationFlags = field(
        default_factory=NormalizationFlags.all_greedy
    )
    # engine knobs (no reference analog — Spark-scale machinery)
    shuffle_partitions: int = 32
    # politeness budget / hot-host backpressure (SURVEY §4 P11, §2.10):
    # at most this many URLs fetched per host per wave (0 = unlimited);
    # the overflow defers to the next wave without re-admission — the
    # batch analog of "a host can only fetch wave_duration/crawl_delay
    # URLs anyway", and the skew bound on the per-host serial dimension
    max_urls_per_host_per_wave: int = 0
    use_bloom_seen: bool = False  # Bloom pre-filter before the seen join
    # leveled log verbosity (logger.go:21-29); NONE = silent and free.
    # Non-NONE levels collect small per-wave frames driver-side (the
    # logAssert parity surface) — a debug/parity mode, not the 100 TB
    # throughput path.
    log_flags: int = 0
    # seen-table increment compaction (the Iceberg rewrite/MERGE analog):
    # the seen set is an append-only list of per-wave increments; probing
    # it re-plans an O(waves)-way union every wave.  Every N waves the
    # increments compact into ONE snapshot (parquet in checkpoint mode,
    # localCheckpoint otherwise) so plan depth and probe cost stay flat
    # on deep frontiers.  0 = never compact.
    seen_compact_every: int = 8
    # hot-host salted sequencing (SURVEY §4 P11): exact per-host
    # seq/cumsum via range-bucketed two-phase ranking instead of a
    # single-partition host window; bit-identical results — turn on for
    # skewed frontiers, off for small parity runs.  Only hosts whose
    # per-wave row count reaches salt_threshold_rows take the salted
    # path (its sampling + materialization cost a full extra pass over
    # the subset); everything below it is a window group one task sorts
    # in milliseconds, so it takes the plain window.  The per-wave hot
    # scan is skipped outright when commit metadata already bounds the
    # wave below the threshold.
    salt_hot_hosts: bool = False
    salt_buckets: int = 0  # 0 → defaultParallelism * 2
    # Residual exposure (documented, ADVICE r5): hot detection reads the
    # PREVIOUS wave's per-host batch sizes, so a host that jumps from
    # ~0 to far beyond this threshold within ONE wave sorts its whole
    # window group in one task for that wave (slow tail / memory
    # pressure, never a wrong result — the salted path is bit-identical
    # for any hot list) and salts from the next wave on.  The per-host
    # jump is unbounded even though aggregate wave growth is ~3x/hop.
    salt_threshold_rows: int = 1_000_000
    bloom_partitions: int = 32
    bloom_expected_per_partition: int = 1_000_000
    bloom_fpp: float = 0.01
    # fold seen increments into the bitmaps only once this many pending
    # rows accumulate (they are probed exactly via broadcast meanwhile);
    # 0 = auto (shard capacity / 8).  Keeps the common wave at ZERO
    # bloom-maintenance jobs.
    bloom_fold_min_rows: int = 0
    # crossover gate: with seen below this many rows the sidecar stays
    # DORMANT (no build, no probe, zero jobs — the exact join alone is
    # cheaper than any pre-filter there) and engages with ONE build
    # pass over the full seen set when it crosses.  0 = engage at run
    # start (small-fixture tests exercise the bloom path directly);
    # -1 (the DEFAULT) = derive the threshold from the measured
    # crossover as a seen/wave RATIO: engage once the metadata-tracked
    # seen set reaches bloom_engage_seen_per_wave_ratio × the current
    # wave's candidate bound.  The official A/B record behind the
    # ratio (BENCH_r05/BASELINE.md): at 16M seen vs a 200k-row wave
    # (80×) bloom is a tie-to-loss across sessions; at 32M vs 100k
    # (320×) it wins decisively (1.94× official) — so the default
    # engages at 160×, between the measured tie and the measured win.
    # The threshold only acts when the engine can know the seen row
    # count from commit metadata (durable store); otherwise the bloom
    # engages immediately — dormancy must never risk a stale filter.
    # Caller-prebuilt initial_bloom / resumed shards always engage.
    bloom_min_seen_rows: int = -1
    bloom_engage_seen_per_wave_ratio: int = 160
    # plain exact-probe join strategy below the bloom crossover: when
    # commit metadata bounds the seen table at or under this many rows,
    # hint a broadcast of the seen side (broadcast-hash left join, no
    # exchange of either side).  DEFAULT OFF: a controlled deep-arm A/B
    # (10 waves, seen growing 50k→566k) measured the hint 34% SLOWER
    # end-to-end (152.8s vs 114.1s) — re-collecting and re-broadcasting
    # a growing seen table every wave costs more than the AQE shuffle
    # join it replaces, and the fitted marginal per-fetch cost of the
    # shuffle path is already flat in seen size (33us/fetch early AND
    # late).  Kept as an opt-in for cluster topologies where driver
    # bandwidth is cheaper than a cross-node exchange.
    broadcast_seen_max_rows: int = 0
    # probe strategy: "join" broadcasts the shard words and bit-tests
    # in pure JVM expressions (no Python, no candidate shuffle — the
    # fast path while the filter fits a broadcast); "cogroup" keeps
    # shards fully distributed (the ~12 GB 10^10-URL regime)
    bloom_probe: str = "join"
    checkpoint_dir: str | None = None  # None → in-memory localCheckpoint
    # durable-state backend override (sources/statestore.py StateStore);
    # None → ParquetStateStore(checkpoint_dir) when checkpoint_dir is
    # set.  On a cluster pass IcebergStateStore(spark, catalog=...) —
    # the engine's commit points and read-back contract are identical.
    state_store: object | None = None
    max_waves: int = 1000  # safety stop for the fixpoint loop
    collect_logs: bool = True  # False: skip visit/fetch/error logs
    # (counters stay exact) — the throughput configuration
    parallel_checkpoints: bool = False  # overlap end-of-wave state
    # commits via concurrent driver threads (Spark job-level parallelism;
    # per-partition cache locks prevent duplicate compute)
