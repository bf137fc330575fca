"""SparkSession construction with engine-appropriate defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crawlspark",
    master: str | None = None,
    shuffle_partitions: int = 32,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a session tuned for the frontier pipeline.

    AQE is left ON (runtime coalescing + skew-join splitting are part of
    the scale story, SURVEY §4); Arrow is ON for the vectorized UDF
    families; broadcast threshold stays default so Catalyst broadcasts
    the robots/seed-host dims on its own.
    """
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    b = (
        b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # persistent seen-set anti-join benefits from runtime bloom pruning
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory",
            os.environ.get("CRAWLSPARK_DRIVER_MEM", "24g"),
        )
        # wave state is cut with localCheckpoint; the blocks are freed by
        # the ContextCleaner once the wave's DataFrames are GC'd.  Do NOT
        # make this aggressive: each forced GC floods the single-threaded
        # BlockManagerMaster endpoint with per-block removals, and
        # localCheckpoint's per-partition `contains` RPCs then queue
        # behind them — observed as 30-60s stalls in otherwise sub-second
        # stages (thread dumps: LocalRDDCheckpointData.doCheckpoint →
        # BlockManagerMaster.contains, executors idle).  30min still
        # bounds block accumulation on long crawls.
        .config("spark.cleaner.periodicGC.interval", "30min")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
