"""Structured Streaming front-end for mid-crawl URL injection.

The reference's ``EnqueueChan`` (crawler.go:112-152, 320-324) lets the
caller push URLs into a *running* crawl.  The batch-iterative engine's
native analog is ``CrawlEngine.enqueue()`` between waves; this module
adds the unbounded-source version (SURVEY §2.10): a Structured
Streaming query reads seed records from a file/socket/Kafka-style
source and lands them in an **injection table** via ``foreachBatch``;
the wave loop drains that table at each wave boundary.

Exactly-once: each micro-batch appends with its batch id; the drain
marks consumed batches by moving files, so a crash between micro-batch
and wave replays idempotently (admission dedups re-injected URLs
anyway — the seen probe makes duplicate injection harmless,
crawler.go:209).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INJECT_DDL = "url string, state string"


def _batch_id(name: str) -> int | None:
    """Batch id from a ``batch=<int>`` directory name, else None."""
    if "=" not in name:
        return None
    tail = name.split("=", 1)[1]
    try:
        return int(tail)
    except ValueError:
        return None


class InjectionQueue:
    """File-backed injection table bridging a stream to the wave loop.

    ``max_rows_per_drain`` bounds the driver-side batch each wave
    boundary takes (``drain`` collects rows to feed ``engine.enqueue``,
    so the bound caps driver memory, not correctness): whole batches
    are consumed until the cap is reached; remaining batches stay in
    ``pending/`` and drain on subsequent waves, FIFO by batch id.  The
    injection path is for trickle enqueues (the EnqueueChan analog) —
    bulk frontiers belong in the seed DataFrame path, which never
    transits the driver.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        max_rows_per_drain: int = 100_000,
    ):
        self.spark = spark
        self.root = root
        self.max_rows_per_drain = max_rows_per_drain
        self.staging_dir = os.path.join(root, "staging")
        self.pending_dir = os.path.join(root, "pending")
        self.consumed_dir = os.path.join(root, "consumed")
        for d in (self.staging_dir, self.pending_dir, self.consumed_dir):
            os.makedirs(d, exist_ok=True)
        self._drains = 0

    # -- producer side ----------------------------------------------------
    def writer(self, seeds_stream: DataFrame):
        """Attach a streaming DataFrame (url, state) as the producer.

        Returns the StreamingQuery; stop it to end injection.
        """

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            # write to staging, then atomically publish the complete
            # batch into pending — drain never sees partial writes
            stage = os.path.join(self.staging_dir, f"batch={batch_id}")
            (
                batch_df.select("url", "state")
                .write.mode("overwrite")
                .parquet(stage)
            )
            target = os.path.join(self.pending_dir, f"batch={batch_id}")
            if not os.path.exists(target):
                os.rename(stage, target)

        return (
            seeds_stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(self.root, "_ckpt"))
            .start()
        )

    # -- consumer side (called by the wave loop / on_wave_end hook) -------
    def drain(self) -> list[tuple[str, str | None]]:
        """Atomically take pending injections (oldest batches first) as
        seed rows, up to ``max_rows_per_drain``; overflow batches stay
        pending for the next wave's drain."""
        # numeric sort: lexicographic order puts batch=10 before
        # batch=2, which with the cap would drain newer batches while
        # older ones stay queued (FIFO-by-batch-id is the contract).
        # Entries that don't parse as batch=<int> (stray temp dirs,
        # partial manual writes) are SKIPPED, not consumed: an
        # unguarded int() would raise on e.g. 'batch=tmp' and
        # permanently break every subsequent drain.
        batches = sorted(
            (
                b
                for b in os.listdir(self.pending_dir)
                if _batch_id(b) is not None
            ),
            key=_batch_id,
        )
        rows: list[tuple[str, str | None]] = []
        for b in batches:
            if rows and len(rows) >= self.max_rows_per_drain:
                break  # cap reached — rest stays queued
            src = os.path.join(self.pending_dir, b)
            df = self.spark.read.schema(INJECT_DDL).parquet(src)
            rows.extend((r["url"], r["state"]) for r in df.collect())
            self._drains += 1
            os.rename(
                src, os.path.join(self.consumed_dir, f"{b}_d{self._drains}")
            )
        return rows

    def on_wave_end(self, engine, summary) -> None:
        """Plug directly into Extender.on_wave_end."""
        rows = self.drain()
        if rows:
            engine.enqueue(rows)


def memory_seed_stream(spark: SparkSession, rate_rows_per_sec: int = 5) -> DataFrame:
    """A tiny self-contained seed stream for tests: the `rate` source
    mapped to synthetic URLs (url, state)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rate_rows_per_sec))
        .load()
        .select(
            F.concat(F.lit("http://streamed/p"), F.col("value").cast("string")).alias(
                "url"
            ),
            F.col("value").cast("string").alias("state"),
        )
    )
