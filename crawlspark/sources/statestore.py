"""Wave-state storage seam: parquet today, Iceberg on a real cluster.

The north rule keeps frontier state, URL-seen shards and per-partition
lineage/metrics in **Iceberg tables** committed every wave.  This
sandbox ships no Iceberg runtime, so the engine's durable mode writes
plain parquet dirs (`wave=N/<name>`) — the same commit points, the same
read-back contract.  This module makes that substitution an explicit,
swappable seam instead of prose:

- :class:`ParquetStateStore` — the tested default; exactly what
  ``CrawlEngine._ckpt`` does, factored behind the interface.
- :class:`IcebergStateStore` — the cluster implementation: one
  namespaced table per state name, hidden-partitioned by wave (and
  ``bucket(url)`` for row-keyed tables), append snapshots per wave,
  snapshot-id bookkeeping for resume/rollback.  Constructing it
  verifies the Spark session actually has an Iceberg catalog; every
  operation is plain ``spark.sql``/DataFrameWriterV2 against that
  catalog, so the class is exercised for real the moment a cluster
  provides one (`spark.sql.catalog.<name>` config + iceberg-runtime
  jar) — no other engine change required.

Mapping (parquet analog → Iceberg):

| engine commit | parquet analog | Iceberg |
|---|---|---|
| candidates / seen_inc / host_state / deferred / metrics per wave | `wave=N/<name>` dir overwrite | `append` into `<ns>.<name>` with a `wave` column (hidden partition `identity(wave)`; row-keyed tables add `bucket(url_norm)`) |
| seen snapshot compaction | one `seen_snapshot` dir replacing inc dirs | `rewrite_data_files` / `MERGE INTO` the compacted snapshot |
| MANIFEST.json resume pointer | driver-side JSON | table snapshot ids (`.history()`), `VERSION AS OF` reads |
| row-count fixpoint check | parquet footer scan | `SELECT count(*) ... VERSION AS OF` (metadata-only in Iceberg) |
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class StateStore:
    """Commit/read/count interface the wave loop needs from storage."""

    def commit(self, df: DataFrame, name: str, wave: int) -> DataFrame:
        """Durably write one state table for one wave; return a reader
        DataFrame backed by the committed data (NOT the input plan)."""
        raise NotImplementedError

    def read(self, name: str, wave: int) -> DataFrame:
        raise NotImplementedError

    def rows(self, name: str, wave: int) -> int | None:
        """Exact committed row count from storage METADATA if the
        backend can answer without a job, else None."""
        raise NotImplementedError

    def put_manifest(self, manifest: dict) -> None:
        """Durably record the resume pointer (wave, counters, ...)."""
        raise NotImplementedError

    def get_manifest(self) -> dict:
        raise NotImplementedError


class ParquetStateStore(StateStore):
    """The sandbox default: `wave=N/<name>` parquet dirs under a root
    (`seed/<name>` for pre-wave state), footer-based row counts."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _path(self, name: str, wave: int) -> str:
        subdir = f"wave={wave}" if wave >= 0 else "seed"
        return os.path.join(self.root, subdir, name)

    def commit(self, df: DataFrame, name: str, wave: int) -> DataFrame:
        path = self._path(name, wave)
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)

    def read(self, name: str, wave: int) -> DataFrame:
        return self.spark.read.parquet(self._path(name, wave))

    def rows(self, name: str, wave: int) -> int | None:
        try:
            import pyarrow.dataset as pads

            return pads.dataset(
                self._path(name, wave), format="parquet"
            ).count_rows()
        except Exception:
            return None

    def put_manifest(self, manifest: dict) -> None:
        import json

        with open(os.path.join(self.root, "MANIFEST.json"), "w") as fh:
            json.dump(manifest, fh)

    def get_manifest(self) -> dict:
        import json

        with open(os.path.join(self.root, "MANIFEST.json")) as fh:
            return json.load(fh)


class IcebergStateStore(StateStore):
    """Iceberg-backed state: one table per state name under
    ``<catalog>.<namespace>``, `wave` as a hidden identity partition,
    appends as per-wave snapshot commits.

    Requires an Iceberg catalog on the session (raises RuntimeError
    otherwise, so misconfiguration fails loudly at construction)."""

    #: row-keyed tables additionally bucket by url for co-located probes
    BUCKETED = {"seen_inc": "url_norm", "candidates": "url"}

    def __init__(
        self,
        spark: SparkSession,
        catalog: str,
        namespace: str = "crawlspark",
        buckets: int = 64,
    ):
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
        if not impl:
            raise RuntimeError(
                f"no Iceberg catalog '{catalog}' on this session — set "
                f"spark.sql.catalog.{catalog}=org.apache.iceberg.spark."
                "SparkCatalog (+ iceberg-spark-runtime jar)"
            )
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        self.buckets = buckets
        spark.sql(
            f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}"
        )

    def _table(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def commit(self, df: DataFrame, name: str, wave: int) -> DataFrame:
        from pyspark.sql import functions as F

        tbl = self._table(name)
        out = df.withColumn("_wave", F.lit(wave))
        parts = [F.col("_wave")]
        key = self.BUCKETED.get(name)
        if key is not None and key in df.columns:
            parts.append(F.bucket(self.buckets, F.col(key)))
        writer = out.writeTo(tbl).partitionedBy(*parts)
        # write mode decided by EXISTENCE, never by catching the write's
        # failure: a transient error (commit conflict, connectivity)
        # must propagate, not silently replace the table and destroy
        # every previously committed wave.
        if self.spark.catalog.tableExists(tbl):
            # overwritePartitions only replaces partitions PRESENT in
            # the new data — a retried wave that legitimately produces
            # zero rows would overwrite nothing and leave the failed
            # attempt's stale rows visible.  Delete this wave's
            # partition first so the commit is idempotent even when the
            # incoming DataFrame is empty (partition-pruned metadata
            # delete in Iceberg, no data rewrite), matching the parquet
            # store's unconditional per-(wave, name) dir overwrite.
            self.spark.sql(f"DELETE FROM {tbl} WHERE _wave = {wave}")
            writer.append()
        else:
            writer.create()
        return self.read(name, wave)

    def read(self, name: str, wave: int) -> DataFrame:
        from pyspark.sql import functions as F

        return (
            self.spark.table(self._table(name))
            .filter(F.col("_wave") == wave)
            .drop("_wave")
        )

    def rows(self, name: str, wave: int) -> int | None:
        # Iceberg answers partition-pruned counts from manifest
        # metadata; still a (tiny) job, so report None and let the
        # engine decide — or use the files metadata table:
        try:
            r = self.spark.sql(
                f"SELECT sum(record_count) FROM "
                f"{self._table(name)}.partitions "
                f"WHERE partition._wave = {wave}"
            ).collect()[0][0]
            return int(r) if r is not None else 0
        except Exception:
            return None

    def put_manifest(self, manifest: dict) -> None:
        import json

        self.spark.createDataFrame(
            [(json.dumps(manifest),)], "manifest_json string"
        ).writeTo(self._table("manifest")).createOrReplace()

    def get_manifest(self) -> dict:
        import json

        row = self.spark.table(self._table("manifest")).collect()[0]
        return json.loads(row["manifest_json"])
