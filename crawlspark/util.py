"""Small shared DataFrame utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Spread a narrow scan across the executor parallelism before
    CPU-heavy per-row work (guide §2.5/§6): a small parquet input
    arrives as ONE split (single row group), so per-row CPU —
    shingling, hashing, vector arithmetic, decode kernels — would run
    on a single core no matter the cluster size.

    CONDITIONAL on the input's current partitioning: when the source
    already carries >= the executor parallelism (the normal shape for
    a large multi-split table — and always the shape at 100 TB), this
    is the identity, so no corpus-wide shuffle is ever added at scale.
    The partition count comes from the physical plan (no job runs).
    """
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    try:
        if df.rdd.getNumPartitions() >= p:
            return df
    except Exception:
        pass  # un-plannable edge (e.g. no partitioner info): fan out
    return df.repartition(p)
