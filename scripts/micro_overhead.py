"""Micro-benchmark of per-job framework overhead in this sandbox.

Times: trivial count, small shuffle, pandas-UDF pass, localCheckpoint —
each 3x at a given core count. Identifies the fixed per-job latency
floor that caps wave-loop scaling efficiency.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from crawlspark.session import get_spark  # noqa: E402

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores * 2)


@F.pandas_udf("long")
def plus_one(s: pd.Series) -> pd.Series:
    return s + 1


def t(label, fn, n=3):
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    print(f"{label}: " + " ".join(f"{x:.2f}" for x in times))


df = spark.range(100_000).withColumn("k", F.col("id") % 1000)
df2 = spark.range(100_000).withColumn("k", F.col("id") % 1000)

t("trivial_count", lambda: spark.range(1000).count())
t("shuffle_groupby", lambda: df.groupBy("k").count().count())
t("join_shuffle", lambda: df.join(df2, "k").count())
t("pandas_udf_pass", lambda: df.select(plus_one("id")).count())
t("local_checkpoint", lambda: df.limit(50_000).localCheckpoint(eager=True))
t(
    "window_cumsum",
    lambda: df.withColumn(
        "c",
        F.sum("id").over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                "k"
            ).orderBy("id")
        ),
    ).count(),
)
spark.stop()
