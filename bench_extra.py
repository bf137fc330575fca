"""Round-6 optimization measurement harness (guide §1).

Separate from the FROZEN bench.py: times individual queries() entries
with the noop sink (guide §1.4 — every column of every row computed,
no count() pruning) at the same session shape as bench.py's queries
phase (local[$SPARK_GRAFT_QUERY_CPUS], shuffle partitions = cores,
min-of-N in one warm session).

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--sink noop|count] [query ...]

Prints one JSON line: {"sf": ..., "sink": ..., "queries": {name: sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    args = sys.argv[1:]

    def opt(flag, default):
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i:i + 2]
            return v
        return default

    sf_dir = opt("--sf", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    reps = int(opt("--reps", "2"))
    sink = opt("--sink", "noop")
    cpus = int(os.environ.get("SPARK_GRAFT_QUERY_CPUS", "8"))
    only = set(args)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod
    from crawlspark.session import get_spark

    spark = get_spark(
        app_name="bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    qmap = entry_mod.queries()
    if only:
        qmap = {k: v for k, v in qmap.items() if k in only}
    # untimed warmup (session/codegen/Arrow startup)
    first = next(iter(qmap.values()), None)
    if first is not None:
        first(spark, sf_dir).count()

    def run(df) -> None:
        if sink == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    out: dict[str, float] = {}
    for _ in range(reps):
        for name, fn in qmap.items():
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            run(fn(spark, sf_dir))
            dt = round(time.perf_counter() - t0, 3)
            if name not in out or dt < out[name]:
                out[name] = dt
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": sf_dir, "sink": sink, "cpus": cpus, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
