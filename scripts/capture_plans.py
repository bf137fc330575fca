"""Capture .explain(formatted) for every declared query (guide §1).

Usage: python scripts/capture_plans.py <suffix> [sf_dir] [query ...]
Writes plans/r06/<query>_<suffix>.txt for each query (default: all).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"
only = set(sys.argv[3:])

from crawlspark.session import get_spark
import __spark_entry__ as entry

spark = get_spark(app_name="plan-capture", master="local[8]", shuffle_partitions=8)
out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
os.makedirs(out_dir, exist_ok=True)
for name, fn in entry.queries().items():
    if only and name not in only:
        continue
    try:
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    except Exception as ex:
        plan = f"ERROR: {ex}"
    with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
        fh.write(plan)
    print(name, "->", len(plan), "chars")
spark.stop()
