"""One-off: run a bench-style crawl with the Spark UI on, then dump the
slowest stages from the UI REST API.  Diagnostic only.

Usage: python scripts/stage_profile.py <cores> <pages> <seeds> [waves]
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

cores = int(sys.argv[1])
pages_n = int(sys.argv[2])
seeds_n = int(sys.argv[3])
waves = int(sys.argv[4]) if len(sys.argv) > 4 else 3
hosts_n = max(100, pages_n // 100)

import bench  # noqa: E402

bench.BENCH_PAGES = pages_n
bench.BENCH_HOSTS = hosts_n
bench.BENCH_SEEDS = seeds_n
bench.BENCH_WAVES = waves
bench.CACHE = f"/root/repo/.bench_cache/pages_{pages_n}_{hosts_n}"

from crawlspark.session import get_spark  # noqa: E402

bench._pin_cpus(cores)
spark = get_spark(
    app_name="stage-profile",
    master=f"local[{cores}]",
    shuffle_partitions=cores,
    extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
)
pages_path = bench._ensure_pages(spark)
res = bench._crawl_once(spark, pages_path)
print("RUN", json.dumps(res))

app_id = spark.sparkContext.applicationId
url = f"http://localhost:4049/api/v1/applications/{app_id}/stages?status=complete"
stages = json.loads(urllib.request.urlopen(url).read())
rows = []
for s in stages:
    dur = s.get("executorRunTime", 0)
    sub = s.get("submissionTime", "")
    wall = None
    try:
        from datetime import datetime

        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        t0 = datetime.strptime(s["firstTaskLaunchedTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
        t1 = datetime.strptime(s["completionTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
        wall = (t1 - t0).total_seconds()
    except Exception:
        pass
    rows.append(
        (
            wall or 0,
            s["stageId"],
            round(dur / 1000, 1),
            s["numTasks"],
            round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            round(s.get("memoryBytesSpilled", 0) / 1e6, 1),
            round(s.get("diskBytesSpilled", 0) / 1e6, 1),
            s["name"][:90],
        )
    )
rows.sort(reverse=True)
print("wall_s stage exec_cpu_s tasks shufR_MB shufW_MB memSpill_MB diskSpill_MB name")
for r in rows[:25]:
    print(*r)
spark.stop()
