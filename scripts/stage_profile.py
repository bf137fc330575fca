"""One-off: run a bench-style crawl with the Spark UI on, then dump the
slowest stages from the UI REST API.  Diagnostic only.

Usage: python scripts/stage_profile.py <cores> <pages> <seeds> [waves] [shuffle]
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
shuffle = int(sys.argv[5]) if len(sys.argv) > 5 else cores
hosts_n = max(100, pages_n // 100)

import bench  # noqa: E402

bench.BENCH_PAGES = pages_n
bench.BENCH_HOSTS = hosts_n
bench.BENCH_SEEDS = seeds_n
bench.BENCH_WAVES = waves
bench.CACHE = f"/root/repo/.bench_cache/pages_{pages_n}_{hosts_n}"

from crawlspark.session import get_spark  # noqa: E402

bench._pin_cpus(cores)
extra = {"spark.ui.enabled": "true", "spark.ui.port": "4049"}
# extra session conf as JSON, e.g. '{"spark.default.parallelism": "2"}'
extra.update(json.loads(os.environ.get("SPARK_GRAFT_PROFILE_EXTRA", "{}")))
spark = get_spark(
    app_name="stage-profile",
    master=f"local[{cores}]",
    shuffle_partitions=shuffle,
    extra_conf=extra,
)
pages_path = bench._ensure_pages(spark)
res = bench._crawl_once(spark, pages_path)
print("RUN", json.dumps(res))

app_id = spark.sparkContext.applicationId
url = f"http://localhost:4049/api/v1/applications/{app_id}/stages?status=complete"
stages = json.loads(urllib.request.urlopen(url).read())
rows = []
for s in stages:
    dur = s.get("executorRunTime", 0)  # task wall — inflates when the
    # host is contended; executorCpuTime (ns) is the honest CPU burn
    cpu_ns = s.get("executorCpuTime", 0)
    gc_ms = s.get("jvmGcTime", 0)
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
            round(cpu_ns / 1e9, 1),
            round(gc_ms / 1000, 1),
            s["numTasks"],
            round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            round(s.get("memoryBytesSpilled", 0) / 1e6, 1),
            round(s.get("diskBytesSpilled", 0) / 1e6, 1),
            s["name"][:90],
        )
    )
rows.sort(reverse=True)
print("wall_s stage taskwall_s cpu_s gc_s tasks shufR_MB shufW_MB memSpill_MB diskSpill_MB name")
for r in rows[:25]:
    print(*r)
tot_run = sum(s.get("executorRunTime", 0) for s in stages) / 1000
tot_cpu = sum(s.get("executorCpuTime", 0) for s in stages) / 1e9
tot_gc = sum(s.get("jvmGcTime", 0) for s in stages) / 1000
print(
    f"TOTAL taskwall_s={tot_run:.1f} cpu_s={tot_cpu:.1f} "
    f"gc_s={tot_gc:.1f} stages={len(stages)}"
)

# driver-gap accounting: wall covered by RUNNING jobs vs the gaps
# between them (pure driver/Catalyst/commit latency, the non-scaling
# component of the crawl wall)
from datetime import datetime  # noqa: E402

jobs = json.loads(
    urllib.request.urlopen(
        f"http://localhost:4049/api/v1/applications/{app_id}/jobs"
    ).read()
)


def _ts(s):
    return datetime.strptime(s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")


iv = sorted(
    (_ts(j["submissionTime"]), _ts(j["completionTime"]))
    for j in jobs
    if j.get("submissionTime") and j.get("completionTime")
)
covered = 0.0
span = (iv[-1][1] - iv[0][0]).total_seconds() if iv else 0.0
cur_a, cur_b = iv[0] if iv else (None, None)
for a, b in iv[1:]:
    if a > cur_b:
        covered += (cur_b - cur_a).total_seconds()
        cur_a, cur_b = a, b
    elif b > cur_b:
        cur_b = b
if iv:
    covered += (cur_b - cur_a).total_seconds()
print(
    f"JOBS n={len(jobs)} span_s={span:.1f} in_job_s={covered:.1f} "
    f"gap_s={span - covered:.1f}"
)

# process-tree CPU attribution: JVM vs Python workers.  Stage-level
# executorCpuTime misses everything Python-side (pandas UDF workers are
# separate processes the JVM merely waits on); /proc utime+stime of the
# live tree plus reaped-children time (cutime/cstime) shows where the
# host's CPU actually went.
tck = os.sysconf("SC_CLK_TCK")
own_by_kind: dict[str, float] = {}
for pdir in os.listdir("/proc"):
    if not pdir.isdigit():
        continue
    try:
        with open(f"/proc/{pdir}/cmdline", "rb") as fh:
            cmd = fh.read().replace(b"\0", b" ").decode(errors="replace")
        with open(f"/proc/{pdir}/stat") as fh:
            f = fh.read().rsplit(") ", 1)[1].split()
    except OSError:
        continue
    own = (int(f[11]) + int(f[12])) / tck
    reaped = (int(f[13]) + int(f[14])) / tck
    if "java" in cmd and "spark" in cmd.lower():
        kind = "jvm"
    elif "pyspark.daemon" in cmd or "pyspark.worker" in cmd:
        kind = "pyworker"
    elif int(pdir) == os.getpid():
        kind = "driver"
    else:
        continue
    own_by_kind[kind] = own_by_kind.get(kind, 0.0) + own
    own_by_kind[kind + "+reaped"] = (
        own_by_kind.get(kind + "+reaped", 0.0) + reaped
    )
print("PROCCPU " + json.dumps({k: round(v, 1) for k, v in own_by_kind.items()}))
spark.stop()
