#!/bin/bash
# Round-4 measurement experiments (run sequentially on a quiet host):
#  1. instrumented big-seen A/B pair  -> WHERE does bloom lose wave 3?
#  2. deep-arm steady-state variants  -> which cap/seeds hold wave size flat?
# Each arm is the same fresh-process protocol bench.py uses officially.
set -u
cd /root/repo
OUT=${1:-/tmp/r4_experiments}
mkdir -p "$OUT"

echo "== 1a. bs_plain, phase-timed =="
CRAWLSPARK_TIMING=1 SPARK_GRAFT_BENCH_SEEDS=200000 \
  python bench.py --crawl-rep 8 --bigseen 16000000 \
  > "$OUT/bs_plain.log" 2>&1
echo "== 1b. bs_bloom, phase-timed =="
CRAWLSPARK_TIMING=1 SPARK_GRAFT_BENCH_SEEDS=200000 \
  python bench.py --crawl-rep 8 --bigseen 16000000 --bloom \
  > "$OUT/bs_bloom.log" 2>&1

echo "== 2a. deep cap=5 seeds=100k =="
SPARK_GRAFT_BENCH_DEEP_CAP=5 SPARK_GRAFT_BENCH_DEEP_SEEDS=100000 \
  python bench.py --crawl-rep 8 --deep 10 \
  > "$OUT/deep_c5_s100k.log" 2>&1

echo "== 2b. deep cap=5 seeds=50k =="
SPARK_GRAFT_BENCH_DEEP_CAP=5 SPARK_GRAFT_BENCH_DEEP_SEEDS=50000 \
  python bench.py --crawl-rep 8 --deep 10 \
  > "$OUT/deep_c5_s50k.log" 2>&1

echo "done"
