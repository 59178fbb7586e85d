#!/bin/bash
# Round-5 chip measurement queue — run when the trainer is done/paused.
# Each step is individually time-boxed and logged; a wedged RPC kills only
# that step.  Usage: nohup bash scripts/chip_suite_r5.sh & (logs to
# runs/chip_suite_r5/)
set -u
cd /root/repo
OUT=runs/chip_suite_r5
mkdir -p $OUT

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%FT%TZ)" >> $OUT/suite.log
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%FT%TZ)" >> $OUT/suite.log
}

# 1. MXU envelope probes (VERDICT r4 #1: measured not projected envelope)
run mxu_probes 2400 python scripts/bench_mxu_probes.py

# 2. scatter K-split A/B at 1M (decide whether to default it)
GPUMD_SCATTER_KSPLIT=4 GPUMD_BENCH_STEPS=60 \
  run bench_ksplit4 2700 python bench.py

# 3. rebuild top_k A/B (decide GPUMD_REBUILD_TOPK default)
GPUMD_REBUILD_TOPK=1 GPUMD_BENCH_STEPS=60 \
  run bench_topk 2700 python bench.py

# 4. Tersoff 1M refresh (BASELINE round-5 row)
GPUMD_BENCH_MODE=tersoff run bench_tersoff 2700 python bench.py

# 5. HNEMD 1M throughput refresh
GPUMD_BENCH_MODE=hnemd run bench_hnemd 2700 python bench.py

# 6. HNEMD kappa sanity (32k trained PbTe; VERDICT r4 #5 value)
GPUMD_KAPPA_STEPS=20000 run kappa_sanity 5400 python scripts/hnemd_kappa_sanity.py

# 7. graphene config 4 as written (deck + goldens comparison)
run config4 3600 python scripts/graphene_config4.py

echo "SUITE DONE $(date -u +%FT%TZ)" >> $OUT/suite.log
