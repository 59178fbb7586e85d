#!/bin/bash
# Hung-RPC watchdog for the 20k-generation trainer parity run (BASELINE
# config 5).  The axon device tunnel occasionally wedges a client RPC
# (the process sits in futex_do_wait forever; round-4 incident + round-5
# recurrence at gen 2600).  The hang is CLIENT-side: killing the wedged
# process restores the tunnel instantly, and the trainer writes
# nep.restart every 100 generations, so kill+resume loses <=100 gens.
#
# Usage: nohup bash scripts/trainer_watchdog.sh &
set -u
WORK=${GPUMD_PARITY_WORKDIR:-/root/repo/runs/nep_parity_r5}
GENS=${GPUMD_PARITY_GENS:-20000}
LOG=${TRAINER_LOG:-/root/repo/runs/trainer_r5.log}
STALL=${TRAINER_STALL_S:-900}
export GPUMD_PARITY_GENS=$GENS GPUMD_PARITY_WORKDIR=$WORK GPUMD_PARITY_RESUME=1
cd /root/repo

done_check() {
  python - "$WORK/loss.out" "$GENS" <<'EOF'
import sys
try:
    last = None
    for line in open(sys.argv[1]):
        parts = line.split()
        if len(parts) >= 7:
            try:
                row = [float(v) for v in parts]
            except ValueError:
                continue
            last = row
    sys.exit(0 if last is not None and last[0] >= float(sys.argv[2]) else 1)
except OSError:
    sys.exit(1)
EOF
}

while true; do
  if done_check; then break; fi
  setsid python scripts/trainer_parity.py >> "$LOG" 2>&1 &
  PID=$!
  START=$(date +%s)
  echo $PID > /tmp/trainer.pid
  echo "WATCHDOG: (re)started pid $PID $(date -u +%FT%TZ)" >> "$LOG"
  while kill -0 $PID 2>/dev/null; do
    sleep 30
    last=$(stat -c %Y "$WORK/loss.out" 2>/dev/null || echo 0)
    now=$(date +%s)
    if [ "$last" -ge "$START" ]; then
      # this attempt has produced rows (normal cadence ~45 s/row):
      # a wedged RPC shows up fast — kill after STALL_HOT
      thresh=${TRAINER_STALL_HOT_S:-240}
    else
      # still in startup/recompile (first fused chunk ~5 min through a
      # degraded tunnel): be lenient
      last=$START
      thresh=$STALL
    fi
    if [ $((now - last)) -gt "$thresh" ]; then
      echo "WATCHDOG: stall >${STALL}s, killing pg $PID $(date -u +%FT%TZ)" >> "$LOG"
      kill -- -$PID 2>/dev/null; sleep 5; kill -9 -- -$PID 2>/dev/null; sleep 8
      break
    fi
  done
  sleep 10
done
echo "WATCHDOG: run complete $(date -u +%FT%TZ)" >> "$LOG"
