#!/bin/bash
# Health-gated lines_net audit loop: probe the host; only when a pure-CPU
# 4->16 probe reads >=3.55 AND membw >=3.35 run one audit, logging results.
# Never runs two audits concurrently (single loop).
cd /root/repo
LOG=audits/lines_net_log.txt
N=${1:-512}
ROUNDS=${2:-40}
for i in $(seq 1 "$ROUNDS"); do
  P=$(python -c "
import bench, json
r = bench.host_control()
print(json.dumps(r))" 2>/dev/null | tail -1)
  CPU=$(echo "$P" | python -c "import sys, json; print(json.load(sys.stdin)['cpu_speedup_Nto4N'])" 2>/dev/null)
  MEM=$(echo "$P" | python -c "import sys, json; print(json.load(sys.stdin)['membw_speedup_Nto4N'])" 2>/dev/null)
  OK=$(python -c "print(1 if float('$CPU' or 0) >= 3.55 and float('$MEM' or 0) >= 3.35 else 0)" 2>/dev/null)
  echo "$(date +%H:%M:%S) probe cpu=$CPU mem=$MEM ok=$OK" >> "$LOG"
  if [ "$OK" = "1" ]; then
    R=$(timeout 300 python audits/lines_net_audit.py "$N" --warm 2>/dev/null | tr '\r' '\n' | grep RESULT)
    echo "$(date +%H:%M:%S) $R (probe cpu=$CPU mem=$MEM)" >> "$LOG"
  fi
  sleep 150
done
