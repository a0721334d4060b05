#!/bin/bash
# Health-gated stage-profile loop: probe; when healthy run lines_net_profile2
cd /root/repo
LOG=audits/lines_net_log.txt
N=${1:-512}
ROUNDS=${2:-30}
for i in $(seq 1 "$ROUNDS"); do
  P=$(python -c "
import bench, json
r = bench.host_control()
print(json.dumps(r))" 2>/dev/null | tail -1)
  CPU=$(echo "$P" | python -c "import sys, json; print(json.load(sys.stdin)['cpu_speedup_Nto4N'])" 2>/dev/null)
  MEM=$(echo "$P" | python -c "import sys, json; print(json.load(sys.stdin)['membw_speedup_Nto4N'])" 2>/dev/null)
  OK=$(python -c "print(1 if float('$CPU' or 0) >= 3.55 and float('$MEM' or 0) >= 3.35 else 0)" 2>/dev/null)
  echo "$(date +%H:%M:%S) probe cpu=$CPU mem=$MEM ok=$OK (profile_watch)" >> "$LOG"
  if [ "$OK" = "1" ]; then
    echo "--- profile n=$N $(date +%H:%M:%S) (probe cpu=$CPU mem=$MEM)" >> "$LOG"
    timeout 400 python audits/lines_net_profile2.py "$N" 2>/dev/null | grep -v "^\[" >> "$LOG"
    exit 0
  fi
  sleep 120
done
