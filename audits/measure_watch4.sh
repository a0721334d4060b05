#!/bin/bash
# Health-gated: alternate lines_net 1024 / 512 audits on healthy probes
# (post int32 fused-transfer narrowing).
cd /root/repo
LOG=audits/lines_net_log.txt
ROUNDS=${1:-60}
STEP=0
for i in $(seq 1 "$ROUNDS"); do
  P=$(python -c "
import bench, json
r = bench.host_control()
print(json.dumps(r))" 2>/dev/null | tail -1)
  CPU=$(echo "$P" | python -c "import sys, json; print(json.load(sys.stdin)['cpu_speedup_Nto4N'])" 2>/dev/null)
  MEM=$(echo "$P" | python -c "import sys, json; print(json.load(sys.stdin)['membw_speedup_Nto4N'])" 2>/dev/null)
  OK=$(python -c "print(1 if float('$CPU' or 0) >= 3.55 and float('$MEM' or 0) >= 3.3 else 0)" 2>/dev/null)
  echo "$(date +%H:%M:%S) probe cpu=$CPU mem=$MEM ok=$OK step=$STEP (watch4)" >> "$LOG"
  if [ "$OK" = "1" ]; then
    case $((STEP % 2)) in
      0)
        R=$(timeout 500 python audits/lines_net_audit.py 1024 --warm 2>/dev/null | tr '\r' '\n' | grep RESULT)
        echo "$(date +%H:%M:%S) NARROW $R (probe cpu=$CPU mem=$MEM)" >> "$LOG" ;;
      1)
        R=$(timeout 300 python audits/lines_net_audit.py 512 --warm 2>/dev/null | tr '\r' '\n' | grep RESULT)
        echo "$(date +%H:%M:%S) NARROW $R (probe cpu=$CPU mem=$MEM)" >> "$LOG" ;;
    esac
    STEP=$((STEP+1))
    if [ "$STEP" -ge 6 ]; then break; fi
  else
    sleep 20
  fi
done
