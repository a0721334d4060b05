#!/bin/bash
# Health-gated measurement loop, round-4 continuation: prioritize lines_net
# n=512 (the open <=15s VERDICT target), with an n=1024 reading every 3rd
# healthy window. Gate: pure-CPU 4->16 probe >= 3.55 and membw >= 3.3.
cd /root/repo
LOG=audits/lines_net_log.txt
ROUNDS=${1:-90}
STEP=0
for i in $(seq 1 "$ROUNDS"); do
  P=$(python -c "
import bench, json
r = bench.host_control()
print(json.dumps(r))" 2>/dev/null | tail -1)
  CPU=$(echo "$P" | python -c "import sys, json; print(json.load(sys.stdin)['cpu_speedup_Nto4N'])" 2>/dev/null)
  MEM=$(echo "$P" | python -c "import sys, json; print(json.load(sys.stdin)['membw_speedup_Nto4N'])" 2>/dev/null)
  OK=$(python -c "print(1 if float('$CPU' or 0) >= 3.55 and float('$MEM' or 0) >= 3.3 else 0)" 2>/dev/null)
  echo "$(date +%H:%M:%S) probe cpu=$CPU mem=$MEM ok=$OK step=$STEP" >> "$LOG"
  if [ "$OK" = "1" ]; then
    case $((STEP % 3)) in
      0|1)
        R=$(timeout 300 python audits/lines_net_audit.py 512 --warm 2>/dev/null | tr '\r' '\n' | grep RESULT)
        echo "$(date +%H:%M:%S) WARM $R (probe cpu=$CPU mem=$MEM)" >> "$LOG" ;;
      2)
        R=$(timeout 500 python audits/lines_net_audit.py 1024 --warm 2>/dev/null | tr '\r' '\n' | grep RESULT)
        echo "$(date +%H:%M:%S) WARM $R (probe cpu=$CPU mem=$MEM)" >> "$LOG" ;;
    esac
    STEP=$((STEP+1))
  fi
  sleep 120
done
