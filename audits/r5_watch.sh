#!/bin/bash
# Round-5 health-gated measurement loop: probe the host; on healthy windows
# (pure-CPU 4->16 probe >=3.5 AND membw >=3.3) alternate lines_net 512 /
# lines_net 1024 / spiral audits; on semi-healthy windows (cpu >= 3.2) run
# the cheap scalar spiral only. Single loop, never concurrent audits.
cd /root/repo
LOG=audits/r5_watch_log.txt
ROUNDS=${1:-120}
STEP=0
SPIRAL_STEP=0
for i in $(seq 1 "$ROUNDS"); do
  P=$(python -c "
import bench, json
r = bench.host_control()
print(json.dumps(r))" 2>/dev/null | tail -1)
  CPU=$(echo "$P" | python -c "import sys, json; print(json.load(sys.stdin)['cpu_speedup_Nto4N'])" 2>/dev/null)
  MEM=$(echo "$P" | python -c "import sys, json; print(json.load(sys.stdin)['membw_speedup_Nto4N'])" 2>/dev/null)
  OK=$(python -c "print(1 if float('$CPU' or 0) >= 3.5 and float('$MEM' or 0) >= 3.3 else 0)" 2>/dev/null)
  SEMI=$(python -c "print(1 if float('$CPU' or 0) >= 3.2 else 0)" 2>/dev/null)
  echo "$(date +%H:%M:%S) probe cpu=$CPU mem=$MEM ok=$OK semi=$SEMI (r5watch)" >> "$LOG"
  if [ "$OK" = "1" ]; then
    case $((STEP % 3)) in
      0)
        R=$(timeout 300 python audits/lines_net_audit.py 512 --warm 2>/dev/null | tr '\r' '\n' | grep RESULT)
        echo "$(date +%H:%M:%S) LN512 $R (probe cpu=$CPU mem=$MEM)" >> "$LOG" ;;
      1)
        R=$(timeout 500 python audits/lines_net_audit.py 1024 --warm 2>/dev/null | tr '\r' '\n' | grep RESULT)
        echo "$(date +%H:%M:%S) LN1024 $R (probe cpu=$CPU mem=$MEM)" >> "$LOG" ;;
      2)
        R=$(timeout 200 python audits/spiral_audit.py 65536 2>/dev/null | tail -1)
        echo "$(date +%H:%M:%S) SPIRAL $R (probe cpu=$CPU mem=$MEM)" >> "$LOG" ;;
    esac
    STEP=$((STEP+1))
  elif [ "$SEMI" = "1" ] && [ $((SPIRAL_STEP % 3)) = "0" ]; then
    R=$(timeout 200 python audits/spiral_audit.py 65536 2>/dev/null | tail -1)
    echo "$(date +%H:%M:%S) SPIRAL-semi $R (probe cpu=$CPU mem=$MEM)" >> "$LOG"
    SPIRAL_STEP=$((SPIRAL_STEP+1))
    sleep 30
  else
    SPIRAL_STEP=$((SPIRAL_STEP+1))
    sleep 45
  fi
done
