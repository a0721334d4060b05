#!/bin/bash
# Round-5 closing lines_net record loop: probe the host every ~50 s; when the
# pure-CPU 4->16 control reads >=3.5 AND membw >=3.3 run one health-gated
# n=512 audit; if that lands under 16 s (a genuinely healthy window) chain an
# n=1024 audit on the same window. Single loop, never two audits at once.
cd /root/repo
LOG=audits/r5_lines_log.txt
DEADLINE=${1:-$(( $(date +%s) + 4200 ))}
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  P=$(python -c "import bench,json;print(json.dumps(bench.host_control()))" 2>/dev/null | tail -1)
  CPU=$(echo "$P" | python -c "import sys,json;print(json.load(sys.stdin)['cpu_speedup_Nto4N'])" 2>/dev/null)
  MEM=$(echo "$P" | python -c "import sys,json;print(json.load(sys.stdin)['membw_speedup_Nto4N'])" 2>/dev/null)
  OK=$(python -c "print(1 if float('$CPU' or 0) >= 3.5 and float('$MEM' or 0) >= 3.3 else 0)" 2>/dev/null)
  echo "$(date +%H:%M:%S) probe cpu=$CPU mem=$MEM ok=$OK (lines5)" >> "$LOG"
  if [ "$OK" = "1" ]; then
    R=$(timeout 300 python audits/lines_net_audit.py 512 --warm 2>/dev/null | tr '\r' '\n' | grep RESULT)
    echo "$(date +%H:%M:%S) $R (probe cpu=$CPU mem=$MEM)" >> "$LOG"
    W=$(echo "$R" | sed -n 's/.*wall=\([0-9.]*\)s.*/\1/p')
    CH=$(python -c "print(1 if float('$W' or 999) < 16 else 0)" 2>/dev/null)
    if [ "$CH" = "1" ]; then
      R2=$(timeout 420 python audits/lines_net_audit.py 1024 --warm 2>/dev/null | tr '\r' '\n' | grep RESULT)
      echo "$(date +%H:%M:%S) $R2 (chained after n=512 ${W}s)" >> "$LOG"
    fi
  else
    sleep 50
  fi
done
echo "$(date +%H:%M:%S) lines5 watch done" >> "$LOG"
