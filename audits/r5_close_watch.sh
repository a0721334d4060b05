#!/bin/bash
# Round-5 closing record watcher: probe the host every ~55 s; skip probes while
# heavy foreground work (pytest / preflight / bench) is running. On a healthy
# window (cpu>=3.5 AND membw>=3.3) run one lines_net n=512 audit and chain
# n=1024 when the 512 lands under 16 s; on a merely semi-healthy window
# (cpu>=3.3) collect a spiral best-of-3 sample instead (single-process, cheap).
cd /root/repo
LOG=audits/r5_close_log.txt
DEADLINE=${1:-$(( $(date +%s) + 14400 ))}
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if pgrep -f "pytest|correctness_preflight|bench.py" >/dev/null 2>&1; then
    echo "$(date +%H:%M:%S) busy-skip (close)" >> "$LOG"; sleep 60; continue
  fi
  P=$(python -c "import bench,json;print(json.dumps(bench.host_control()))" 2>/dev/null | tail -1)
  CPU=$(echo "$P" | python -c "import sys,json;print(json.load(sys.stdin)['cpu_speedup_Nto4N'])" 2>/dev/null)
  MEM=$(echo "$P" | python -c "import sys,json;print(json.load(sys.stdin)['membw_speedup_Nto4N'])" 2>/dev/null)
  OK=$(python -c "print(1 if float('$CPU' or 0) >= 3.5 and float('$MEM' or 0) >= 3.3 else 0)" 2>/dev/null)
  SEMI=$(python -c "print(1 if float('$CPU' or 0) >= 3.3 else 0)" 2>/dev/null)
  echo "$(date +%H:%M:%S) probe cpu=$CPU mem=$MEM ok=$OK semi=$SEMI (close)" >> "$LOG"
  if [ "$OK" = "1" ]; then
    R=$(timeout 300 python audits/lines_net_audit.py 512 --warm 2>/dev/null | tr '\r' '\n' | grep RESULT)
    echo "$(date +%H:%M:%S) LN512 $R (probe cpu=$CPU mem=$MEM)" >> "$LOG"
    W=$(echo "$R" | sed -n 's/.*wall=\([0-9.]*\)s.*/\1/p')
    CH=$(python -c "print(1 if float('$W' or 999) < 16 else 0)" 2>/dev/null)
    if [ "$CH" = "1" ]; then
      R2=$(timeout 420 python audits/lines_net_audit.py 1024 --warm 2>/dev/null | tr '\r' '\n' | grep RESULT)
      echo "$(date +%H:%M:%S) LN1024 $R2 (chained after n=512 ${W}s)" >> "$LOG"
    fi
  elif [ "$SEMI" = "1" ]; then
    S=$(timeout 180 python audits/spiral_audit.py 65536 2>/dev/null | grep wall=)
    echo "$(date +%H:%M:%S) SPIRAL $S (probe cpu=$CPU mem=$MEM)" >> "$LOG"
  else
    sleep 55
  fi
done
echo "$(date +%H:%M:%S) close watch done" >> "$LOG"
