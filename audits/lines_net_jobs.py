"""Per-Spark-job barrier profile of the lines_net distributed overlay.

Runs the same pipeline as lines_net_audit.py --warm but with the event log
enabled, then parses JobStart/JobEnd events into a job table: description,
wall, task count. Job COUNT and ownership are deterministic; walls are
window-sensitive. Used to attack the ~12-barrier latency floor named in
BENCH.md round 4."""

import glob
import json
import os
import shutil
import sys
import time

os.environ["IOVERLAY_AUDIT_JOBDESC"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)
from pyspark.sql import SparkSession

from test_distributed import lines_net, rings_to_contours_rows

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
LOGDIR = "/tmp/sparklogs_jobs"
shutil.rmtree(LOGDIR, ignore_errors=True)
os.makedirs(LOGDIR, exist_ok=True)
spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "48g")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.compress", "false")
    .config("spark.eventLog.dir", LOGDIR)
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from ioverlay_spark.operators.distributed import contours_to_segments_df, distributed_overlay
from ioverlay_spark.options import FillRule, OverlayRule

subj, clip = lines_net(n, 20)
df = spark.createDataFrame(
    rings_to_contours_rows(subj, clip), ["role", "cid", "pts_x", "pts_y"]
).localCheckpoint(eager=True)


def _noop(it):
    import ioverlay_spark.operators.distributed_extract  # noqa: F401

    for pdf in it:
        yield pdf


spark.range(64).repartition(16).mapInPandas(_noop, "id long").count()
spark.sparkContext.setJobDescription("=== PIPELINE START ===")
spark.range(1).count()
t0 = time.time()
out = distributed_overlay(
    contours_to_segments_df(spark, df),
    OverlayRule.INTERSECT,
    FillRule.EVEN_ODD,
    force_distributed=True,
)
spark.sparkContext.setJobDescription(None)
cnt = out.count()
a2 = out.agg({"area2": "sum"}).first()[0]
dt = time.time() - t0
exp = 2 * n * n * 10 * 10
print(f"RESULT n={n} rings={cnt} area_ok={int(a2) == exp} wall={dt:.1f}s", flush=True)
spark.stop()

starts, ends, descs, ntasks = {}, {}, {}, {}
stage_job = {}  # stage id -> job id
stage_metrics = {}  # stage id -> dict of summed task metrics
paths = [
    p
    for p in glob.glob(os.path.join(LOGDIR, "**", "*"), recursive=True)
    if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
]
for path in paths:
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                starts[jid] = ev["Submission Time"]
                props = ev.get("Properties") or {}
                desc = props.get("spark.job.description") or "?"
                cs = props.get("callSite.short") or ""
                descs[jid] = f"{desc} | {cs}" if cs else desc
                ntasks[jid] = sum(
                    s.get("Number of Tasks", 0) for s in ev.get("Stage Infos", [])
                )
                for s in ev.get("Stage Infos", []):
                    stage_job.setdefault(s["Stage ID"], jid)
            elif e == "SparkListenerJobEnd":
                ends[ev["Job ID"]] = ev["Completion Time"]
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                agg = stage_metrics.setdefault(
                    sid,
                    {"run": 0, "cpu": 0, "deser": 0, "ser": 0, "gc": 0,
                     "sh_w_b": 0, "sh_r_b": 0, "sh_fetch": 0, "sh_wt": 0,
                     "tasks": 0},
                )
                agg["tasks"] += 1
                agg["run"] += m.get("Executor Run Time", 0)
                agg["cpu"] += m.get("Executor CPU Time", 0) // 1_000_000
                agg["deser"] += m.get("Executor Deserialize Time", 0)
                agg["ser"] += m.get("Result Serialization Time", 0)
                agg["gc"] += m.get("JVM GC Time", 0)
                sw = m.get("Shuffle Write Metrics") or {}
                agg["sh_w_b"] += sw.get("Shuffle Bytes Written", 0)
                agg["sh_wt"] += sw.get("Shuffle Write Time", 0) // 1_000_000
                sr = m.get("Shuffle Read Metrics") or {}
                agg["sh_r_b"] += sr.get("Remote Bytes Read", 0) + sr.get(
                    "Local Bytes Read", 0
                )
                agg["sh_fetch"] += sr.get("Fetch Wait Time", 0)

rows = []
for jid in sorted(starts):
    wall = (ends.get(jid, starts[jid]) - starts[jid]) / 1000.0
    rows.append((jid, wall, ntasks.get(jid, 0), descs.get(jid, "?")))
# the description persists across the pipeline's own jobs, so the FIRST
# marker job is the range(1) sentinel and everything after it (marker desc
# included) is pipeline work until the description resets to a callsite
marker = [r for r in rows if "PIPELINE START" in r[3]]
if marker:
    cut = marker[0][0]
    rows = [r for r in rows if r[0] > cut]
tot = sum(r[1] for r in rows)
print(f"jobs={len(rows)} sum_job_wall={tot:.1f}s")
kept = {r[0] for r in rows}
for jid, wall, nt, d in rows:
    print(f"  job {jid:3d} {wall:7.2f}s tasks={nt:4d} {d[:110]}")
    for sid in sorted(s for s, j in stage_job.items() if j == jid):
        m = stage_metrics.get(sid)
        if not m or m["run"] < 300:
            continue
        print(
            f"    stage {sid:3d} tasks={m['tasks']:4d} run={m['run']/1e3:6.1f}s"
            f" cpu={m['cpu']/1e3:6.1f}s deser={m['deser']/1e3:5.1f}s"
            f" gc={m['gc']/1e3:4.1f}s shW={m['sh_w_b']/1e6:6.0f}MB/{m['sh_wt']/1e3:4.1f}s"
            f" shR={m['sh_r_b']/1e6:6.0f}MB fetch={m['sh_fetch']/1e3:4.1f}s"
        )
