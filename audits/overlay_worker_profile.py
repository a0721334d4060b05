"""Profile the flagship overlay's mapInPandas worker body single-threaded.

Pulls one real input batch (the bench.py hexagon-vs-shifted-rect geometry at
sf0.01), then times/cProfiles the three phases of the worker: numpy job
assembly, overlay_batch kernel, and output-DataFrame assembly — plus the
pandas->Arrow conversion the worker pays on yield. This is the per-core cost;
the e2e bench divides it by the worker count and adds scan/shuffle."""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import SparkSession

from ioverlay_spark.kernel.batch import overlay_batch
from ioverlay_spark.kernel.extract import ring_area2
from ioverlay_spark.options import FillRule, OverlayOptions, OverlayRule
from ioverlay_spark.queries import _clip_rect_exprs, _hex_pts

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").selectExpr(
    "row_number() over (order by l_orderkey, l_linenumber) as li_id"
)
from pyspark.sql import functions as F  # noqa: E402

p = {k: v.replace("doc_id", "li_id") for k, v in _hex_pts("spark").items()}
rc = _clip_rect_exprs("li_id", "spark")


def ring_arrays(points):
    xs = ", ".join(f"CAST({x} AS BIGINT)" for x, _ in points)
    ys = ", ".join(f"CAST({y} AS BIGINT)" for _, y in points)
    return f"array({xs})", f"array({ys})"


sx, sy = ring_arrays(
    [
        (p["x1"], p["y1"]),
        (p["x2"], p["y1"]),
        (p["x2"], p["ym"]),
        (p["xm"], p["ym"]),
        (p["xm"], p["y2"]),
        (p["x1"], p["y2"]),
    ]
)
cx, cy = ring_arrays(
    [(rc["x1"], rc["y1"]), (rc["x2"], rc["y1"]), (rc["x2"], rc["y2"]), (rc["x1"], rc["y2"])]
)
pdf = (
    lineitem.selectExpr(
        "CAST(li_id AS BIGINT) AS pair_id",
        f"{sx} AS subj_x",
        f"{sy} AS subj_y",
        f"{cx} AS clip_x",
        f"{cy} AS clip_y",
    )
    .limit(N)
    .toPandas()
)
spark.stop()
print(f"batch rows: {len(pdf)}")

rule_objs = [OverlayRule.INTERSECT, OverlayRule.UNION, OverlayRule.XOR]
fr = FillRule.EVEN_ODD
options = OverlayOptions()


def phase_assemble(pdf):
    pids = pdf["pair_id"].to_numpy()
    jobs = [
        (
            [np.stack([np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64)], axis=1)],
            [np.stack([np.asarray(c, dtype=np.int64), np.asarray(d, dtype=np.int64)], axis=1)],
        )
        for a, b, c, d in zip(pdf["subj_x"], pdf["subj_y"], pdf["clip_x"], pdf["clip_y"])
    ]
    return pids, jobs


def phase_output(pids, res):
    op, orr, osid, ocid, ox, oy, oa = [], [], [], [], [], [], []
    for pid, r in zip(pids, res):
        for rule in rule_objs:
            shapes, areas = r[rule]
            for sid, (shape, s_areas) in enumerate(zip(shapes, areas)):
                for cid, (ring, a2) in enumerate(zip(shape, s_areas)):
                    op.append(int(pid))
                    orr.append(rule.value)
                    osid.append(sid)
                    ocid.append(cid)
                    ox.append(ring[:, 0].tolist())
                    oy.append(ring[:, 1].tolist())
                    oa.append(a2)
    return pd.DataFrame(
        {
            "pair_id": pd.Series(op, dtype="int64"),
            "rule": pd.Series(orr, dtype="object"),
            "shape_id": pd.Series(osid, dtype="int64"),
            "contour_idx": pd.Series(ocid, dtype="int32"),
            "pts_x": pd.Series(ox, dtype="object"),
            "pts_y": pd.Series(oy, dtype="object"),
            "area2": pd.Series(oa, dtype="int64"),
        }
    )


for trial in range(3):
    t0 = time.time()
    pids, jobs = phase_assemble(pdf)
    t1 = time.time()
    res = overlay_batch(jobs, rule_objs, fr, options, with_areas=True)
    t2 = time.time()
    out = phase_output(pids, res)
    t3 = time.time()
    tbl = pa.Table.from_pandas(out, preserve_index=False)
    t4 = time.time()
    print(
        f"trial {trial}: assemble {t1 - t0:.2f}s kernel {t2 - t1:.2f}s "
        f"output {t3 - t2:.2f}s arrow {t4 - t3:.2f}s total {t4 - t0:.2f}s "
        f"({(t4 - t0) / len(pdf) * 1e6:.0f} us/job) out_rows={len(out)}"
    )

if "--profile" in sys.argv:
    pr = cProfile.Profile()
    pr.enable()
    pids, jobs = phase_assemble(pdf)
    res = overlay_batch(jobs, rule_objs, fr, options, with_areas=True)
    out = phase_output(pids, res)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
    print(s.getvalue())
