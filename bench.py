#!/usr/bin/env python3
"""Headline benchmark: overlay + spatial-join + tiling suite.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] (default 32), and measures the same suite at two
parallelism levels (local[8] vs local[32]) on identical input to evidence the
north-rule N->4N scaling efficiency (sandbox stand-in for cluster sizes).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec at local[32]>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "rows_per_sec": {...},
   "scaling": {"local8_sec":..., "local32_sec":..., "efficiency":...}}

Workload (derived deterministically from the TPC-H-ish ids; geometry formulas shared
with the DuckDB oracles in ioverlay_spark/queries.py):
  - overlay:  150k polygon boolean-intersect jobs (hexagon subj x rect clip per
              o_orderkey) through the exact kernel (groupBy + applyInPandas)
  - pip:      600k points (lineitem) x 150k rects (orders) point-in-polygon join
              via level-6 cell-cover equi-join
  - tiles:    level-5 tile assignment + per-tile aggregation of 150k rects
  - knn:      k=3 nearest rect-centers for 150k points via cell-ring expansion
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def run_suite(cpus: int) -> dict:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ioverlay_spark.operators.overlay_df import overlay_pairs
    from ioverlay_spark.operators.spatial import (
        derive_points,
        derive_rects,
        pip_join,
        rect_centers,
        tile_assign,
    )
    from ioverlay_spark.queries import _clip_rect_exprs, _hex_pts

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"ioverlay-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select("o_orderkey")
    # lineitem has duplicate (orderkey, linenumber) pairs in the synthetic data:
    # derive a distinct id set so per-point semantics are clean
    lineitem = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .selectExpr("(l_orderkey * 10 + l_linenumber) AS li_id")
        .distinct()
    )
    # the overlay/knn workloads run on the biggest id table so compute dominates the
    # fixed per-job overhead — the regime where N->4N core scaling is measurable
    li_ids = lineitem

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    # two passes: pass 0 warms JVM JIT, python worker pools, and page cache; pass 1
    # is the reported measurement (standard steady-state benchmarking)
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))

    def timed(name, fn):
        for _ in range(max(1, passes - 1)):
            fn()
        t0 = time.time()
        counts[name] = fn()
        timings[name] = round(time.time() - t0, 3)

    # --- overlay: full kernel, one boolean job per lineitem ---
    p = _hex_pts("spark")
    rc = _clip_rect_exprs("li_id", "spark")
    p = {k: v.replace("doc_id", "li_id") for k, v in p.items()}

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

    def geoms(role, xs, ys):
        return li_ids.selectExpr(
            "CAST(li_id AS BIGINT) AS pair_id",
            f"'{role}' AS role",
            "CAST(0 AS BIGINT) AS shape_id",
            "CAST(0 AS INT) AS contour_idx",
            f"{xs} AS pts_x",
            f"{ys} AS pts_y",
        )

    overlay_in = geoms("subject", sx, sy).unionAll(geoms("clip", cx, cy))
    timed(
        "overlay",
        lambda: overlay_pairs(overlay_in, rules=["intersect"])
        .agg(F.count("*"), F.sum("area2"))
        .collect()[0][0],
    )

    # --- pip join: lineitem points x orders rects ---
    pts = derive_points(lineitem, "li_id")
    rects = derive_rects(orders, "o_orderkey")
    timed("pip", lambda: pip_join(pts, rects, level=9).count())

    # --- tiles: lineitem rects assigned to level-7 tiles ---
    li_rects = derive_rects(lineitem, "li_id")
    timed("tiles", lambda: tile_assign(li_rects, level=7).count())

    # --- knn: lineitem points vs orders centers (broadcast-grid, map-side exact) ---
    from ioverlay_spark.operators.spatial import knn_broadcast_grid

    n_orders = orders.count()
    n_li = lineitem.count()
    ctr = rect_centers(rects).select("r_id", "cx2", "cy2")
    timed("knn", lambda: knn_broadcast_grid(pts, ctr, k=3).count())

    spark.stop()
    total = round(sum(timings.values()), 3)
    return {
        "cpus": cpus,
        "total_sec": total,
        "queries": timings,
        "counts": counts,
        "rows_per_sec": {
            "overlay_pairs_per_sec": round(n_li / timings["overlay"], 1),
            "pip_input_rows_per_sec": round((n_li + n_orders) / timings["pip"], 1),
            "tile_assignments_per_sec": round(n_li / timings["tiles"], 1),
            "knn_points_per_sec": round(n_li / timings["knn"], 1),
        },
    }


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        print("WORKER_JSON:" + json.dumps(run_suite(int(sys.argv[2]))))
        return

    env = dict(os.environ)
    results = {}
    for cpus in (CPUS, 8) if CPUS != 8 else (8,):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
            capture_output=True,
            text=True,
            env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("WORKER_JSON:")]
        if not line:
            sys.stderr.write(out.stdout[-4000:] + out.stderr[-4000:])
            raise SystemExit(f"worker local[{cpus}] failed")
        results[cpus] = json.loads(line[0][len("WORKER_JSON:"):])

    main_res = results[CPUS]
    scaling = {}
    if 8 in results and CPUS in results and CPUS != 8:
        t8 = results[8]["total_sec"]
        tN = results[CPUS]["total_sec"]
        scaling = {
            "local8_sec": t8,
            f"local{CPUS}_sec": tN,
            "efficiency": round(t8 / ((CPUS / 8) * tN), 3),
        }

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "overlay+spatial-join+tiling suite wall-clock",
                "value": main_res["total_sec"],
                "unit": "sec",
                "queries": main_res["queries"],
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "counts": main_res["counts"],
                "rows_per_sec": main_res["rows_per_sec"],
                "scaling": scaling,
            }
        )
    )


if __name__ == "__main__":
    main()
