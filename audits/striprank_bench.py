"""A/B the strip-rank expression shapes on the real lines_net apply+fill
map stage (the stage-30 hotspot): same split output, same downstream shuffle
write (noop sink), different rank formulations."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from test_distributed import lines_net, rings_to_contours_rows

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "48g")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from ioverlay_spark.operators.distributed import (
    _bsearch_rank_expr,
    _strip_rank_expr,
    contours_to_segments_df,
    merge_segments_df,
    split_segments_df,
)
from ioverlay_spark.session import ship_package

ship_package(spark)
subj, clip = lines_net(n, 20)
df = spark.createDataFrame(
    rings_to_contours_rows(subj, clip), ["role", "cid", "pts_x", "pts_y"]
)
merged = merge_segments_df(contours_to_segments_df(spark, df)).localCheckpoint(True)
split = split_segments_df(merged, pre_merged=True, checkpoint_last=False)
edges = split._ioverlay_strip_mx2_edges
mx2 = split._ioverlay_mx2_range
print(f"edges={len(edges)} range={mx2}", flush=True)


def run(name, segs_ranked):
    out = segs_ranked.withColumn(
        "strip", F.explode(F.expr("sequence(s_lo, s_hi)"))
    ).withColumn("is_home", F.col("strip") == F.col("s_mid")).select(
        "ax", "ay", "bx", "by", "subj", "clip", "strip", "is_home"
    )
    nmin = None
    for _ in range(2):
        t0 = time.time()
        out.repartition(64, "strip").write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        nmin = dt if nmin is None else min(nmin, dt)
    print(f"{name}: best {nmin:.2f}s", flush=True)


variants = sys.argv[2].split(",") if len(sys.argv) > 2 else [
    "tree255", "two_inline", "two_lambda", "ckpt_two", "ckpt_tree255",
]
for v in variants:
    if v == "tree255":
        s = split.select(
            "*",
            F.expr(_bsearch_rank_expr("2 * ax", edges)).cast("int").alias("s_lo"),
            F.expr(_bsearch_rank_expr("2 * bx", edges)).cast("int").alias("s_hi"),
            F.expr(_bsearch_rank_expr("ax + bx", edges)).cast("int").alias("s_mid"),
        )
        run(v, s)
    elif v == "two_inline":
        s = split.select(
            "*",
            F.expr(_strip_rank_expr("2 * ax", edges, *mx2)).cast("int").alias("s_lo"),
            F.expr(_strip_rank_expr("2 * bx", edges, *mx2)).cast("int").alias("s_hi"),
            F.expr(_strip_rank_expr("ax + bx", edges, *mx2)).cast("int").alias("s_mid"),
        )
        run(v, s)
    elif v == "two_lambda":
        in_cols = split.columns
        row_struct = "struct(" + ", ".join(f"{c} AS {c}" for c in in_cols) + ")"
        out_struct = (
            "struct("
            + ", ".join(f"r.{c} AS {c}" for c in in_cols)
            + f", CAST({_strip_rank_expr('2 * r.ax', edges, *mx2)} AS INT) AS s_lo"
            + f", CAST({_strip_rank_expr('2 * r.bx', edges, *mx2)} AS INT) AS s_hi"
            + f", CAST({_strip_rank_expr('r.ax + r.bx', edges, *mx2)} AS INT) AS s_mid"
            + ")"
        )
        s = split.select(
            F.explode(F.expr(f"transform(array({row_struct}), r -> {out_struct})")).alias("_r")
        ).select("_r.*")
        run(v, s)
    elif v in ("ckpt_two", "ckpt_tree255"):
        base = split.localCheckpoint(eager=True)
        if v == "ckpt_two":
            s = base.select(
                "*",
                F.expr(_strip_rank_expr("2 * ax", edges, *mx2)).cast("int").alias("s_lo"),
                F.expr(_strip_rank_expr("2 * bx", edges, *mx2)).cast("int").alias("s_hi"),
                F.expr(_strip_rank_expr("ax + bx", edges, *mx2)).cast("int").alias("s_mid"),
            )
        else:
            s = base.select(
                "*",
                F.expr(_bsearch_rank_expr("2 * ax", edges)).cast("int").alias("s_lo"),
                F.expr(_bsearch_rank_expr("2 * bx", edges)).cast("int").alias("s_hi"),
                F.expr(_bsearch_rank_expr("ax + bx", edges)).cast("int").alias("s_mid"),
            )
        run(v, s)
spark.stop()
