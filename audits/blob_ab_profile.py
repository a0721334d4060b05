"""Same-session stage-level A/B of the boundary feed into the fused extract:
row form (ckpt rows -> narrow -> repartition(1) -> kernel) vs blob form
(fill kernel packs BOUNDARY_BLOB rows -> ckpt -> repartition(1) -> unpack+kernel).

Shares one Spark session and one warm worker pool; runs variants alternately
(row, blob, row, blob) so window drift hits both. Reports per-stage seconds.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from test_distributed import lines_net, rings_to_contours_rows

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
spark = (SparkSession.builder.master("local[16]")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.driver.memory", "48g")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from ioverlay_spark.operators.distributed import (
    compute_fills_df,
    contours_to_segments_df,
    merge_segments_df,
    split_segments_df,
    _count_and_bounds,
)
from ioverlay_spark.operators.distributed_extract import (
    RINGS_SCHEMA,
    _bind_and_project,
    _fused_extract_blob_iter,
    _fused_extract_kernel,
    _narrow_boundary,
)
from ioverlay_spark.options import FillRule, OverlayOptions, OverlayRule
from ioverlay_spark.session import ship_package
import pyarrow as pa

ship_package(spark)
subj, clip = lines_net(n, 20)
df = spark.createDataFrame(
    rings_to_contours_rows(subj, clip), ["role", "cid", "pts_x", "pts_y"]
).localCheckpoint(eager=True)


def run(blob: bool):
    t = {}
    T = time.time()
    t0 = time.time()
    merged = merge_segments_df(contours_to_segments_df(spark, df)).localCheckpoint(eager=True)
    t["merge"] = time.time() - t0
    t0 = time.time()
    bounds = _count_and_bounds(merged)
    t["bounds"] = time.time() - t0
    t0 = time.time()
    split = split_segments_df(merged, pre_merged=True, bounds=bounds, checkpoint_last=False)
    t["split"] = time.time() - t0
    cmax_hint = max(abs(bounds[1]), abs(bounds[2]), abs(bounds[3]), abs(bounds[4]))
    t0 = time.time()
    fills = compute_fills_df(
        split, FillRule.EVEN_ODD, boundary_rule=OverlayRule.INTERSECT,
        boundary_blob=blob,
    )
    b = fills.localCheckpoint(eager=True)
    t["fill+ckpt"] = time.time() - t0
    t0 = time.time()
    if blob:
        meta = b.agg(F.max("cmax").alias("m"), F.sum("cnt").alias("n")).first()
        n_edges = int(meta["n"] or 0)
    else:
        n_edges = b.count()
    t["meta"] = time.time() - t0
    t0 = time.time()
    if blob:
        rings = (
            b.repartition(1)
            .mapInArrow(
                _fused_extract_blob_iter(OverlayRule.INTERSECT, OverlayOptions()),
                schema=RINGS_SCHEMA,
            )
            .localCheckpoint(eager=True)
        )
    else:
        kern = _fused_extract_kernel(OverlayRule.INTERSECT, OverlayOptions())

        def it(batches):
            chunks = list(batches)
            if chunks:
                yield from kern(pa.Table.from_batches(chunks)).to_batches()

        rings = (
            _narrow_boundary(b, cmax_hint)
            .repartition(1)
            .mapInArrow(it, schema=RINGS_SCHEMA)
            .localCheckpoint(eager=True)
        )
    t["fused"] = time.time() - t0
    t0 = time.time()
    out = _bind_and_project(rings)
    cnt = out.count()
    a2 = out.agg(F.sum("area2")).first()[0]
    t["bind+count"] = time.time() - t0
    t["TOTAL"] = time.time() - T
    ok = int(a2) == 2 * n * n * 10 * 10
    tag = "blob" if blob else "row "
    print(
        f"{tag} n_edges={n_edges} rings={cnt} ok={ok} "
        + " ".join(f"{k}={v:.2f}" for k, v in t.items()),
        flush=True,
    )
    return t


# warm pass on a small subset
ws, wc = lines_net(32, 20)
wdf = spark.createDataFrame(rings_to_contours_rows(ws, wc), ["role", "cid", "pts_x", "pts_y"])
from ioverlay_spark.operators.distributed import distributed_overlay

distributed_overlay(
    contours_to_segments_df(spark, wdf), OverlayRule.INTERSECT, FillRule.EVEN_ODD,
    force_distributed=True,
).count()

for _ in range(reps):
    run(False)
    run(True)
spark.stop()
