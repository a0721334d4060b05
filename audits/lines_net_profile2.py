"""Fine-grained stage profiler for the lines_net distributed overlay.

Mirrors distributed_overlay's CURRENT barrier structure: merge ckpt, bounds,
marks ckpt + probe (inside split_segments_df), then the fused
apply->strips->fill job (b ckpt), count, fused CC+walk (rings ckpt), bind.
"""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from test_distributed import lines_net, rings_to_contours_rows

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
spark = (SparkSession.builder.master("local[16]")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.driver.memory", "48g")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from ioverlay_spark.options import FillRule, OverlayRule, OverlayOptions
from ioverlay_spark.operators.distributed import (
    contours_to_segments_df, merge_segments_df, split_segments_df,
    compute_fills_df, _count_and_bounds)
from ioverlay_spark.operators.distributed_extract import (
    _fused_extract_kernel, _bind_and_project, RINGS_SCHEMA)
from ioverlay_spark.session import ship_package
import pyarrow as pa
ship_package(spark)

subj, clip = lines_net(n, 20)
df = spark.createDataFrame(rings_to_contours_rows(subj, clip), ["role","cid","pts_x","pts_y"]).localCheckpoint(eager=True)

T = time.time()
def tick(label, t0):
    t1 = time.time()
    print(f"{label}: {t1-t0:.2f}s")
    return t1

t0 = time.time()
merged = merge_segments_df(contours_to_segments_df(spark, df)).localCheckpoint(eager=True)
t0 = tick("merge+ckpt", t0)
bounds = _count_and_bounds(merged)
t0 = tick(f"count_and_bounds n={bounds[0]}", t0)

split = split_segments_df(merged, pre_merged=True, bounds=bounds, checkpoint_last=False)
t0 = tick(f"split marks+probe (lazy apply; hint={getattr(split, '_ioverlay_n_segments', None)})", t0)

fills = compute_fills_df(split, FillRule.EVEN_ODD, boundary_rule=OverlayRule.INTERSECT)
t0 = tick("fills plan build (no job expected)", t0)

b = fills.localCheckpoint(eager=True)
t0 = tick("FUSED apply+strips+fill job (b ckpt)", t0)
n_edges = b.count()
t0 = tick(f"count n_edges={n_edges}", t0)
kern = _fused_extract_kernel(OverlayRule.INTERSECT, OverlayOptions())
def it(batches):
    chunks = list(batches)
    if chunks:
        yield from kern(pa.Table.from_batches(chunks)).to_batches()
rings = b.repartition(1).mapInArrow(it, schema=RINGS_SCHEMA).localCheckpoint(eager=True)
t0 = tick("fused CC+walk (rings ckpt)", t0)
out = _bind_and_project(rings)
t0 = tick("bind+project (isEmpty inside)", t0)
cnt = out.count()
a2 = out.agg(F.sum("area2")).first()[0]
t0 = tick(f"final count rings={cnt} area_ok={int(a2)==2*n*n*10*10}", t0)
print(f"TOTAL {time.time()-T:.1f}s")
spark.stop()
