"""cProfile the fused single-task extract kernel on the real lines_net
boundary set (the 11 s job in the n=1024 audit). Builds the boundary rows
through the distributed pipeline once, collects them (driver has 48g), then
profiles the kernel function alone — no Spark in the measured region."""

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)
import pyarrow as pa
from pyspark.sql import SparkSession

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
    compute_fills_df,
    contours_to_segments_df,
    merge_segments_df,
    split_segments_df,
)
from ioverlay_spark.operators.distributed_extract import _fused_extract_kernel
from ioverlay_spark.options import FillRule, OverlayOptions, OverlayRule
from ioverlay_spark.session import ship_package

ship_package(spark)
subj, clip = lines_net(n, 20)
df = spark.createDataFrame(
    rings_to_contours_rows(subj, clip), ["role", "cid", "pts_x", "pts_y"]
)
merged = merge_segments_df(contours_to_segments_df(spark, df)).localCheckpoint(True)
split = split_segments_df(merged, pre_merged=True, checkpoint_last=False)
fills = compute_fills_df(split, FillRule.EVEN_ODD, boundary_rule=OverlayRule.INTERSECT)
pdf = fills.select("ax", "ay", "bx", "by", "fill").toPandas()
print(f"boundary rows: {len(pdf)}", flush=True)
tbl = pa.Table.from_pandas(pdf)
kern = _fused_extract_kernel(OverlayRule.INTERSECT, OverlayOptions())

for i in range(2):
    t0 = time.time()
    out = kern(tbl)
    print(f"pass {i}: {time.time() - t0:.2f}s rings={out.num_rows}", flush=True)

prof = cProfile.Profile()
prof.enable()
out = kern(tbl)
prof.disable()
stats = pstats.Stats(prof)
stats.sort_stats("cumulative").print_stats(28)
spark.stop()
