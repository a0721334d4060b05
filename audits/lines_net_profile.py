import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))); sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from pyspark.sql import SparkSession
from test_distributed import lines_net, rings_to_contours_rows

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
spark = (SparkSession.builder.master("local[16]")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.driver.memory", "48g")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from ioverlay_spark.options import FillRule, OverlayRule, OverlayOptions
from ioverlay_spark.operators.distributed import (contours_to_segments_df, merge_segments_df,
    split_segments_df, compute_fills_df, _count_and_bounds)
from ioverlay_spark.operators.distributed_extract import extract_shapes_df
from ioverlay_spark.session import ship_package
ship_package(spark)

subj, clip = lines_net(n, 20)
df = spark.createDataFrame(rings_to_contours_rows(subj, clip), ["role","cid","pts_x","pts_y"]).localCheckpoint(eager=True)
t0=time.time()
merged = merge_segments_df(contours_to_segments_df(spark, df)).localCheckpoint(eager=True)
t1=time.time(); print(f"merge: {t1-t0:.1f}s rows={merged.count()}")
split = split_segments_df(merged, pre_merged=True).localCheckpoint(eager=True)
t2=time.time(); print(f"split: {t2-t1:.1f}s rows={split.count()}")
fills = compute_fills_df(split, FillRule.EVEN_ODD).localCheckpoint(eager=True)
t3=time.time(); print(f"fills: {t3-t2:.1f}s rows={fills.count()}")
out = extract_shapes_df(fills, OverlayRule.INTERSECT, OverlayOptions())
cnt = out.count()
t4=time.time(); print(f"extract: {t4-t3:.1f}s rings={cnt}")
print(f"TOTAL {t4-t0:.1f}s")
spark.stop()
