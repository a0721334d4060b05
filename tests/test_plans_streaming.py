"""Checkpoint/resume pipeline + streaming ingestion tests (north rule: resumable
from per-partition checkpoints with lineage + metrics; identical output hash)."""

import json
import os

from pyspark.sql import functions as F


def test_checkpointed_pipeline_resume(spark, tmp_path):
    from ioverlay_spark.plans.checkpoint import CheckpointedPipeline

    root = str(tmp_path / "ckpt")
    calls = {"a": 0, "b": 0}

    def build_a():
        calls["a"] += 1
        return spark.range(0, 1000).select(F.col("id"), (F.col("id") * 3).alias("v"))

    def run(pipe):
        a = pipe.stage("stage_a", build_a)

        def build_b():
            calls["b"] += 1
            return a.groupBy((F.col("id") % 10).alias("k")).agg(F.sum("v").alias("s"))

        return pipe.stage("stage_b", build_b, inputs=("stage_a",))

    p1 = CheckpointedPipeline(spark, root)
    out1 = run(p1)
    h1 = [s.hash for s in p1.metrics]
    assert calls == {"a": 1, "b": 1}

    # simulate a restart: new pipeline object, same root -> both stages resume
    p2 = CheckpointedPipeline(spark, root)
    out2 = run(p2)
    h2 = [s.hash for s in p2.metrics]
    assert calls == {"a": 1, "b": 1}  # nothing recomputed
    assert h1 == h2
    assert all(s.resumed for s in p2.metrics)
    assert sorted(out1.collect()) == sorted(out2.collect())

    # manifests carry per-partition lineage
    m = json.load(open(os.path.join(root, "stage_b", "_manifest.json")))
    assert m["complete"] and len(m["lineage"]) >= 1
    assert sum(e["rows"] for e in m["lineage"]) == m["rows"]

    # kill mid-pipeline: delete stage_b, keep stage_a -> only b recomputes
    import shutil

    shutil.rmtree(os.path.join(root, "stage_b"))
    p3 = CheckpointedPipeline(spark, root)
    run(p3)
    assert calls == {"a": 1, "b": 2}
    assert [s.hash for s in p3.metrics] == h1


def test_fixpoint_checkpoint(spark, tmp_path):
    from ioverlay_spark.plans.checkpoint import CheckpointedPipeline

    root = str(tmp_path / "fx")
    p = CheckpointedPipeline(spark, root)

    def init():
        return spark.range(0, 64).select(F.col("id").alias("v"))

    def step(df, rnd):
        halved = df.select((F.col("v") / 2).cast("long").alias("v"))
        done = halved.agg(F.max("v")).collect()[0][0] == 0
        return halved, done

    out = p.fixpoint("halve", init, step, max_rounds=16)
    assert out.agg(F.max("v")).collect()[0][0] == 0


def test_streaming_pages_to_tiles(spark, tmp_path):
    from ioverlay_spark.sources.pages import pages_from_documents
    from ioverlay_spark.streaming.pages_stream import stream_pages_to_tiles

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = pages_from_documents(docs)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    pages.write.parquet(in_dir)

    q = stream_pages_to_tiles(spark, in_dir, out_dir, ck_dir)
    q.awaitTermination(120)
    tiles = spark.read.parquet(out_dir)
    assert tiles.count() == docs.count()
    assert set(tiles.columns) >= {"url", "tile", "x1", "y1", "x2", "y2"}

    # second run with no new files: exactly-once, nothing re-appended
    q2 = stream_pages_to_tiles(spark, in_dir, out_dir, ck_dir)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == docs.count()


def test_stateful_tile_counts_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState: per-tile running totals accumulate across two
    availableNow runs through the same checkpoint (state restored, not reset)."""
    from pyspark.sql import functions as F

    from ioverlay_spark.sources.pages import pages_from_documents
    from ioverlay_spark.streaming.pages_stream import stateful_tile_counts

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = pages_from_documents(docs)
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    schema = pages.schema

    out_dir = str(tmp_path / "out")
    pages.where(F.col("lang") == "en").write.mode("append").parquet(in_dir)
    q = stateful_tile_counts(spark, in_dir, ckpt, schema=schema, output_dir=out_dir)
    q.awaitTermination(120)
    out1 = spark.read.parquet(out_dir)
    max_bid1 = out1.agg(F.max("batch_id")).collect()[0][0]
    t1 = {
        r["tile"]: r["total_pages"]
        for r in out1.where(F.col("batch_id") == max_bid1).collect()
    }
    n_en = pages.where(F.col("lang") == "en").count()
    assert sum(t1.values()) == n_en

    # second drop of files -> state must ACCUMULATE (checkpoint-restored)
    pages.where(F.col("lang") != "en").write.mode("append").parquet(in_dir)
    q2 = stateful_tile_counts(spark, in_dir, ckpt, schema=schema, output_dir=out_dir)
    q2.awaitTermination(120)
    out2 = spark.read.parquet(out_dir)
    max_bid2 = out2.agg(F.max("batch_id")).collect()[0][0]
    assert max_bid2 > max_bid1
    rows2 = out2.where(F.col("batch_id") == max_bid2).collect()
    t2 = {r["tile"]: (r["total_pages"], r["batches"]) for r in rows2}
    # final totals: updated tiles hold their cumulative count; untouched tiles
    # keep their batch-1 value — together they cover every page exactly once
    assert sum(tp for tp, _ in t2.values()) + sum(
        v for k, v in t1.items() if k not in t2
    ) == pages.count()
    # at least one tile saw both micro-batches (state restored, not reset)
    assert any(b == 2 for _, b in t2.values())


def test_windowed_page_rates_matches_batch(spark, tmp_path):
    """Watermark + event-time windowed agg over a stream == the same agg in batch
    (availableNow drain, complete-mode memory sink)."""
    from pyspark.sql import functions as F

    from ioverlay_spark.sources.pages import pages_from_documents
    from ioverlay_spark.streaming.pages_stream import windowed_page_rates

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = pages_from_documents(docs)
    in_dir = str(tmp_path / "win_in")
    pages.write.mode("overwrite").parquet(in_dir)

    stream = spark.readStream.schema(pages.schema).parquet(in_dir)
    q = (
        windowed_page_rates(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("win_rates")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window"]["start"], r["lang"]): r["n_pages"]
        for r in spark.sql("SELECT * FROM win_rates").collect()
    }
    want = {
        (r["window"]["start"], r["lang"]): r["n_pages"]
        for r in pages.groupBy(F.window("warc_ts", "10 minutes"), "lang")
        .agg(F.count("*").alias("n_pages"))
        .collect()
    }
    assert got == want and len(got) > 0
