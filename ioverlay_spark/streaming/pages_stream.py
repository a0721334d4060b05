"""Structured Streaming ingestion of page batches feeding the tiling pipeline.

The reference has no streaming surface (SURVEY.md §2.6: nothing event-time-like
exists); this is the engine's optional scale-out ingestion path: page files land in
a directory (Common-Crawl dump batches), a file-source stream derives geo payloads
and tile assignments, and an `availableNow` trigger drains whatever is present with
exactly-once sink semantics via the checkpointLocation — resumable by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exprgen import cell_expr, rect_exprs


def stream_pages_to_tiles(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema=None,
    tile_level: int = 5,
):
    """Stream pages parquet batches -> per-page tile assignment, append to parquet.

    Returns the StreamingQuery (already started, availableNow trigger: processes
    all currently-available files then stops — the batch-incremental pattern)."""
    if schema is None:
        static = spark.read.parquet(input_dir)
        schema = static.schema
    pages = spark.readStream.schema(schema).parquet(input_dir)
    # geo payload from the url hash (deterministic; analog of the doc_id derivation).
    # Bounded below 2^30 so the rect derivation's bigint products can't overflow
    # under ANSI mode.
    with_id = pages.withColumn("page_id", F.pmod(F.xxhash64("url"), F.lit(1 << 30)))
    r = rect_exprs("page_id", "spark")
    rects = with_id.select(
        "url",
        "warc_ts",
        "lang",
        F.expr(r["x1"]).cast("long").alias("x1"),
        F.expr(r["y1"]).cast("long").alias("y1"),
        F.expr(r["x2"]).cast("long").alias("x2"),
        F.expr(r["y2"]).cast("long").alias("y2"),
    )
    tiled = rects.withColumn(
        "tile", F.expr(cell_expr("x1", "y1", tile_level, "spark")).cast("long")
    )
    return (
        tiled.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )


def windowed_page_rates(pages_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Event-time windowed ingestion metrics with late-data handling: pages/sec per
    10-minute warc_ts window per lang (the watermark + windowed-agg pattern)."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", "10 minutes"), "lang")
        .agg(F.count("*").alias("n_pages"))
    )


def _derive_tiles(pages: DataFrame, tile_level: int) -> DataFrame:
    """Shared stream derivation: pages -> (url, warc_ts, lang, rect, tile)."""
    with_id = pages.withColumn("page_id", F.pmod(F.xxhash64("url"), F.lit(1 << 30)))
    r = rect_exprs("page_id", "spark")
    rects = with_id.select(
        "url",
        "warc_ts",
        "lang",
        F.expr(r["x1"]).cast("long").alias("x1"),
        F.expr(r["y1"]).cast("long").alias("y1"),
        F.expr(r["x2"]).cast("long").alias("x2"),
        F.expr(r["y2"]).cast("long").alias("y2"),
    )
    return rects.withColumn(
        "tile", F.expr(cell_expr("x1", "y1", tile_level, "spark")).cast("long")
    )


def stateful_tile_counts(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema=None,
    tile_level: int = 5,
):
    """Custom stateful streaming operator (applyInPandasWithState): running
    cumulative page count + micro-batch count per tile, state carried across
    restarts via the checkpoint — the engine's streaming-rollup surface.

    availableNow trigger: each invocation drains new files, updates per-tile state,
    and appends the refreshed totals (tile, total_pages, batches, batch_id) to
    `output_dir` parquet via foreachBatch (checkpoint-recoverable sink)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if schema is None:
        schema = spark.read.parquet(input_dir).schema
    pages = spark.readStream.schema(schema).parquet(input_dir)
    tiled = _derive_tiles(pages, tile_level)

    def update(key, pdfs, state: GroupState):
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        if state.exists:
            total, batches = state.get
        else:
            total, batches = 0, 0
        total += n
        batches += 1
        state.update((total, batches))
        yield pd.DataFrame(
            {"tile": [key[0]], "total_pages": [total], "batches": [batches]}
        )

    counts = tiled.groupBy("tile").applyInPandasWithState(
        update,
        outputStructType="tile LONG, total_pages LONG, batches LONG",
        stateStructType="total LONG, batches LONG",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    def sink(batch_df, batch_id):
        (batch_df.withColumn("batch_id", F.lit(batch_id))
                 .write.mode("append").parquet(output_dir))

    return (
        counts.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
