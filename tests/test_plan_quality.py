"""Physical-plan regression tests: the plans we designed for, not just the first
ones that passed (.explain-driven; the 100-TB contract).

Each test asserts a structural property of the executed/analyzed plan:
  - filters reach the parquet scan (PushedFilters) and projections prune columns,
  - small sides broadcast (no SortMergeJoin for the dim join),
  - equi-joins stay equi (no BroadcastNestedLoopJoin / CartesianProduct),
  - the zero-shuffle operators really have no Exchange before the python stage,
  - Column-expression pipelines run inside WholeStageCodegen.
"""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_str(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_scan_pushdown(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = docs.where(F.col("lang") == "en").select("doc_id")
    p = plan_str(df)
    assert "PushedFilters" in p and "lang" in p
    # column pruning: text must not be read for a doc_id projection
    assert "ReadSchema" in p
    read_schema = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "text" not in read_schema


def test_pip_join_is_equi_join(spark):
    from ioverlay_spark.operators.spatial import derive_points, derive_rects, pip_join

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = pip_join(derive_points(docs, "doc_id"), derive_rects(docs, "doc_id"), level=6)
    p = plan_str(df)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_knn_broadcast_grid_has_no_join_or_shuffle(spark):
    from ioverlay_spark.operators.spatial import (
        derive_points,
        derive_rects,
        knn_broadcast_grid,
        rect_centers,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pts = derive_points(docs, "doc_id")
    ctr = rect_centers(derive_rects(docs, "doc_id")).select("r_id", "cx2", "cy2")
    df = knn_broadcast_grid(pts, ctr, k=3)
    p = plan_str(df)
    # the center grid travels as an sc.broadcast inside the python kernel — the
    # Spark plan itself must contain no join and no shuffle exchange
    assert "Join" not in p
    assert "Exchange" not in p or "rangepartitioning" not in p.lower()


def test_overlay_rows_zero_shuffle(spark):
    from ioverlay_spark.operators.overlay_df import overlay_rows

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = docs.selectExpr(
        "CAST(doc_id AS BIGINT) AS pair_id",
        "array(CAST(0 AS BIGINT), CAST(4 AS BIGINT), CAST(4 AS BIGINT), CAST(0 AS BIGINT)) AS subj_x",
        "array(CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(4 AS BIGINT), CAST(4 AS BIGINT)) AS subj_y",
        "array(CAST(2 AS BIGINT), CAST(6 AS BIGINT), CAST(6 AS BIGINT), CAST(2 AS BIGINT)) AS clip_x",
        "array(CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(6 AS BIGINT), CAST(6 AS BIGINT)) AS clip_y",
    )
    df = overlay_rows(rows, rules=["intersect"])
    p = plan_str(df)
    assert "Exchange" not in p, "rowwise overlay must not shuffle"
    assert "MapInArrow" in p or "MapInPandas" in p


def test_overlay_pairs_single_shuffle(spark):
    from ioverlay_spark.operators.overlay_df import overlay_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    geoms = docs.selectExpr(
        "CAST(doc_id AS BIGINT) AS pair_id",
        "'subject' AS role",
        "CAST(0 AS BIGINT) AS shape_id",
        "CAST(0 AS INT) AS contour_idx",
        "array(CAST(0 AS BIGINT), CAST(4 AS BIGINT), CAST(4 AS BIGINT), CAST(0 AS BIGINT)) AS pts_x",
        "array(CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(4 AS BIGINT), CAST(4 AS BIGINT)) AS pts_y",
    )
    df = overlay_pairs(geoms, rules=["union"])
    p = plan_str(df)
    assert p.count("Exchange hashpartitioning") == 1, (
        "exactly one hash shuffle (the bucket repartition) expected:\n" + p
    )


def test_cell_index_wholestage_codegen(spark):
    import ioverlay_spark.queries as q

    df = q.REGISTRY["cell_index"].spark(spark, SF)
    p = plan_str(df)
    assert "*(" in p  # the WholeStageCodegen stage marker in executedPlan.toString
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, (
        "cell index must be pure Column expressions (JVM), not python UDFs"
    )


def test_segments_build_single_window_shuffle(spark):
    import ioverlay_spark.queries as q

    df = q.REGISTRY["segments_build"].spark(spark, SF)
    p = plan_str(df)
    assert "Window" in p
    # one hash shuffle for the window partitionBy; no extra exchanges
    assert p.count("Exchange hashpartitioning") == 1


def test_embed_knn_stays_jvm(spark):
    import ioverlay_spark.queries as q

    df = q.REGISTRY["embed_knn"].spark(spark, SF)
    p = plan_str(df)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, (
        "dot products must run as JVM higher-order functions"
    )


def test_ivf_assign_broadcasts_centroids(spark):
    from ioverlay_spark.operators.similarity import ivf_assign, ivf_centroids

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = ivf_assign(emb, ivf_centroids(emb, 8))
    p = plan_str(df)
    assert "BroadcastExchange" in p
    assert "SortMergeJoin" not in p


def test_dim_join_broadcasts(spark):
    import ioverlay_spark.queries as q

    df = q.REGISTRY["dim_join_rollup"].spark(spark, SF)
    p = plan_str(df)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_minhash_band_join_is_equi_join(spark):
    """The LSH band self-join must stay a hash equi-join on (band, sig) — no
    nested-loop fallback, no cartesian (would be quadratic at corpus scale)."""
    from ioverlay_spark.queries import REGISTRY

    df = REGISTRY["minhash_lsh_pairs"].spark(spark, SF)
    p = plan_str(df)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_dedup_e2e_verify_joins_are_equi(spark):
    from ioverlay_spark.queries_ext import _dedup_verified_pairs_sql

    df = spark.sql(_dedup_verified_pairs_sql("spark", f"parquet.`{SF}/documents.parquet`"))
    p = plan_str(df)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_hole_binding_band_join_is_equi(spark):
    """bind_holes_df's anchor x segment join must be an equi-join on the x-band
    (shuffle- or broadcast-hash), never a nested loop over segments."""
    from ioverlay_spark.operators.distributed_extract import bind_holes_df

    hulls = spark.createDataFrame(
        [(1, [0, 100, 100, 0], [0, 0, 100, 100])], ["ring_id", "pts_x", "pts_y"]
    )
    holes = spark.createDataFrame([(10, 50, 50)], ["ring_id", "anchor_x", "anchor_y"])
    df = bind_holes_df(hulls, holes)
    p = plan_str(df)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_ivf_assign_broadcasts_centroids(spark):
    """The IVF coarse-quantizer join must broadcast the tiny centroid table —
    a sort-merge join would shuffle the full embedding corpus."""
    from ioverlay_spark.operators.similarity import ivf_assign, ivf_centroids

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = ivf_assign(emb, ivf_centroids(emb, 8))
    p = plan_str(df)
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p


def test_apply_marks_plan_has_no_quadratic_array_ops(spark):
    """Tripwire for the Catalyst pathology class that cost 378 s / 60 s in round
    3 (BENCH.md): array_distinct / array_contains over struct arrays are O(n^2)
    INTERPRETED scans per element, and re-inlined transform chains re-evaluate
    the whole sort/dedup expression per element access. The optimized plan of
    apply_marks_df must contain neither an ArrayDistinct/ArrayContains node nor
    a window exchange (the pairing is map-side zip_with)."""
    from ioverlay_spark.operators.distributed import apply_marks_df

    segs = spark.createDataFrame(
        [(0, 0, 100, 100, 1, 0)], ["ax", "ay", "bx", "by", "subj", "clip"]
    )
    marks = spark.createDataFrame(
        [(0, 0, 100, 100, 50, 50, False, False)],
        ["ax", "ay", "bx", "by", "px", "py", "is_round", "col_ovl"],
    )
    df = apply_marks_df(segs, marks)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    phys = plan_str(df)
    for bad in ("array_distinct", "array_contains", "ArrayDistinct", "ArrayContains"):
        assert bad not in opt and bad not in phys
    # the chain must be built ONCE per row: exactly one array_sort evaluation
    # (a re-inlined chain shows up as several, one per element access)
    assert opt.count("array_sort") <= 1
    # pairing is map-side: no Window operator in the physical plan
    assert "Window" not in phys


def test_strip_assignment_has_no_interpreted_filter(spark):
    """Fill-stage plan shape tripwires, both shuffle forms.

    PACKED (default): pack mapInArrow -> ONE hash exchange on the blob rows ->
    fill mapInArrow. Exactly two python nodes, no interpreted per-strip HOF
    (VERDICT r02 Wrong #4), no row-explode (Generate) anywhere — the explode
    happens in numpy inside the pack stage.

    LEGACY (SPARK_GRAFT_FILL_PACKED=0): the strip index must stay a generated
    nested-IF binary search (pure codegen Column expression) with exactly one
    python node — never an Arrow pandas_udf ahead of the shuffle (it broke the
    map-side stage's codegen with a JVM->python->JVM round trip per row)."""
    import os

    from ioverlay_spark.operators.distributed import compute_fills_df

    segs = spark.createDataFrame(
        [(0, 0, 100, 100, 1, 0), (0, 100, 100, 0, 1, 0)],
        ["ax", "ay", "bx", "by", "subj", "clip"],
    )
    df = compute_fills_df(segs, n_strips=2)
    phys = plan_str(df)
    for bad in ("ArrayFilter", "ArrayExists", "filter(", "exists("):
        assert bad not in phys
    # packed default: two python crossings (pack, fill), no JVM row explode,
    # one exchange carrying the packed blob rows
    assert phys.count("MapInArrow") == 2, phys
    assert phys.count("EvalPython") == 0, phys
    assert "Generate" not in phys, phys
    assert phys.count("Exchange") == 1, phys

    os.environ["SPARK_GRAFT_FILL_PACKED"] = "0"
    try:
        df_legacy = compute_fills_df(segs, n_strips=2)
        phys_l = plan_str(df_legacy)
        for bad in ("ArrayFilter", "ArrayExists", "filter(", "exists("):
            assert bad not in phys_l
        assert phys_l.count("MapInArrow") == 1, phys_l
        assert phys_l.count("EvalPython") == 0, phys_l
    finally:
        os.environ.pop("SPARK_GRAFT_FILL_PACKED", None)


def test_cluster_overlay_plan_shape(spark):
    # the smalls pipeline: label attach must be a BROADCAST join (geometry
    # never shuffles to get its label) and the only geometry Exchange is the
    # single hash repartition by cluster feeding the mapInArrow worker
    from ioverlay_spark.operators.cluster_overlay import cluster_overlay
    from ioverlay_spark import scenarios

    subj, clip = scenarios.windows(6)
    rows = [("subject", i, r[:, 0].tolist(), r[:, 1].tolist()) for i, r in enumerate(subj)]
    rows += [
        ("clip", len(subj) + i, r[:, 0].tolist(), r[:, 1].tolist())
        for i, r in enumerate(clip)
    ]
    df = spark.createDataFrame(rows, ["role", "cid", "pts_x", "pts_y"])
    out = cluster_overlay(df, "difference", "non_zero")
    p = plan_str(out)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    # exactly one shuffle: hashpartitioning by pair_id into the arrow kernel
    exchanges = [l for l in p.splitlines() if "Exchange hashpartitioning" in l]
    assert len(exchanges) == 1, exchanges
    assert "pair_id" in exchanges[0]
