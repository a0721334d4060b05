"""DataFrame-native spatial operators over any bigint-id table: deterministic geometry
derivation, cell covers, point-in-polygon join, tile assignment, kNN.

All builders are pure Column expressions (whole-stage codegen) except the overlay
kernel; joins are cell-key equi-joins (shuffle hash / broadcast by Catalyst+AQE),
never theta joins — the pattern that survives 1000-executor scale (SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.exprgen import (
    GRID_BITS,
    cell_expr,
    cell_xy_exprs,
    morton_from_cxcy,
    point_exprs,
    rect_exprs,
)


def derive_points(ids: DataFrame, id_col: str) -> DataFrame:
    """(id) -> (p_id, px, py) deterministic query points."""
    p = point_exprs(id_col, "spark")
    return ids.selectExpr(
        f"CAST({id_col} AS BIGINT) AS p_id",
        f"CAST({p['px']} AS BIGINT) AS px",
        f"CAST({p['py']} AS BIGINT) AS py",
    )


def derive_rects(ids: DataFrame, id_col: str) -> DataFrame:
    """(id) -> (r_id, x1, y1, x2, y2) deterministic rectangle payloads."""
    r = rect_exprs(id_col, "spark")
    return ids.selectExpr(
        f"CAST({id_col} AS BIGINT) AS r_id",
        f"CAST({r['x1']} AS BIGINT) AS x1",
        f"CAST({r['y1']} AS BIGINT) AS y1",
        f"CAST({r['x2']} AS BIGINT) AS x2",
        f"CAST({r['y2']} AS BIGINT) AS y2",
    )


def with_cell(df: DataFrame, x_col: str, y_col: str, level: int, out: str = "cell") -> DataFrame:
    return df.withColumn(out, F.expr(cell_expr(x_col, y_col, level, "spark")).cast("long"))


def rect_cover(rects: DataFrame, level: int) -> DataFrame:
    """(r_id, x1..y2) -> (r_id, cell) exploded cover at `level` (half-open rects)."""
    cx1, cy1 = cell_xy_exprs("x1", "y1", level, "spark")
    cx2, cy2 = cell_xy_exprs("(x2 - 1)", "(y2 - 1)", level, "spark")
    morton = morton_from_cxcy("cx", "cy", level, "spark")
    return (
        rects.withColumn("cx1", F.expr(cx1))
        .withColumn("cx2", F.expr(cx2))
        .withColumn("cy1", F.expr(cy1))
        .withColumn("cy2", F.expr(cy2))
        .withColumn("cx", F.explode(F.expr("sequence(cx1, cx2)")))
        .withColumn("cy", F.explode(F.expr("sequence(cy1, cy2)")))
        .select("r_id", F.expr(morton).cast("long").alias("cell"), "x1", "y1", "x2", "y2")
    )


def pip_join(points: DataFrame, rects: DataFrame, level: int = 6) -> DataFrame:
    """Point-in-rect spatial join via cell-cover candidates + exact verify + dedup.

    The shuffle is a cell-key equi-join; skew = hot cells, handled by choosing the
    level so covers stay small (and by salting in the distributed split pipeline)."""
    pts = with_cell(points, "px", "py", level)
    cover = rect_cover(rects, level)
    return (
        pts.join(cover, "cell")
        .where(
            (F.col("px") >= F.col("x1"))
            & (F.col("px") < F.col("x2"))
            & (F.col("py") >= F.col("y1"))
            & (F.col("py") < F.col("y2"))
        )
        .select("p_id", "r_id")
        .distinct()
    )


def tile_assign(rects: DataFrame, level: int = 5) -> DataFrame:
    """Per-tile rect counts (tiling surface)."""
    return (
        rect_cover(rects, level)
        .groupBy("cell")
        .agg(
            F.count("*").cast("long").alias("n_rects"),
            F.min("r_id").cast("long").alias("min_id"),
            F.max("r_id").cast("long").alias("max_id"),
        )
        .withColumnRenamed("cell", "tile")
    )


def knn_brute(points: DataFrame, centers: DataFrame, k: int = 3) -> DataFrame:
    """Exact kNN by cross join + window top-k (baseline; O(P*C) — use knn_cell_ring
    at scale). centers: (r_id, cx2, cy2) doubled coordinates."""
    d = points.crossJoin(centers).select(
        "p_id",
        "r_id",
        (
            (2 * F.col("px") - F.col("cx2")) * (2 * F.col("px") - F.col("cx2"))
            + (2 * F.col("py") - F.col("cy2")) * (2 * F.col("py") - F.col("cy2"))
        ).alias("d2"),
    )
    w = Window.partitionBy("p_id").orderBy("d2", "r_id")
    return d.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)


def rect_centers(rects: DataFrame, level: int = 6) -> DataFrame:
    """(r_id, cx2, cy2, cell) doubled-coordinate centers with their cell at `level`."""
    c = rects.select(
        "r_id",
        (F.col("x1") + F.col("x2")).alias("cx2"),
        (F.col("y1") + F.col("y2")).alias("cy2"),
    )
    shift = GRID_BITS - level
    return c.withColumn(
        "cell",
        F.expr(
            morton_from_cxcy(
                f"(CAST(cx2 AS BIGINT) >> {shift + 1})",
                f"(CAST(cy2 AS BIGINT) >> {shift + 1})",
                level,
                "duckdb",  # plain >> syntax also parses in Spark SQL
            )
        ).cast("long"),
    )


def knn_auto_level(n_centers: int, target_per_cell: int = 8) -> int:
    """Cell level so that ~target_per_cell centers land per occupied cell.

    Centers span [0, 2^19) per axis (a quarter of the 2^20 grid per axis), so the
    occupied cell count at `level` is (2^level / 2)^2."""
    import math

    level = round(math.log2(max(n_centers, 1) / target_per_cell) / 2) + 1
    return max(3, min(9, level))


def knn_cell_ring(
    points: DataFrame,
    centers: DataFrame,
    k: int = 3,
    level: int = 6,
    block_halfwidths: tuple[int, ...] = (1, 3),
) -> DataFrame:
    """Exact kNN via phased cell-neighborhood expansion (north rule).

    Phase h (for h in block_halfwidths): join each unsettled point against all
    centers in its (2h+1)x(2h+1) cell block (cell-key equi-join after an offset
    explode — never a theta join), window top-k. A point is SETTLED when it holds
    >= k candidates whose k-th distance <= h*cell_size: any unexplored center lies
    at Chebyshev cell distance > h, hence Euclidean distance > h*cell_size.
    Final phase: brute crossJoin for the (rare) stragglers in sparse regions.

    Bounded number of Spark jobs (one per phase), unlike per-ring iteration; each
    phase recomputes its full block so no accumulator state is carried.
    """
    shift = GRID_BITS - level
    cell_size = 1 << shift
    n_axis = 1 << level

    pts = points.select(
        "p_id",
        (2 * F.col("px")).alias("px2"),
        (2 * F.col("py")).alias("py2"),
        F.shiftright(F.col("px").cast("long"), shift).alias("pcx"),
        F.shiftright(F.col("py").cast("long"), shift).alias("pcy"),
    )
    ctr = centers.select(
        "r_id",
        "cx2",
        "cy2",
        F.shiftright(F.col("cx2").cast("long"), shift + 1).alias("ccx"),
        F.shiftright(F.col("cy2").cast("long"), shift + 1).alias("ccy"),
    ).cache()

    d2_expr = (
        (F.col("px2") - F.col("cx2")) * (F.col("px2") - F.col("cx2"))
        + (F.col("py2") - F.col("cy2")) * (F.col("py2") - F.col("cy2"))
    ).alias("d2")
    w = Window.partitionBy("p_id").orderBy("d2", "r_id")
    try:
        n_part = 2 * int(points.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        n_part = 64

    remaining = pts
    settled_parts = []
    for h in block_halfwidths:
        offs = [(dx, dy) for dx in range(-h, h + 1) for dy in range(-h, h + 1)]
        off_sql = ", ".join(f"named_struct('dx', {dx}L, 'dy', {dy}L)" for dx, dy in offs)
        block = (
            remaining.withColumn("o", F.explode(F.expr(f"array({off_sql})")))
            .select(
                "p_id", "px2", "py2",
                (F.col("pcx") + F.col("o.dx")).alias("qcx"),
                (F.col("pcy") + F.col("o.dy")).alias("qcy"),
                "pcx", "pcy",
            )
            .where(
                (F.col("qcx") >= 0) & (F.col("qcx") < n_axis)
                & (F.col("qcy") >= 0) & (F.col("qcy") < n_axis)
            )
        )
        cand = block.join(
            ctr, (F.col("qcx") == F.col("ccx")) & (F.col("qcy") == F.col("ccy"))
        ).select("p_id", "px2", "py2", "pcx", "pcy", "r_id", d2_expr)
        # explicit repartition: the window's sort input is an exploded candidate set
        # whose pre-explosion byte estimate is tiny — without this, AQE coalesces the
        # window exchange to ~1 task (observed: a 341 s single-task sort at sf0.1)
        topk = (
            cand.repartition(n_part, "p_id")
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .localCheckpoint(eager=True)  # cut iterative lineage (resumability pattern)
        )
        safe2 = (2 * cell_size * h) ** 2  # doubled-coordinate bound
        stats = topk.groupBy("p_id").agg(F.count("*").alias("nc"), F.max("d2").alias("dmax"))
        settled_ids = stats.where((F.col("nc") >= k) & (F.col("dmax") <= F.lit(safe2)))
        settled_parts.append(
            topk.join(settled_ids.select("p_id"), "p_id").select("p_id", "r_id", "d2", "rnk")
        )
        remaining = (
            remaining.join(settled_ids.select("p_id"), "p_id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if remaining.isEmpty():
            break

    if not remaining.isEmpty():
        # brute fallback for stragglers (few points x all centers)
        cand = remaining.crossJoin(ctr).select("p_id", "px2", "py2", "r_id", d2_expr)
        topk = (
            cand.repartition(n_part, "p_id")
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
        )
        settled_parts.append(topk.select("p_id", "r_id", "d2", "rnk"))

    out = settled_parts[0]
    for part in settled_parts[1:]:
        out = out.unionAll(part)
    return out.select("p_id", "r_id", "d2", F.col("rnk").cast("long").alias("rnk"))
