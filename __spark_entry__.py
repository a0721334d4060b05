"""Driver contract for the spark-graft builder (PySpark target).

entry()    — flagship: general polygon overlay (hexagon subject x rect clip per doc)
             through the distributed kernel at sf0.001.
queries()  — one entry per implemented operator (SURVEY.md §2 + north-rule additions),
             each (spark, sf_dir) -> DataFrame.
oracle_sql() — DuckDB-equivalent SQL for every SQL-expressible query (exact
             value parity; generated from the same expression templates).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: boolean overlay (intersect/union/xor)
    of per-document hexagon subjects vs shifted rect clips, run pair-parallel through
    the exact kernel; returns the shapes_out DataFrame."""
    from pyspark.sql import functions as F

    from ioverlay_spark.operators.overlay_df import overlay_pairs
    from ioverlay_spark.queries import _clip_rect_exprs, _hex_pts

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = _hex_pts("spark")
    rc = _clip_rect_exprs("doc_id", "spark")

    def ring_sql(points: list[tuple[str, str]]) -> tuple[str, str]:
        xs = ", ".join(f"CAST({x} AS BIGINT)" for x, _ in points)
        ys = ", ".join(f"CAST({y} AS BIGINT)" for _, y in points)
        return f"array({xs})", f"array({ys})"

    hex_pts = [
        (p["x1"], p["y1"]),
        (p["x2"], p["y1"]),
        (p["x2"], p["ym"]),
        (p["xm"], p["ym"]),
        (p["xm"], p["y2"]),
        (p["x1"], p["y2"]),
    ]
    rect_pts = [
        (rc["x1"], rc["y1"]),
        (rc["x2"], rc["y1"]),
        (rc["x2"], rc["y2"]),
        (rc["x1"], rc["y2"]),
    ]
    sx, sy = ring_sql(hex_pts)
    cx, cy = ring_sql(rect_pts)
    subj = docs.selectExpr(
        "CAST(doc_id AS BIGINT) AS pair_id",
        "'subject' AS role",
        "CAST(0 AS BIGINT) AS shape_id",
        "CAST(0 AS INT) AS contour_idx",
        f"{sx} AS pts_x",
        f"{sy} AS pts_y",
    )
    clip = docs.selectExpr(
        "CAST(doc_id AS BIGINT) AS pair_id",
        "'clip' AS role",
        "CAST(0 AS BIGINT) AS shape_id",
        "CAST(0 AS INT) AS contour_idx",
        f"{cx} AS pts_x",
        f"{cy} AS pts_y",
    )
    shapes = overlay_pairs(subj.unionAll(clip), rules=["intersect", "union", "xor"])
    return shapes.select(
        "pair_id", "rule", "shape_id", "contour_idx", "pts_x", "pts_y", "area2"
    ).orderBy("pair_id", "rule", "shape_id", "contour_idx")


# Emitted LAST: queries whose loss under the driver's 50-query cap costs the
# least evidence. Round-5 rotation (VERDICT r04 Next #6, freshness <= 2 rounds
# for every query): the round-4 tail (knn/embed_knn/embed_neardup/ngram_jaccard/
# lang_stats/simhash/token_stats/knn_grid, green in r03 but unchecked in r04)
# moves INTO the checked window along with the new scenario_windows_diff; nine
# queries that passed rows+schema+hash in r04 (CORRECTNESS_r04.json) take the
# tail, so after r05 every registered query has a green driver row in r04 or
# r05. (59 registered after round-5's scenario_windows_diff, cap 50 -> 9 tail
# rows, all of them green in r04)
_TAIL = [
    "segments_build", "segments_merge", "cell_index", "cell_cover",
    "tile_assign", "ring_area", "relate_rects", "clip_polyline",
    "rasterize_pixels",
]


def _ordered():
    from ioverlay_spark.queries import REGISTRY

    head = [n for n in REGISTRY if n not in _TAIL]
    return [(n, REGISTRY[n]) for n in head + [t for t in _TAIL if t in REGISTRY]]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _ordered() if spec.oracle is not None}
