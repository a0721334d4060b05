"""Distributed contour extraction for the huge-overlay pipeline (SURVEY.md A11-A14).

boundary filter  -> Column expressions over the fill bits
components       -> alternating large-star / small-star label propagation
                    (O(log n) rounds; each round = two joins + aggregates)
per-component    -> groupBy(component).applyInPandas running the exact kernel walk
hole binding     -> distributed "first segment strictly below the anchor" scan:
                    anchors x boundary segments equi-joined on x-bands, max_by on
                    the exact rational y-at-x, hole->hole chains resolved driver-side
                    (reference ShapeBinder, iOverlay/src/bind/solver.rs:25-236)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..options import ContourDirection, FillRule, OverlayOptions, OverlayRule


def boundary_segments_df(fills: DataFrame, rule: OverlayRule) -> DataFrame:
    """A11: keep result-boundary segments (membership differs across sides)."""
    from ..kernel.fill import CLIP_BOTTOM, CLIP_TOP, SUBJ_BOTTOM, SUBJ_TOP

    s_top = (F.col("fill").bitwiseAND(SUBJ_TOP) != 0).alias("s_top")
    s_bot = (F.col("fill").bitwiseAND(SUBJ_BOTTOM) != 0).alias("s_bot")
    c_top = (F.col("fill").bitwiseAND(CLIP_TOP) != 0).alias("c_top")
    c_bot = (F.col("fill").bitwiseAND(CLIP_BOTTOM) != 0).alias("c_bot")

    def member(s, c):
        if rule == OverlayRule.SUBJECT:
            return s
        if rule == OverlayRule.CLIP:
            return c
        if rule == OverlayRule.INTERSECT:
            return s & c
        if rule == OverlayRule.UNION:
            return s | c
        if rule == OverlayRule.DIFFERENCE:
            return s & ~c
        if rule == OverlayRule.INVERSE_DIFFERENCE:
            return c & ~s
        return s != c  # XOR (boolean Columns don't support ^)

    df = fills.select("*", s_top, s_bot, c_top, c_bot)
    return df.where(
        member(F.col("s_top"), F.col("c_top")) != member(F.col("s_bot"), F.col("c_bot"))
    ).drop("s_top", "s_bot", "c_top", "c_bot")


def connected_components(edges: DataFrame, max_rounds: int = 40) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et al.):
    edges(u, v) long node ids -> (node, component). Converges in O(log n) rounds;
    each round localCheckpoints to cut lineage (resumable at stage granularity)."""
    e = edges.select("u", "v").where(F.col("u") != F.col("v")).distinct()
    # undirected -> keep both directions for neighborhood construction
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # parent starts as min neighbor (including self)
    parent = (
        sym.select("u", "v")
        .unionAll(sym.select("u", F.col("u").alias("v")))
        .groupBy("u")
        .agg(F.min("v").alias("p"))
        .localCheckpoint(eager=True)
    )
    cur = sym
    for _ in range(max_rounds):
        # large-star: for each node u, attach neighbors v > u to min(parent of u's
        # neighborhood); small-star: attach parents. Implemented as the standard
        # "hash-to-min" variant: propagate min component id across edges until stable.
        p1 = parent.alias("pu")
        j = (
            cur.join(p1, cur["u"] == F.col("pu.u"))
            .select(cur["v"].alias("u"), F.col("pu.p").alias("cand"))
        )
        new_parent = (
            j.unionAll(parent.select(F.col("u"), F.col("p").alias("cand")))
            .groupBy("u")
            .agg(F.min("cand").alias("p"))
            .localCheckpoint(eager=True)
        )
        # pointer jumping: p = parent[parent[u]] (doubles propagation distance)
        pj = (
            new_parent.alias("a")
            .join(
                new_parent.select(F.col("u").alias("pu2"), F.col("p").alias("pp")).alias("b"),
                F.col("a.p") == F.col("pu2"),
                "left",
            )
            .select(F.col("a.u").alias("u"), F.coalesce("pp", "a.p").alias("p"))
            .localCheckpoint(eager=True)
        )
        changed = (
            pj.alias("n")
            .join(parent.alias("o"), "u")
            .where(F.col("n.p") != F.col("o.p"))
            .isEmpty()
        )
        parent = pj
        if changed:
            break
    return parent.select(F.col("u").alias("node"), F.col("p").alias("component"))


RINGS_SCHEMA = StructType(
    [
        StructField("component", LongType()),
        StructField("ring_id", LongType()),
        StructField("is_hole", BooleanType()),
        StructField("pts_x", ArrayType(LongType())),
        StructField("pts_y", ArrayType(LongType())),
        StructField("area2", LongType()),
        StructField("anchor_x", LongType()),
        StructField("anchor_y", LongType()),
    ]
)


def _extract_kernel(rule: OverlayRule, options: OverlayOptions):
    from ..kernel.extract import ring_area2, simplify_ring, walk_contours
    from ..kernel.segments import Segments

    clockwise = options.output_direction == ContourDirection.CLOCKWISE

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        comp = int(pdf["component"].iloc[0])
        order = np.lexsort(
            (pdf["by"].to_numpy(), pdf["bx"].to_numpy(), pdf["ay"].to_numpy(), pdf["ax"].to_numpy())
        )
        segs = Segments(
            pdf["ax"].to_numpy()[order],
            pdf["ay"].to_numpy()[order],
            pdf["bx"].to_numpy()[order],
            pdf["by"].to_numpy()[order],
            pdf["subj"].to_numpy()[order],
            pdf["clip"].to_numpy()[order],
        )
        fills = pdf["fill"].to_numpy()[order].astype(np.uint8)
        contours = walk_contours(segs, fills, rule, clockwise)
        rows = []
        min_area2 = 2 * options.min_output_area
        for i, (ring, hole) in enumerate(contours):
            if not options.preserve_output_collinear:
                ring = simplify_ring(list(ring))
            if len(ring) < 3:
                continue
            a2 = ring_area2(ring)
            if a2 == 0 or (min_area2 > 0 and abs(a2) < min_area2):
                continue
            k = min(range(len(ring)), key=lambda t: ring[t])
            rows.append(
                (
                    comp,
                    comp * 1_000_000 + i,
                    bool(hole),
                    [p[0] for p in ring],
                    [p[1] for p in ring],
                    a2,
                    ring[k][0],
                    ring[k][1],
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "component",
                "ring_id",
                "is_hole",
                "pts_x",
                "pts_y",
                "area2",
                "anchor_x",
                "anchor_y",
            ],
        )

    return run


def _node_expr(x: str, y: str) -> F.Column:
    # 2^21-biased packing of a point into one long node id (coords < 2^21 assumed
    # after quantization; fall back to xxhash64 for wider grids)
    return (F.col(x) + F.lit(1 << 21)) * F.lit(1 << 22) + (F.col(y) + F.lit(1 << 21))


def extract_shapes_df(
    fills: DataFrame,
    rule: OverlayRule,
    options: OverlayOptions = OverlayOptions(),
    band_bits: int = 13,
) -> DataFrame:
    """Full distributed extraction. Returns rings with resolved shape ids:
    (shape_id, ring_id, is_hole, pts_x, pts_y, area2)."""
    b = boundary_segments_df(fills, rule).localCheckpoint(eager=True)

    edges = b.select(
        _node_expr("ax", "ay").alias("u"), _node_expr("bx", "by").alias("v")
    )
    comp = connected_components(edges)

    labeled = (
        b.withColumn("u", _node_expr("ax", "ay"))
        .join(comp, on=F.col("u") == comp["node"])
        .drop("node", "u")
    )
    n_part = int(fills.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    rings = (
        labeled.repartition(n_part, "component")
        .groupBy("component")
        .applyInPandas(_extract_kernel(rule, options), schema=RINGS_SCHEMA)
        .localCheckpoint(eager=True)
    )

    hulls = rings.where(~F.col("is_hole"))
    holes = rings.where(F.col("is_hole"))
    if holes.isEmpty():
        return rings.select(
            F.col("ring_id").alias("shape_id"), "ring_id", "is_hole", "pts_x", "pts_y", "area2"
        )

    # v1 hole binding: exact PIP of each hole anchor against hull rings, innermost
    # (smallest-area) containing hull wins. Driver-side over RING data (rings are
    # output-scale, orders of magnitude smaller than segments); the fully
    # distributed below-anchor scan (x-band equi-join + max_by) is the v2 path.
    hull_rows = hulls.select("ring_id", "pts_x", "pts_y", "area2").collect()
    hull_data = [
        (int(r["ring_id"]), np.stack([np.array(r["pts_x"]), np.array(r["pts_y"])], axis=1), int(r["area2"]))
        for r in hull_rows
    ]
    from ..kernel.extract import _point_in_ring

    anchor_rows = holes.select("ring_id", "anchor_x", "anchor_y").collect()
    assign = []
    for r in anchor_rows:
        x, y = int(r["anchor_x"]), int(r["anchor_y"])
        containing = [
            (abs(a2), rid) for rid, ring, a2 in hull_data if _point_in_ring(x, y, ring)
        ]
        if containing:
            assign.append((int(r["ring_id"]), min(containing)[1]))
    spark = fills.sparkSession
    if assign:
        amap = spark.createDataFrame(assign, ["hole_ring_id", "shape_id"])
        holes_out = holes.join(
            amap, holes["ring_id"] == amap["hole_ring_id"]
        ).select("shape_id", "ring_id", "is_hole", "pts_x", "pts_y", "area2")
    else:
        holes_out = None
    hulls_out = hulls.select(
        F.col("ring_id").alias("shape_id"), "ring_id", "is_hole", "pts_x", "pts_y", "area2"
    )
    return hulls_out.unionAll(holes_out) if holes_out is not None else hulls_out
