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


def _union_find_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Single-task connected components over one edge batch:
    (node, component = min node id of the component).

    Vectorized min-label propagation with pointer jumping (numpy, O(E) per
    round, O(log diameter) rounds) — the python-dict DSU this replaces was the
    extract stage's single-threaded bottleneck at ~1M edges (lines_net audit,
    BENCH.md). Labels are indices into the SORTED unique node array, so the
    converged minimum label is exactly the minimum node id."""
    u = pdf["u"].to_numpy(np.int64)
    v = pdf["v"].to_numpy(np.int64)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[: len(u)], inv[len(u):]
    parent = np.arange(len(nodes), dtype=np.int64)
    while True:
        m = np.minimum(parent[ui], parent[vi])
        new = parent.copy()
        np.minimum.at(new, ui, m)
        np.minimum.at(new, vi, m)
        while True:
            nn = new[new]
            if np.array_equal(nn, new):
                break
            new = nn
        if np.array_equal(new, parent):
            break
        parent = new
    return pd.DataFrame({"node": nodes, "component": nodes[parent]})


def connected_components(
    edges: DataFrame,
    max_rounds: int = 40,
    local_threshold: int = 4_000_000,
    count_hint: int | None = None,
) -> DataFrame:
    """Connected components: edges(u, v) long node ids -> (node, component=min id).

    Strategy dispatch (the reference Solver's list/tree/frag idea, A3): below
    `local_threshold` edges the whole problem fits one executor task — a single
    applyInPandas union-find (ONE job, no driver loop); above it, alternating
    large-star/small-star label propagation (Kiveris et al.), O(log n) rounds of
    joins + aggregates, each round localCheckpointed to cut lineage. Both paths
    produce identical output (component = min node id of the component).

    Self-loop edges (u == v) are filtered BEFORE the dispatch so both plans see
    the same edge set — a node appearing only in self-loops is absent from the
    output on either path (ADVICE r02). The dispatch count is a bounded
    limit-probe, not a full count, so the large path doesn't pay a full extra
    action just to route; callers that already know an upper bound on the edge
    count (count_hint) skip the probe job entirely."""
    canon = edges.select("u", "v").where(F.col("u") != F.col("v"))
    probe = count_hint if count_hint is not None else canon.limit(local_threshold + 1).count()
    if probe <= local_threshold:
        schema = StructType(
            [StructField("node", LongType()), StructField("component", LongType())]
        )
        return (
            canon.withColumn("_g", F.lit(0))
            .groupBy("_g")
            .applyInPandas(lambda pdf: _union_find_kernel(pdf), schema=schema)
        )
    e = canon.distinct()
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


# final output of both overlay plans (distributed extraction and the one-task
# small-path kernel): resolved shape ids + rings
RINGS_OUT_SCHEMA = StructType(
    [
        StructField("shape_id", LongType()),
        StructField("ring_id", LongType()),
        StructField("is_hole", BooleanType()),
        StructField("pts_x", ArrayType(LongType())),
        StructField("pts_y", ArrayType(LongType())),
        StructField("area2", LongType()),
    ]
)

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
    """Kernel over a SALT group holding MANY components (one applyInPandas group
    per component would pay per-group Arrow overhead x millions of components;
    salting bounds the group count while each component is still walked alone)."""
    from ..kernel.extract import ring_area2, simplify_ring, walk_contours
    from ..kernel.segments import Segments

    clockwise = options.output_direction == ContourDirection.CLOCKWISE

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        from types import SimpleNamespace

        from ..kernel.batch import _fast_contours_batch
        from ..kernel.extract import _LinkGraph, boundary_mask

        cols = [
            "component", "ring_id", "is_hole", "pts_x", "pts_y",
            "area2", "anchor_x", "anchor_y",
        ]
        min_area2 = 2 * options.min_output_area
        simplify = not options.preserve_output_collinear
        # globally-unique ring ids without arithmetic on component ids (packed
        # node ids reach ~2^62, so comp * K overflows int64): compose from the
        # salt-group id (disjoint across kernel invocations) and a local counter
        salt = int(pdf["_salt"].iloc[0]) if "_salt" in pdf.columns else 0
        if not len(pdf):
            return pd.DataFrame([], columns=cols)
        # ONE lexsort over the whole salt group + flat per-component list
        # slices (the batch kernel's shape): a pandas groupby with per-
        # component numpy gathers cost ~68us per 4-edge component on lines_net
        comp_arr = pdf["component"].to_numpy(np.int64)
        axv = pdf["ax"].to_numpy(np.int64)
        ayv = pdf["ay"].to_numpy(np.int64)
        bxv = pdf["bx"].to_numpy(np.int64)
        byv = pdf["by"].to_numpy(np.int64)
        order = np.lexsort((byv, bxv, ayv, axv, comp_arr))
        comp_arr = comp_arr[order]
        axv, ayv, bxv, byv = axv[order], ayv[order], bxv[order], byv[order]
        fills_arr = pdf["fill"].to_numpy()[order].astype(np.uint8)
        bmask = boundary_mask(fills_arr, rule)
        starts = np.flatnonzero(
            np.concatenate([[True], comp_arr[1:] != comp_arr[:-1]])
        )
        bounds = np.concatenate([starts, [len(comp_arr)]])
        ncomp = len(starts)
        comps = comp_arr[starts]

        # VECTORIZED degree-2 walk over the whole salt group via the batch
        # kernel's _fast_contours_batch with slot = component: components never
        # share an endpoint (they are connectivity classes over exact
        # endpoints), so the "tiles never share points" invariant holds with
        # zero per-slot offsets. Components it cannot serve (pinch nodes,
        # rings > cap) take the scalar walk below — bit-identical rings either
        # way (the batch kernel's differential guarantee).
        comp_fast, ring_data = _fast_contours_batch(
            SimpleNamespace(ax=axv, ay=ayv, bx=bxv, by=byv),
            bmask, fills_arr, bounds, rule, clockwise,
            np.zeros(ncomp, dtype=np.int64), 0,
        )

        out_comp: list = []
        out_hole: list = []
        out_ptsx: list = []
        out_ptsy: list = []
        out_a2: list = []
        out_ax: list = []
        out_ay: list = []

        def emit_scalar_ring(comp, ring, hole):
            if simplify:
                ring = simplify_ring(list(ring))
            if len(ring) < 3:
                return
            a2 = ring_area2(ring)
            if a2 == 0 or (min_area2 > 0 and abs(a2) < min_area2):
                return
            k = min(range(len(ring)), key=lambda t: ring[t])
            out_comp.append(comp)
            out_hole.append(bool(hole))
            out_ptsx.append([p[0] for p in ring])
            out_ptsy.append([p[1] for p in ring])
            out_a2.append(a2)
            out_ax.append(ring[k][0])
            out_ay.append(ring[k][1])

        if ring_data is not None:
            # vectorized validate per ring-length block (the _finalize_fast
            # shape, emitting raw rings + anchors instead of bound shapes)
            r_slot = ring_data["slot"]
            r_hole = ring_data["hole"]
            r_len = ring_data["len"]
            comp_of_ring = comps[r_slot]
            for L in np.unique(r_len).tolist():
                if L < 3:
                    # sub-triangle rings are dropped unconditionally (simplify
                    # cannot grow a ring), matching the scalar len<3 skip
                    continue
                sel = np.flatnonzero(r_len == L)
                k = len(sel)
                block = np.empty((k, L, 2), dtype=np.int64)
                block[:, 0, 0] = ring_data["first_x"][sel]
                block[:, 0, 1] = ring_data["first_y"][sel]
                if L > 1:
                    block[:, 1:, 0] = ring_data["buf_x"][sel, : L - 1]
                    block[:, 1:, 1] = ring_data["buf_y"][sel, : L - 1]
                prv = np.roll(block, 1, axis=1)
                if simplify:
                    nxt = np.roll(block, -1, axis=1)
                    dup = np.all(block == prv, axis=2).any(axis=1)
                    da = block - prv
                    db = nxt - block
                    cr = da[:, :, 0] * db[:, :, 1] - da[:, :, 1] * db[:, :, 0]
                    dirty = dup | (cr == 0).any(axis=1) | (L < 3)
                else:
                    dirty = np.zeros(k, dtype=bool)
                mx = int(np.abs(block).max(initial=0))
                # int64 guards: shoelace term sums (L*mx^2) AND the anchor
                # key product (<= 4*mx^2) route to the exact scalar path
                if max(L, 4) * mx * mx >= (1 << 62):
                    dirty[:] = True
                x = block[:, :, 0]
                y = block[:, :, 1]
                a2v = (x * np.roll(y, -1, axis=1)).sum(axis=1) - (
                    np.roll(x, -1, axis=1) * y
                ).sum(axis=1)
                # lexicographic-min anchor per clean ring, vectorized
                kx = x - x.min(axis=1, keepdims=True)
                ky = y - y.min(axis=1, keepdims=True)
                am = (kx * (int(ky.max(initial=0)) + 1) + ky).argmin(axis=1)
                rowsel = np.arange(k)
                anch_x = x[rowsel, am]
                anch_y = y[rowsel, am]
                keep = ~dirty & (a2v != 0)
                if min_area2 > 0:
                    keep &= np.abs(a2v) >= min_area2
                ki = np.flatnonzero(keep)
                if len(ki):
                    out_comp.extend(comp_of_ring[sel[ki]].tolist())
                    out_hole.extend(r_hole[sel[ki]].tolist())
                    out_ptsx.extend(x[ki].tolist())
                    out_ptsy.extend(y[ki].tolist())
                    out_a2.extend(a2v[ki].tolist())
                    out_ax.extend(anch_x[ki].tolist())
                    out_ay.extend(anch_y[ki].tolist())
                for t in np.flatnonzero(dirty).tolist():
                    emit_scalar_ring(
                        int(comp_of_ring[sel[t]]),
                        list(map(tuple, block[t].tolist())),
                        bool(r_hole[sel[t]]),
                    )

        slow = np.flatnonzero(~comp_fast)
        if len(slow):
            all_pa = list(zip(axv.tolist(), ayv.tolist()))
            all_pb = list(zip(bxv.tolist(), byv.tolist()))
            all_fl = fills_arr.tolist()
            comps_l = comps.tolist()
            for ci in slow.tolist():
                lo, hi = int(bounds[ci]), int(bounds[ci + 1])
                comp = int(comps_l[ci])
                g = _LinkGraph(all_pa[lo:hi], all_pb[lo:hi], all_fl[lo:hi])
                contours = walk_contours(None, None, rule, clockwise, bmask[lo:hi], g)
                for ring, hole in contours:
                    emit_scalar_ring(comp, ring, hole)

        ring_ids = [salt * (1 << 40) + i + 1 for i in range(len(out_comp))]
        return pd.DataFrame(
            {
                "component": out_comp,
                "ring_id": ring_ids,
                "is_hole": out_hole,
                "pts_x": out_ptsx,
                "pts_y": out_ptsy,
                "area2": out_a2,
                "anchor_x": out_ax,
                "anchor_y": out_ay,
            },
            columns=cols,
        )

    return run


_NODE_CAP = 1 << 30  # same bound as kernel.batch._COORD_CAP: packing is exact below it


def _node_expr(x: str, y: str) -> F.Column:
    # 2^30-biased packing of a point into one long node id: ids live in
    # [0, 2^62) — exact (collision-free) for |coords| < 2^30, the engine-wide
    # int64-product coordinate cap. Wider grids take _wide_node_ids (exact
    # dense ids via a distinct-points dim), never a silent collision
    # (VERDICT r02 Wrong #3).
    return (F.col(x) + F.lit(_NODE_CAP)) * F.lit(2 * _NODE_CAP) + (F.col(y) + F.lit(_NODE_CAP))


def _wide_node_ids(b: DataFrame) -> DataFrame:
    """Exact node ids for out-of-cap coordinate grids: dense ids from a distinct
    endpoint dim table, joined back onto both segment ends. One extra shuffle,
    zero collision risk at any coordinate width."""
    pts = (
        b.select(F.col("ax").alias("px"), F.col("ay").alias("py"))
        .unionAll(b.select(F.col("bx").alias("px"), F.col("by").alias("py")))
        .distinct()
        .withColumn("nid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    ua = pts.select(
        F.col("px").alias("ax"), F.col("py").alias("ay"), F.col("nid").alias("u")
    )
    vb = pts.select(
        F.col("px").alias("bx"), F.col("py").alias("by"), F.col("nid").alias("v")
    )
    return b.join(ua, ["ax", "ay"]).join(vb, ["bx", "by"])


def _ring_segments_df(rings: DataFrame) -> DataFrame:
    """Ring polylines -> normalized non-vertical segments (ring_id, ax, ay, bx, by).
    Map-side only: edge pairs built inside the array columns (index i paired with
    (i+1) mod n) then exploded — no window, no shuffle. Vertical segments drop
    out naturally (the downward-ray test uses the half-open span [ax, bx))."""
    pairs = rings.where(F.size("pts_x") >= 2).select(
        "ring_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(pts_x) - 1), i -> struct("
                " pts_x[i] AS p0x, pts_y[i] AS p0y,"
                " pts_x[(i + 1) % size(pts_x)] AS p1x,"
                " pts_y[(i + 1) % size(pts_x)] AS p1y))"
            )
        ).alias("e"),
    )
    nxt = pairs.select(
        "ring_id",
        F.col("e.p0x").alias("p0x"),
        F.col("e.p0y").alias("p0y"),
        F.col("e.p1x").alias("p1x"),
        F.col("e.p1y").alias("p1y"),
    ).where(F.col("p0x") != F.col("p1x"))
    fwd = F.col("p0x") < F.col("p1x")
    return nxt.select(
        "ring_id",
        F.when(fwd, F.col("p0x")).otherwise(F.col("p1x")).alias("ax"),
        F.when(fwd, F.col("p0y")).otherwise(F.col("p1y")).alias("ay"),
        F.when(fwd, F.col("p1x")).otherwise(F.col("p0x")).alias("bx"),
        F.when(fwd, F.col("p1y")).otherwise(F.col("p0y")).alias("by"),
    )


def bind_holes_df(hulls: DataFrame, holes: DataFrame, n_bands: int = 256) -> DataFrame:
    """A14 v2: fully distributed hole->hull binding (no driver-side ring data).

    Downward ray cast from each hole anchor against hull-ring segments
    (reference ShapeBinder scanline, iOverlay/src/bind/solver.rs:25-236,
    re-expressed relationally):
      1. hull segments explode into x-bands (bbox cover on x) — map-side;
      2. hole anchors equi-join their band (the only wide shuffle);
      3. exact integer below-test (cross-multiplied rational, no floats);
      4. per (hole, hull): crossing parity = containment, max scaled y-below =
         distance ordering; innermost containing hull = argmax y-below.
    This merges the reference's "first segment strictly under the anchor" with
    containment parity, so hole->hole chains resolve without iteration (a hole's
    innermost CONTAINING HULL is its parent directly).

    Returns (hole_ring_id, shape_id). Holes contained by no hull are dropped
    (caller decides). Precondition: anchors do not lie exactly on hull segments
    (guaranteed for disjoint result rings of one overlay)."""
    segs = _ring_segments_df(hulls.select("ring_id", "pts_x", "pts_y"))
    bounds = segs.agg(
        F.min("ax").alias("x0"), F.max("bx").alias("x1")
    ).first()
    if bounds is None or bounds["x0"] is None:
        spark = hulls.sparkSession
        return spark.createDataFrame([], "hole_ring_id LONG, shape_id LONG")
    x0, x1 = int(bounds["x0"]), int(bounds["x1"])
    band = max(1, (x1 - x0 + n_bands - 1) // n_bands)
    seg_b = segs.withColumn(
        "band", F.explode(F.expr(f"sequence((ax - {x0}) DIV {band}, (bx - {x0}) DIV {band})"))
    ).select(F.col("ring_id").alias("hull_ring_id"), "ax", "ay", "bx", "by", "band")
    anch = holes.select(
        F.col("ring_id").alias("hole_ring_id"),
        "anchor_x",
        "anchor_y",
        F.expr(f"(anchor_x - {x0}) DIV {band}").alias("band"),
    )
    j = anch.join(seg_b, "band").where(
        (F.col("ax") <= F.col("anchor_x")) & (F.col("anchor_x") < F.col("bx"))
    )
    # exact rational y-at-x: num/den with den = bx-ax > 0; strictly below test is
    # num < anchor_y * den (int64-safe for |coords| < 2^30: products <= 2^62)
    num = F.col("ay") * (F.col("bx") - F.col("ax")) + (F.col("by") - F.col("ay")) * (
        F.col("anchor_x") - F.col("ax")
    )
    den = F.col("bx") - F.col("ax")
    below = j.withColumn("num", num).withColumn("den", den).where(
        F.col("num") < F.col("anchor_y") * F.col("den")
    )
    # 2^18 fixed-point y-at-x for the innermost ordering (ties broken by ring id).
    # Overflow-safe decomposition: num can reach coord*den ~ 2^60 for wide grids,
    # so num*2^18 would overflow — split into floor-quotient and remainder first
    # (q <= 2^30 -> q*2^18 <= 2^48; r < den <= 2^31 -> r*2^18 < 2^49). pmod keeps
    # the decomposition floor-consistent (monotone) for negative num.
    # Parity of crossings = containment.
    scaled = F.expr(
        "((num - pmod(num, den)) DIV den) * 262144 + (pmod(num, den) * 262144) DIV den"
    )
    per_hull = (
        below.groupBy("hole_ring_id", "hull_ring_id")
        .agg(
            F.count("*").alias("n_cross"),
            F.max(scaled).alias("y_below"),
        )
        .where(F.col("n_cross") % 2 == 1)
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("hole_ring_id").orderBy(F.desc("y_below"), F.asc("hull_ring_id"))
    return (
        per_hull.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("hole_ring_id", F.col("hull_ring_id").alias("shape_id"))
    )


def extract_shapes_df(
    fills: DataFrame,
    rule: OverlayRule,
    options: OverlayOptions = OverlayOptions(),
    band_bits: int = 13,
    pre_filtered: bool = False,
) -> DataFrame:
    """Full distributed extraction. Returns rings with resolved shape ids:
    (shape_id, ring_id, is_hole, pts_x, pts_y, area2).

    pre_filtered=True: the caller already pushed the boundary filter for
    `rule` into the fill stage (compute_fills_df boundary_rule) — skip the
    redundant filter pass here."""
    b = (fills if pre_filtered else boundary_segments_df(fills, rule)).localCheckpoint(
        eager=True
    )

    # one metadata job: coordinate cap for node-id packing AND the edge count
    # (reused as the CC dispatch bound, saving its limit-probe job)
    meta = b.agg(
        F.max(
            F.greatest(
                F.abs("ax"), F.abs("ay"), F.abs("bx"), F.abs("by")
            )
        ).alias("m"),
        F.count("*").alias("n"),
    ).first()
    cmax, n_edges = meta["m"], int(meta["n"])
    # matches connected_components' local_threshold: the single-task union-find
    # at 4M edges is a ~300MB working set (8M node ids + labels), well inside
    # one executor, and its comp map (~64MB) is still broadcast-friendly
    small_cc = n_edges <= 4_000_000
    if cmax is not None and int(cmax) >= _NODE_CAP:
        bb = _wide_node_ids(b)
        comp = connected_components(bb.select("u", "v"), count_hint=n_edges)
        if small_cc:
            comp = F.broadcast(comp)
        labeled = bb.join(comp, on=bb["u"] == comp["node"]).drop("node", "u", "v")
    else:
        edges = b.select(
            _node_expr("ax", "ay").alias("u"), _node_expr("bx", "by").alias("v")
        )
        comp = connected_components(edges, count_hint=n_edges)
        if small_cc:
            # the single-task CC output is at most 2x the edge bound — small
            # enough to broadcast, which keeps the boundary set map-side (its
            # only remaining shuffle is the salt groupBy below)
            comp = F.broadcast(comp)
        labeled = (
            b.withColumn("u", _node_expr("ax", "ay"))
            .join(comp, on=F.col("u") == comp["node"])
            .drop("node", "u")
        )
    n_part = int(fills.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    rings = (
        # salt components into a BOUNDED number of groups (per-group Arrow
        # overhead x millions of tiny components would dominate otherwise);
        # the kernel walks each component separately inside the group
        labeled.withColumn("_salt", F.pmod(F.hash("component"), F.lit(8 * n_part)))
        .groupBy("_salt")
        .applyInPandas(_extract_kernel(rule, options), schema=RINGS_SCHEMA)
        .localCheckpoint(eager=True)
    )

    hulls = rings.where(~F.col("is_hole"))
    holes = rings.where(F.col("is_hole"))
    if holes.isEmpty():
        return rings.select(
            F.col("ring_id").alias("shape_id"), "ring_id", "is_hole", "pts_x", "pts_y", "area2"
        )

    # v2 hole binding: distributed below-anchor ray cast (x-band equi-join +
    # parity + innermost argmax) — zero driver materialization of ring data.
    amap = bind_holes_df(hulls, holes)
    holes_out = holes.join(
        amap, holes["ring_id"] == amap["hole_ring_id"]
    ).select("shape_id", "ring_id", "is_hole", "pts_x", "pts_y", "area2")
    hulls_out = hulls.select(
        F.col("ring_id").alias("shape_id"), "ring_id", "is_hole", "pts_x", "pts_y", "area2"
    )
    return hulls_out.unionAll(holes_out)
