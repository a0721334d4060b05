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

import os

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
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


def _cc_label_arrays(u: np.ndarray, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized min-label connected components with pointer jumping (numpy,
    O(E) per round, O(log diameter) rounds) — the python-dict DSU this replaces
    was the extract stage's single-threaded bottleneck at ~1M edges (lines_net
    audit, BENCH.md). Labels are indices into the SORTED unique node array, so
    the converged minimum label is exactly the minimum node id.

    Returns (nodes, parent): unique sorted node ids and, per node, the index of
    its component's minimum node."""
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
    return nodes, parent


def _union_find_kernel(tbl: pa.Table) -> pa.Table:
    """Single-task connected components over one edge batch:
    (node, component = min node id of the component). Arrow-native: the edge
    columns come in zero-copy and the node map goes back as two flat int64
    arrays — no pandas wrap on a path that moves millions of rows through one
    task."""
    u = tbl.column("u").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    v = tbl.column("v").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    nodes, parent = _cc_label_arrays(u, v)
    return pa.table({"node": pa.array(nodes), "component": pa.array(nodes[parent])})


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
            .applyInArrow(lambda tbl: _union_find_kernel(tbl), schema=schema)
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


_RINGS_ARROW_SCHEMA = pa.schema(
    [
        ("component", pa.int64()),
        ("ring_id", pa.int64()),
        ("is_hole", pa.bool_()),
        ("pts_x", pa.list_(pa.int64())),
        ("pts_y", pa.list_(pa.int64())),
        ("area2", pa.int64()),
        ("anchor_x", pa.int64()),
        ("anchor_y", pa.int64()),
    ]
)


def _col_np(tbl: pa.Table, name: str, dtype=np.int64) -> np.ndarray:
    return tbl.column(name).to_numpy(zero_copy_only=False).astype(dtype, copy=False)


def _extract_kernel(rule: OverlayRule, options: OverlayOptions):
    """Kernel over a SALT group holding MANY components (one grouped-map call
    per component would pay per-group Arrow overhead x millions of components;
    salting bounds the group count while each component is still walked alone).

    Arrow-native (applyInArrow): input columns land zero-copy in numpy, and the
    rings go back as pa.ListArray built from the walk's FLAT buffers — the
    per-ring .tolist() materialization this replaces was over half the kernel's
    wall-clock at 262k rings (lines_net audit, BENCH.md round 4)."""

    def run(tbl: pa.Table) -> pa.Table:
        # globally-unique ring ids without arithmetic on component ids (packed
        # node ids reach ~2^62, so comp * K overflows int64): compose from the
        # salt-group id (disjoint across kernel invocations) and a local counter
        salt = (
            int(tbl.column("_salt")[0].as_py())
            if "_salt" in tbl.column_names and len(tbl)
            else 0
        )
        if not len(tbl):
            return _RINGS_ARROW_SCHEMA.empty_table()
        comp_arr = _col_np(tbl, "component")
        axv = _col_np(tbl, "ax")
        ayv = _col_np(tbl, "ay")
        bxv = _col_np(tbl, "bx")
        byv = _col_np(tbl, "by")
        fills_arr = _col_np(tbl, "fill", np.uint8)
        return _extract_rings_core(
            rule, options, comp_arr, axv, ayv, bxv, byv, fills_arr, salt
        )

    return run


def _extract_rings_core(
    rule: OverlayRule,
    options: OverlayOptions,
    comp_arr: np.ndarray,
    axv: np.ndarray,
    ayv: np.ndarray,
    bxv: np.ndarray,
    byv: np.ndarray,
    fills_arr: np.ndarray,
    salt: int,
    threads: int = 1,
    flat_out: bool = False,
) -> pa.Table:
    """Shared walk + Arrow emission over (component-labeled) boundary segments.

    flat_out=True returns the flat numpy buffers
    (comp, hole, a2, anchor_x, anchor_y, lens, x_vals, y_vals) instead of the
    assembled Arrow table — the ring-blob fused output packs them directly.

    threads > 1 splits the components into contiguous chunks walked on a
    thread pool — exact: components never share an endpoint, so every
    per-component computation of the batch walk is unchanged under chunking
    (ring ids differ only in assignment order, which nothing consumes).
    Used by the FUSED single-task extract, where one python task owns the
    whole boundary set while the rest of the executor sits idle; the salted
    multi-task kernel keeps threads=1."""
    from types import SimpleNamespace

    from ..kernel.batch import _fast_contours_batch
    from ..kernel.extract import (
        _LinkGraph,
        boundary_mask,
        ring_area2,
        simplify_ring,
        walk_contours,
    )

    clockwise = options.output_direction == ContourDirection.CLOCKWISE
    min_area2 = 2 * options.min_output_area
    simplify = not options.preserve_output_collinear
    if True:
        # ONE lexsort over the whole salt group + flat per-component list
        # slices (the batch kernel's shape): a pandas groupby with per-
        # component numpy gathers cost ~68us per 4-edge component on lines_net
        order = np.lexsort((byv, bxv, ayv, axv, comp_arr))
        comp_arr = comp_arr[order]
        axv, ayv, bxv, byv = axv[order], ayv[order], bxv[order], byv[order]
        fills_arr = fills_arr[order]
        bmask = boundary_mask(fills_arr, rule)
        starts = np.flatnonzero(
            np.concatenate([[True], comp_arr[1:] != comp_arr[:-1]])
        )
        bounds = np.concatenate([starts, [len(comp_arr)]])
        ncomp = len(starts)
        comps = comp_arr[starts]

        # vectorized length-class blocks accumulate FLAT numpy buffers (ring
        # values concatenated, per-ring lengths alongside) — pa.ListArray is
        # assembled from them at the end without ever materializing python
        # point lists. The rare scalar-path rings (pinch components, overflow
        # guards) still collect python lists; they are appended at assembly.
        blk_comp: list = []
        blk_hole: list = []
        blk_a2: list = []
        blk_ax: list = []
        blk_ay: list = []
        blk_x: list = []
        blk_y: list = []
        blk_len: list = []
        out_comp: list = []
        out_hole: list = []
        out_ptsx: list = []
        out_ptsy: list = []
        out_a2: list = []
        out_ax: list = []
        out_ay: list = []

        def _chunk_work(c0: int, c1: int) -> tuple:
            lo_r = int(bounds[c0])
            hi_r = int(bounds[c1])
            sl = slice(lo_r, hi_r)
            c_axv, c_ayv = axv[sl], ayv[sl]
            c_bxv, c_byv = bxv[sl], byv[sl]
            c_fills = fills_arr[sl]
            c_bmask = bmask[sl]
            c_bounds = bounds[c0 : c1 + 1] - lo_r
            c_comps = comps[c0:c1]
            # VECTORIZED degree-2 walk over the chunk via the batch kernel's
            # _fast_contours_batch with slot = component: components never
            # share an endpoint (they are connectivity classes over exact
            # endpoints), so the "tiles never share points" invariant holds
            # with zero per-slot offsets. Components it cannot serve (pinch
            # nodes, rings > cap) take the scalar walk below — bit-identical
            # rings either way (the batch kernel's differential guarantee).
            comp_fast, ring_data = _fast_contours_batch(
                SimpleNamespace(ax=c_axv, ay=c_ayv, bx=c_bxv, by=c_byv),
                c_bmask, c_fills, c_bounds, rule, clockwise,
                np.zeros(c1 - c0, dtype=np.int64), 0,
            )
            return _chunk_blocks(
                comp_fast, ring_data, c_comps, c_bounds,
                c_axv, c_ayv, c_bxv, c_byv, c_fills, c_bmask,
            )

        def _chunk_blocks(
            comp_fast, ring_data, comps, bounds,
            axv, ayv, bxv, byv, fills_arr, bmask,
        ):
          blk_comp: list = []
          blk_hole: list = []
          blk_a2: list = []
          blk_ax: list = []
          blk_ay: list = []
          blk_x: list = []
          blk_y: list = []
          blk_len: list = []
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
                    blk_comp.append(comp_of_ring[sel[ki]])
                    blk_hole.append(np.asarray(r_hole[sel[ki]], dtype=bool))
                    blk_a2.append(a2v[ki])
                    blk_ax.append(anch_x[ki])
                    blk_ay.append(anch_y[ki])
                    blk_x.append(x[ki].ravel())
                    blk_y.append(y[ki].ravel())
                    blk_len.append(np.full(len(ki), L, dtype=np.int64))
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

          return (
              blk_comp, blk_hole, blk_a2, blk_ax, blk_ay, blk_x, blk_y,
              blk_len, out_comp, out_hole, out_ptsx, out_ptsy, out_a2,
              out_ax, out_ay,
          )

        k = max(1, min(int(threads), ncomp))
        if k <= 1 or len(comp_arr) < 200_000:
            results = [_chunk_work(0, ncomp)]
        else:
            # equal-ROW chunk boundaries snapped to component starts
            cuts = np.searchsorted(
                bounds, np.linspace(0, len(comp_arr), k + 1).astype(np.int64)
            )
            cuts = np.unique(np.clip(cuts, 0, ncomp))
            if cuts[0] != 0:
                cuts = np.concatenate([[0], cuts])
            if cuts[-1] != ncomp:
                cuts = np.concatenate([cuts, [ncomp]])
            spans = list(zip(cuts[:-1].tolist(), cuts[1:].tolist()))
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(len(spans)) as ex:
                results = list(ex.map(lambda se: _chunk_work(*se), spans))
        for res in results:
            (c_bc, c_bh, c_ba, c_bax, c_bay, c_bx, c_by, c_bl,
             c_oc, c_oh, c_ox, c_oy, c_oa, c_oax, c_oay) = res
            blk_comp.extend(c_bc)
            blk_hole.extend(c_bh)
            blk_a2.extend(c_ba)
            blk_ax.extend(c_bax)
            blk_ay.extend(c_bay)
            blk_x.extend(c_bx)
            blk_y.extend(c_by)
            blk_len.extend(c_bl)
            out_comp.extend(c_oc)
            out_hole.extend(c_oh)
            out_ptsx.extend(c_ox)
            out_ptsy.extend(c_oy)
            out_a2.extend(c_oa)
            out_ax.extend(c_oax)
            out_ay.extend(c_oay)

        # --- Arrow assembly from flat buffers ---
        def cat(chunks, dtype):
            return (
                np.concatenate(chunks).astype(dtype, copy=False)
                if chunks
                else np.empty(0, dtype)
            )

        comp_out = cat(blk_comp, np.int64)
        hole_out = cat(blk_hole, bool)
        a2_out = cat(blk_a2, np.int64)
        ax_out = cat(blk_ax, np.int64)
        ay_out = cat(blk_ay, np.int64)
        lens = cat(blk_len, np.int64)
        x_vals = cat(blk_x, np.int64)
        y_vals = cat(blk_y, np.int64)
        if out_comp:  # scalar-path rings (rare)
            comp_out = np.concatenate([comp_out, np.array(out_comp, np.int64)])
            hole_out = np.concatenate([hole_out, np.array(out_hole, bool)])
            a2_out = np.concatenate([a2_out, np.array(out_a2, np.int64)])
            ax_out = np.concatenate([ax_out, np.array(out_ax, np.int64)])
            ay_out = np.concatenate([ay_out, np.array(out_ay, np.int64)])
            lens = np.concatenate(
                [lens, np.array([len(p) for p in out_ptsx], np.int64)]
            )
            x_vals = np.concatenate(
                [x_vals] + [np.asarray(p, np.int64) for p in out_ptsx]
            )
            y_vals = np.concatenate(
                [y_vals] + [np.asarray(p, np.int64) for p in out_ptsy]
            )
        if flat_out:
            return comp_out, hole_out, a2_out, ax_out, ay_out, lens, x_vals, y_vals
        nring = len(comp_out)
        if nring == 0:
            return _RINGS_ARROW_SCHEMA.empty_table()
        ring_ids = salt * (1 << 40) + np.arange(1, nring + 1, dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        off_arr = pa.array(offsets)
        return pa.Table.from_arrays(
            [
                pa.array(comp_out),
                pa.array(ring_ids),
                pa.array(hole_out),
                pa.ListArray.from_arrays(off_arr, pa.array(x_vals)),
                pa.ListArray.from_arrays(off_arr, pa.array(y_vals)),
                pa.array(a2_out),
                pa.array(ax_out),
                pa.array(ay_out),
            ],
            schema=_RINGS_ARROW_SCHEMA,
        )


_NODE_CAP = 1 << 30  # same bound as kernel.batch._COORD_CAP: packing is exact below it


def _fused_extract_kernel(rule: OverlayRule, options: OverlayOptions):
    """Single-task CC + walk FUSION for small boundary sets: one applyInPandas
    group receives the whole boundary set, labels components in-kernel
    (numpy union-find, the same _cc_label_arrays the one-task CC path uses)
    and walks rings immediately via the shared _extract_kernel body.

    Vs the broadcast-CC path this removes, per overlay: the edge shuffle to the
    CC task, the node->component broadcast build, the map-side hash join and
    the salt re-shuffle of the boundary set — the boundary rows move through
    exactly ONE shuffle (into this task). The walk serializes on one core, but
    below the dispatch cap the vectorized walk is ~1-2 s while the removed
    plumbing costs more (lines_net audit, BENCH.md round 4).

    Node ids: 2^30-biased packing when coordinates fit (exact), else local
    dense ids from np.unique over the endpoint rows — exact at any width, no
    _wide_node_ids join needed on this path."""
    def run(tbl: pa.Table) -> pa.Table:
        if not len(tbl):
            return _RINGS_ARROW_SCHEMA.empty_table()
        ax = _col_np(tbl, "ax")
        ay = _col_np(tbl, "ay")
        bx = _col_np(tbl, "bx")
        by = _col_np(tbl, "by")
        fills_arr = _col_np(tbl, "fill", np.uint8)
        return _fused_extract_arrays(rule, options, ax, ay, bx, by, fills_arr)

    return run


def _fused_extract_arrays(
    rule: OverlayRule,
    options: OverlayOptions,
    ax: np.ndarray,
    ay: np.ndarray,
    bx: np.ndarray,
    by: np.ndarray,
    fills_arr: np.ndarray,
    flat_out: bool = False,
) -> pa.Table:
    """Array-form body of the fused single-task extract (shared by the Arrow
    row feed and the packed-blob feed)."""
    cmax = max(
        int(np.abs(ax).max()), int(np.abs(ay).max()),
        int(np.abs(bx).max()), int(np.abs(by).max()),
    )
    if cmax < _NODE_CAP:
        u = (ax + _NODE_CAP) * (2 * _NODE_CAP) + (ay + _NODE_CAP)
        v = (bx + _NODE_CAP) * (2 * _NODE_CAP) + (by + _NODE_CAP)
    else:
        pts = np.stack(
            [np.concatenate([ax, bx]), np.concatenate([ay, by])], axis=1
        )
        _, inv = np.unique(pts, axis=0, return_inverse=True)
        u, v = inv[: len(ax)].astype(np.int64), inv[len(ax):].astype(np.int64)
    nodes, parent = _cc_label_arrays(u, v)
    comp_of_u = nodes[parent[np.searchsorted(nodes, u)]]
    # this kernel owns the ONE task of its stage (repartition(1)) — the
    # rest of the executor is idle, so the component walk threads out
    threads = int(
        os.environ.get("SPARK_GRAFT_EXTRACT_THREADS", "0")
    ) or min(8, os.cpu_count() or 1)
    return _extract_rings_core(
        rule, options, comp_of_u, ax, ay, bx, by, fills_arr, 0,
        threads=threads, flat_out=flat_out,
    )


def _blob_boundary_arrays(tbl: pa.Table):
    """Parse BOUNDARY_BLOB_SCHEMA rows (fill-stage in-kernel pack, see
    distributed._fill_strips_sorted) back to (ax, ay, bx, by, fill) numpy
    arrays — np.frombuffer memcpy per row, one concatenate per column.
    Word sizes may differ per row (per-partition narrowing); concatenate
    upcasts, then a final astype pins int64."""
    cnts = tbl.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
    wcs = tbl.column("wc").to_numpy(zero_copy_only=False)
    xyf = tbl.column("xyf")
    axs, ays, bxs, bys, fls = [], [], [], [], []
    for r in range(len(tbl)):
        n = int(cnts[r])
        w = int(wcs[r])
        buf = xyf[r].as_py()
        cdt = np.int32 if w == 4 else np.int64
        xy = np.frombuffer(buf, dtype=cdt, count=4 * n)
        axs.append(xy[:n])
        ays.append(xy[n : 2 * n])
        bxs.append(xy[2 * n : 3 * n])
        bys.append(xy[3 * n :])
        fls.append(np.frombuffer(buf, dtype=np.uint8, offset=4 * n * w, count=n))
    if not axs:
        z = np.zeros(0, np.int64)
        return z, z, z, z, np.zeros(0, np.uint8)
    return (
        np.concatenate(axs).astype(np.int64, copy=False),
        np.concatenate(ays).astype(np.int64, copy=False),
        np.concatenate(bxs).astype(np.int64, copy=False),
        np.concatenate(bys).astype(np.int64, copy=False),
        np.concatenate(fls),
    )


def _fused_extract_blob_iter(rule: OverlayRule, options: OverlayOptions):
    """Single-task fused extract over BOUNDARY_BLOB_SCHEMA rows: unpack the
    blobs (memcpy) and run the shared fused CC+walk kernel on the arrays."""

    def it(batches):
        chunks = list(batches)
        if not chunks:
            return
        tbl = pa.Table.from_batches(chunks)
        if not len(tbl):
            return
        ax, ay, bx, by, fl = _blob_boundary_arrays(tbl)
        if not len(ax):
            return
        yield from _fused_extract_arrays(rule, options, ax, ay, bx, by, fl).to_batches()

    return it


# fused-extract ring output as per-chunk blobs: the single fused task emits
# ~RING_BLOB_CHUNKS binary rows instead of millions of list-typed ring rows,
# so the Arrow->JVM row conversion and the rings checkpoint write happen on a
# parallel unpack stage instead of serializing on the one task.
RING_BLOB_SCHEMA = StructType(
    [
        StructField("cnt", LongType()),    # rings in this chunk
        StructField("npts", LongType()),   # total points in this chunk
        StructField("wc", IntegerType()),  # pts word size: 4 or 8
        StructField("base", LongType()),   # first ring_id of the chunk
        StructField("meta", BinaryType()),  # comp|a2|anchx|anchy i64*4cnt, lens i32, hole u8
        StructField("pts", BinaryType()),   # x_vals|y_vals (npts each, wc-byte words)
    ]
)

_RING_BLOB_CHUNKS = int(os.environ.get("SPARK_GRAFT_RING_BLOB_CHUNKS", "64"))


def _flat_rings_to_blob_batches(flat, chunks: int):
    """Chunk the walk's flat ring buffers on ring boundaries and yield
    RING_BLOB batches (tobytes memcpy per chunk)."""
    comp_out, hole_out, a2_out, ax_out, ay_out, lens, x_vals, y_vals = flat
    nring = len(comp_out)
    if nring == 0:
        return
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    cmax = max(
        int(np.abs(x_vals).max(initial=0)), int(np.abs(y_vals).max(initial=0))
    )
    cdt = np.int32 if cmax < 2**31 else np.int64
    cuts = np.unique(np.linspace(0, nring, min(chunks, nring) + 1).astype(np.int64))
    cols = {k: [] for k in ("cnt", "npts", "wc", "base", "meta", "pts")}
    for r0, r1 in zip(cuts[:-1].tolist(), cuts[1:].tolist()):
        o0, o1 = int(offs[r0]), int(offs[r1])
        meta = (
            b"".join(
                a[r0:r1].astype(np.int64, copy=False).tobytes()
                for a in (comp_out, a2_out, ax_out, ay_out)
            )
            + lens[r0:r1].astype(np.int32, copy=False).tobytes()
            + hole_out[r0:r1].astype(np.uint8).tobytes()
        )
        pts = (
            x_vals[o0:o1].astype(cdt, copy=False).tobytes()
            + y_vals[o0:o1].astype(cdt, copy=False).tobytes()
        )
        cols["cnt"].append(r1 - r0)
        cols["npts"].append(o1 - o0)
        cols["wc"].append(cdt().itemsize)
        cols["base"].append(r0 + 1)
        cols["meta"].append(meta)
        cols["pts"].append(pts)
    yield pa.RecordBatch.from_arrays(
        [
            pa.array(np.asarray(cols["cnt"], np.int64)),
            pa.array(np.asarray(cols["npts"], np.int64)),
            pa.array(np.asarray(cols["wc"], np.int32)),
            pa.array(np.asarray(cols["base"], np.int64)),
            pa.array(cols["meta"], type=pa.binary()),
            pa.array(cols["pts"], type=pa.binary()),
        ],
        names=["cnt", "npts", "wc", "base", "meta", "pts"],
    )


def _fused_extract_ringblob_iter(rule: OverlayRule, options: OverlayOptions):
    """Fused CC+walk over BOUNDARY_BLOB rows, emitting RING_BLOB chunks."""

    def it(batches):
        chunks = list(batches)
        if not chunks:
            return
        tbl = pa.Table.from_batches(chunks)
        if not len(tbl):
            return
        ax, ay, bx, by, fl = _blob_boundary_arrays(tbl)
        if not len(ax):
            return
        flat = _fused_extract_arrays(rule, options, ax, ay, bx, by, fl, flat_out=True)
        yield from _flat_rings_to_blob_batches(flat, _RING_BLOB_CHUNKS)

    return it


def _ringblob_rows_iter(batches):
    """Parallel unpack of RING_BLOB chunks back to RINGS_SCHEMA rows — runs
    after a repartition so the list-array build + row conversion + checkpoint
    write spread across the executor instead of the one fused task."""
    for batch in batches:
        tbl = pa.Table.from_batches([batch])
        for r in range(len(tbl)):
            cnt = int(tbl.column("cnt")[r].as_py())
            npts = int(tbl.column("npts")[r].as_py())
            w = int(tbl.column("wc")[r].as_py())
            base = int(tbl.column("base")[r].as_py())
            meta = tbl.column("meta")[r].as_py()
            pts = tbl.column("pts")[r].as_py()
            comp = np.frombuffer(meta, np.int64, count=cnt)
            a2 = np.frombuffer(meta, np.int64, count=cnt, offset=8 * cnt)
            anx = np.frombuffer(meta, np.int64, count=cnt, offset=16 * cnt)
            any_ = np.frombuffer(meta, np.int64, count=cnt, offset=24 * cnt)
            lens = np.frombuffer(meta, np.int32, count=cnt, offset=32 * cnt)
            hole = np.frombuffer(meta, np.uint8, count=cnt, offset=36 * cnt)
            cdt = np.int32 if w == 4 else np.int64
            xv = np.frombuffer(pts, cdt, count=npts).astype(np.int64, copy=False)
            yv = np.frombuffer(pts, cdt, offset=npts * w, count=npts).astype(
                np.int64, copy=False
            )
            offs = pa.array(
                np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(comp),
                    pa.array(base + np.arange(cnt, dtype=np.int64)),
                    pa.array(hole.astype(bool)),
                    pa.ListArray.from_arrays(offs, pa.array(xv)),
                    pa.ListArray.from_arrays(offs, pa.array(yv)),
                    pa.array(a2),
                    pa.array(anx),
                    pa.array(any_),
                ],
                names=[
                    "component", "ring_id", "is_hole", "pts_x", "pts_y",
                    "area2", "anchor_x", "anchor_y",
                ],
            )


def _blob_rows_iter(batches):
    """Unpack BOUNDARY_BLOB_SCHEMA rows back to the per-segment row feed
    (ax, ay, bx, by, fill) — the giant-boundary fallback where the salted
    multi-task extract needs plain rows."""
    for batch in batches:
        tbl = pa.Table.from_batches([batch])
        if not len(tbl):
            continue
        ax, ay, bx, by, fl = _blob_boundary_arrays(tbl)
        if not len(ax):
            continue
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ax),
                pa.array(ay),
                pa.array(bx),
                pa.array(by),
                pa.array(fl.astype(np.int32)),
            ],
            names=["ax", "ay", "bx", "by", "fill"],
        )


_PACKED_BOUNDARY_SCHEMA = "n long, blob binary"


def _pack_boundary_kernel(coord_bytes: int):
    """Per-partition boundary pack: the fused extract's repartition(1) would
    ship millions of 5-column UnsafeRows through the JVM shuffle and convert
    them row->Arrow onto ONE python worker — both serialize on that worker's
    stage. Packing each upstream partition's columns into a single binary blob
    row (ax|ay|bx|by|fill, numpy buffers end-to-end) makes the exchange carry
    ~one row per partition at the same payload bytes, and the single task's
    ingest becomes np.frombuffer slices instead of a row parse. Same trick as
    the packed strip-chain fill shuffle (BENCH.md round 5 #2) — but measured
    a LOSS on this feed (see _extract_packed): kept env-gated off."""
    cdt = np.int32 if coord_bytes == 4 else np.int64

    def it(batches):
        cols: dict[str, list[np.ndarray]] = {
            k: [] for k in ("ax", "ay", "bx", "by", "fill")
        }
        n = 0
        for rb in batches:
            if not rb.num_rows:
                continue
            t = pa.Table.from_batches([rb])
            n += rb.num_rows
            for k in ("ax", "ay", "bx", "by"):
                cols[k].append(_col_np(t, k).astype(cdt, copy=False))
            cols["fill"].append(_col_np(t, "fill", np.uint8))
        if not n:
            return
        blob = b"".join(
            np.concatenate(cols[k]).tobytes()
            for k in ("ax", "ay", "bx", "by", "fill")
        )
        yield pa.RecordBatch.from_pydict(
            {"n": pa.array([n], pa.int64()), "blob": pa.array([blob], pa.binary())}
        )

    return it


def _fused_extract_packed_kernel(
    rule: OverlayRule, options: OverlayOptions, coord_bytes: int
):
    """Unpack the per-partition boundary blobs (zero-copy np.frombuffer
    slices) and run the fused CC+walk on the concatenated arrays."""
    cdt = np.int32 if coord_bytes == 4 else np.int64

    def it(batches):
        parts: list[tuple[np.ndarray, ...]] = []
        for rb in batches:
            if not rb.num_rows:
                continue
            t = pa.Table.from_batches([rb])
            ns = t.column("n").to_pylist()
            col = t.column("blob")
            for ci, chunk in enumerate(col.chunks if hasattr(col, "chunks") else [col]):
                for i in range(len(chunk)):
                    sc = chunk[i]
                    buf = sc.as_buffer() if hasattr(sc, "as_buffer") else sc.as_py()
                    n = ns.pop(0)
                    cb = n * coord_bytes
                    arrs = tuple(
                        np.frombuffer(buf, dtype=cdt, count=n, offset=j * cb)
                        for j in range(4)
                    ) + (np.frombuffer(buf, dtype=np.uint8, count=n, offset=4 * cb),)
                    parts.append(arrs)
        if not parts:
            return
        ax, ay, bx, by = (
            np.concatenate([p[j] for p in parts]).astype(np.int64, copy=False)
            for j in range(4)
        )
        fills_arr = np.concatenate([p[4] for p in parts])
        yield from _fused_extract_arrays(
            rule, options, ax, ay, bx, by, fills_arr
        ).to_batches()

    return it


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


# one fused task at 8M edges holds ~500MB of working arrays (input columns +
# node ids + labels + ring buffers) — comfortably inside one executor; beyond
# it the broadcast-CC (<=_CC_LOCAL_EDGES comp map) and iterative-CC plans
# take over
_FUSED_EXTRACT_CAP = int(os.environ.get("SPARK_GRAFT_FUSED_EXTRACT_EDGES", "8000000"))
# 1 = run the fused kernel driver-side (toArrow + createDataFrame) instead of
# on one python worker behind repartition(1); A/B toggle, see BENCH.md round 5
_FUSED_DRIVER_SIDE = os.environ.get("SPARK_GRAFT_FUSED_DRIVER", "0") == "1"


def _extract_packed() -> bool:
    # packed boundary transfer into the fused task — measured NOT a win here
    # (unlike the fill shuffle): the boundary feed is already int32-narrowed
    # and single-pass, so packing adds a second python Arrow round-trip that
    # costs more than the per-row exchange it removes (same-session A/B at
    # lines_net n=1024: legacy best 6.19 s vs packed best 8.77 s; BENCH.md
    # round 5). Default OFF; kept env-gated for A/B and the differential.
    return os.environ.get("SPARK_GRAFT_EXTRACT_PACKED", "0") == "1"
# edge count up to which CC runs as ONE union-find task and its comp map is
# broadcast back (the map is <= 2 longs per edge: ~16 bytes/edge)
_CC_LOCAL_EDGES = int(os.environ.get("SPARK_GRAFT_CC_LOCAL_EDGES", "4000000"))


def _narrow_boundary(b: DataFrame, cmax) -> DataFrame:
    """Narrow the fused single-task transfer: the shuffle read + Arrow IPC
    into the one python worker serialize on its core, so bytes there are
    wall-clock. Coordinates fit int32 whenever the known cap allows (cmax is
    exact or an upper bound) and fill is 4 bits; _col_np upcasts back to
    int64/uint8 in-kernel, so the kernel math is unchanged (A/B: ~33% off the
    n=1024 lines_net fused stage minima, BENCH.md round-4 fifth pass)."""
    if cmax is None or int(cmax) >= (1 << 31) - 1:
        return b
    return b.select(
        F.col("ax").cast("int").alias("ax"),
        F.col("ay").cast("int").alias("ay"),
        F.col("bx").cast("int").alias("bx"),
        F.col("by").cast("int").alias("by"),
        F.col("fill").cast("tinyint").alias("fill"),
    )


def extract_shapes_df(
    fills: DataFrame,
    rule: OverlayRule,
    options: OverlayOptions = OverlayOptions(),
    band_bits: int = 13,
    pre_filtered: bool = False,
    cmax_hint: int | None = None,
    n_edges_hint: int | None = None,
    packed_boundary: bool = False,
) -> DataFrame:
    """Full distributed extraction. Returns rings with resolved shape ids:
    (shape_id, ring_id, is_hole, pts_x, pts_y, area2).

    pre_filtered=True: the caller already pushed the boundary filter for
    `rule` into the fill stage (compute_fills_df boundary_rule) — skip the
    redundant filter pass here.

    cmax_hint: an UPPER BOUND on |coordinates| when the caller knows one (the
    overlay pipeline's global bbox — splitting never leaves it); saves the
    per-row max scan in the metadata job (count-only agg instead).

    packed_boundary: fills is BOUNDARY_BLOB_SCHEMA rows (compute_fills_df
    boundary_blob=True, implies pre_filtered semantics) — the checkpoint and
    the fused 64->1 exchange carry one binary blob per fill partition instead
    of per-segment rows, and the metadata job is a sum/max over those rows."""
    from ..session import audit_desc

    if packed_boundary and not pre_filtered:
        raise ValueError("packed_boundary requires pre_filtered fills")
    audit_desc(fills.sparkSession, "fill+boundary:ckpt")
    if packed_boundary:
        b = fills.localCheckpoint(eager=True)
    else:
        b = (
            (fills if pre_filtered else boundary_segments_df(fills, rule))
            # extraction reads only coordinates + fill bits: prune before the
            # checkpoint so subj/clip never enter it or the downstream shuffles
            .select("ax", "ay", "bx", "by", "fill")
            .localCheckpoint(eager=True)
        )

    # one metadata job: coordinate cap for node-id packing AND the edge count
    # (reused as the CC dispatch bound, saving its limit-probe job).
    # n_edges_hint: an UPPER BOUND on the row count — when it already clears
    # the fused cap the dispatch is decided without any job at all (the exact
    # count only matters when the bound exceeds the cap, where boundary
    # filtering may still have cut the true count below it).
    if cmax_hint is not None and n_edges_hint is not None and (
        n_edges_hint <= _FUSED_EXTRACT_CAP
    ):
        n_edges = n_edges_hint
        cmax = cmax_hint
    elif packed_boundary:
        # blob metadata rides as columns: the agg touches ~n_partitions rows
        audit_desc(fills.sparkSession, "extract:blob meta")
        meta = b.agg(
            F.max("cmax").alias("m"), F.sum("cnt").alias("n")
        ).first()
        cmax = cmax_hint if cmax_hint is not None else meta["m"]
        n_edges = int(meta["n"] or 0)
    elif cmax_hint is not None:
        audit_desc(fills.sparkSession, "extract:count")
        n_edges = b.count()
        cmax = cmax_hint
    else:
        audit_desc(fills.sparkSession, "extract:meta")
        meta = b.agg(
            F.max(
                F.greatest(
                    F.abs("ax"), F.abs("ay"), F.abs("bx"), F.abs("by")
                )
            ).alias("m"),
            F.count("*").alias("n"),
        ).first()
        cmax, n_edges = meta["m"], int(meta["n"])
    if packed_boundary and n_edges <= _FUSED_EXTRACT_CAP:
        # blob feed straight into the fused task: the exchange moves
        # ~n_partitions binary rows (same payload bytes as the row feed, none
        # of the per-row serialization); the task unpacks via np.frombuffer
        audit_desc(fills.sparkSession, "extract:fused blob walk+ckpt")
        if _FUSED_DRIVER_SIDE:
            ax, ay, bx, by, fl = _blob_boundary_arrays(b.toArrow())
            out = _fused_extract_arrays(rule, options, ax, ay, bx, by, fl)
            rings = fills.sparkSession.createDataFrame(out).localCheckpoint(eager=True)
            return _bind_and_project(rings)
        if os.environ.get("SPARK_GRAFT_RING_BLOB", "0") == "1":
            # A/B toggle, default OFF: ring output leaves the fused task as
            # ~64 binary chunk rows; a repartitioned unpack stage rebuilds the
            # ring rows so the Arrow->JVM row conversion + checkpoint write
            # parallelize instead of serializing on the one fused task.
            # Measured NOT a win at lines_net n=512 (22.1/37.5 s vs 15.2/21.7 s
            # same-window) and a wash at n=1024 (43.2/71.8 vs 45.6/65.0): the
            # extra blob shuffle + per-chunk rebuild costs about what the
            # parallel conversion saves, because the plain path's single-task
            # Arrow emission is already columnar and the checkpoint write
            # overlaps the walk's batch yield. Kept for re-measurement on
            # healthy windows (the differential below covers it).
            n_part = int(fills.sparkSession.conf.get("spark.sql.shuffle.partitions"))
            rings = (
                b.repartition(1)
                .mapInArrow(
                    _fused_extract_ringblob_iter(rule, options),
                    schema=RING_BLOB_SCHEMA,
                )
                .repartition(min(n_part, _RING_BLOB_CHUNKS))
                .mapInArrow(_ringblob_rows_iter, schema=RINGS_SCHEMA)
                .localCheckpoint(eager=True)
            )
            return _bind_and_project(rings)
        rings = (
            b.repartition(1)
            .mapInArrow(_fused_extract_blob_iter(rule, options), schema=RINGS_SCHEMA)
            .localCheckpoint(eager=True)
        )
        return _bind_and_project(rings)
    if packed_boundary:
        # giant boundary set: unpack the blobs back to the per-segment row
        # feed for the salted multi-task plan below (rare — the fused cap is
        # 8 M edges; the unpack is a memcpy map over the checkpointed blobs)
        b = b.mapInArrow(
            _blob_rows_iter, schema="ax long, ay long, bx long, by long, fill int"
        )
    if n_edges <= _FUSED_EXTRACT_CAP:
        # small boundary set: ONE task does CC + walk fused (node ids, labels
        # and the vectorized component walk all in-kernel) — the boundary rows
        # move through exactly one shuffle, no comp-map broadcast or salt
        # re-shuffle. repartition(1) + mapInArrow instead of a constant-key
        # grouped map: the grouped-map plan SORTS the partition by its key
        # before grouping (measured ~6 s vs ~1 s for a 1 M-row noop).
        # Differential-tested equal to the distributed path.
        kern = _fused_extract_kernel(rule, options)

        def it(batches):
            chunks = list(batches)
            if chunks:
                yield from kern(pa.Table.from_batches(chunks)).to_batches()

        audit_desc(fills.sparkSession, "extract:fused walk+ckpt")
        if _extract_packed() and not _FUSED_DRIVER_SIDE:
            # packed transfer (env-gated A/B, default OFF — measured slower
            # than the narrowed row feed, see _extract_packed): per-partition
            # numpy blobs instead of per-row UnsafeRows through the 64->1
            # exchange; see _pack_boundary_kernel.
            coord_bytes = 4 if (cmax is not None and int(cmax) < (1 << 31) - 1) else 8
            rings = (
                _narrow_boundary(b, cmax)
                .mapInArrow(
                    _pack_boundary_kernel(coord_bytes),
                    schema=_PACKED_BOUNDARY_SCHEMA,
                )
                .repartition(1)
                .mapInArrow(
                    _fused_extract_packed_kernel(rule, options, coord_bytes),
                    schema=RINGS_SCHEMA,
                )
                .localCheckpoint(eager=True)
            )
            return _bind_and_project(rings)
        bn = _narrow_boundary(b, cmax)
        if _FUSED_DRIVER_SIDE:
            # A/B alternative: run the fused kernel on the DRIVER python
            # process instead of a lone python worker. toArrow() pulls the
            # boundary blocks straight from the fill tasks (no 64->1 shuffle
            # round), the kernel threads out on the driver, and the ring
            # table re-enters the JVM once via createDataFrame. Same bytes
            # over Arrow either way; what this removes is the single-task
            # shuffle write/read and the cold python-worker first-touch.
            tbl = bn.toArrow()
            out = kern(tbl)
            rings = (
                fills.sparkSession.createDataFrame(out)
                .localCheckpoint(eager=True)
            )
            return _bind_and_project(rings)
        rings = (
            # repartition(1), not coalesce(1): measured equal-or-faster (the
            # 64-way shuffle write parallelizes; coalesce serializes the block
            # reads into the one task) and it cannot infect upstream lineage
            bn.repartition(1)
            .mapInArrow(it, schema=RINGS_SCHEMA)
            .localCheckpoint(eager=True)
        )
        return _bind_and_project(rings)
    # matches the CC dispatch below: the single-task union-find at 4M edges is
    # a ~300MB working set (8M node ids + labels), well inside one executor,
    # and its comp map (~64MB) is still broadcast-friendly
    small_cc = n_edges <= _CC_LOCAL_EDGES
    if cmax is not None and int(cmax) >= _NODE_CAP:
        bb = _wide_node_ids(b)
        comp = connected_components(
            bb.select("u", "v"), local_threshold=_CC_LOCAL_EDGES, count_hint=n_edges
        )
        if small_cc:
            comp = F.broadcast(comp)
        labeled = bb.join(comp, on=bb["u"] == comp["node"]).drop("node", "u", "v")
    else:
        edges = b.select(
            _node_expr("ax", "ay").alias("u"), _node_expr("bx", "by").alias("v")
        )
        comp = connected_components(
            edges, local_threshold=_CC_LOCAL_EDGES, count_hint=n_edges
        )
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
    audit_desc(fills.sparkSession, "extract:salted walk+ckpt")
    rings = (
        # salt components into a BOUNDED number of groups (per-group Arrow
        # overhead x millions of tiny components would dominate otherwise);
        # the kernel walks each component separately inside the group
        labeled.withColumn("_salt", F.pmod(F.hash("component"), F.lit(8 * n_part)))
        .groupBy("_salt")
        .applyInArrow(_extract_kernel(rule, options), schema=RINGS_SCHEMA)
        .localCheckpoint(eager=True)
    )
    return _bind_and_project(rings)


def _bind_and_project(rings: DataFrame) -> DataFrame:
    """Shared tail of both extract plans: hole->hull binding + final shape-id
    projection over the checkpointed raw rings."""
    from ..session import audit_desc

    hulls = rings.where(~F.col("is_hole"))
    holes = rings.where(F.col("is_hole"))
    audit_desc(rings.sparkSession, "extract:holes probe")
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
