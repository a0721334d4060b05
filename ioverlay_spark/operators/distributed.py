"""Distributed pipeline for ONE huge boolean overlay (SURVEY.md §7 v2).

When a single overlay job has millions of segments, the per-pair kernel cannot hold
it; this pipeline distributes every stage of the reference algorithm:

  A1/A2  sort+merge          -> groupBy(a,b).sum(counts), drop zeros (hash agg)
  A6/A7  split               -> grid-cell explode -> per-cell pandas kernel finds
                                exact intersection marks -> global mark dedup
  A8     apply marks         -> PURE Column ops: collect+sort marks per segment,
                                explode sub-segment chain (no Python in the path)
  A9     snap fixpoint       -> driver loop; each round is one Spark job
  A10    fill                -> x-strip explode -> per-strip vectorized ray-cast
                                winding (each segment evaluated in its midpoint
                                strip against all segments crossing that strip)
  A11-13 boundary + extract  -> Column-expr filter -> connected components via
                                alternating large-star/small-star (O(log n) rounds)
                                -> per-component kernel walk
  A14    hole binding        -> distributed below-anchor scan (x-band equi-join +
                                max_by), hole->hole chains resolved on the driver

Skew: per-cell segment histograms pick the grid level; cells exceeding the hot
threshold are salted to a finer sub-grid before the pandas kernel (north rule).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
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

from ..kernel.split import cross_pair
from ..options import FillRule, OverlayOptions, OverlayRule

SEG_COLS = ["ax", "ay", "bx", "by", "subj", "clip"]

MARKS_SCHEMA = StructType(
    [
        StructField("ax", LongType()),
        StructField("ay", LongType()),
        StructField("bx", LongType()),
        StructField("by", LongType()),
        StructField("px", LongType()),
        StructField("py", LongType()),
        StructField("is_round", BooleanType()),
        # mark came from a collinear-overlap pair — the only pair class whose
        # sub-segments can coincide after apply (gates the post-apply merge)
        StructField("col_ovl", BooleanType()),
    ]
)


def merge_segments_df(segs: DataFrame, extra_aggs: dict[str, str] | None = None) -> DataFrame:
    """A2: coincident merge (reference iOverlay/src/segm/merge.rs:26-87).

    extra_aggs: payload columns carried through the pipeline (A19 edge data,
    iOverlay/src/core/edge_data.rs:5-19) — {col: SQL agg expr} gives the user merge
    policy for coincident segments (e.g. {"data": "bit_or(data)"} for provenance)."""
    aggs = [F.sum("subj").alias("subj"), F.sum("clip").alias("clip")]
    for col, expr in (extra_aggs or {}).items():
        aggs.append(F.expr(expr).alias(col))
    return (
        segs.groupBy("ax", "ay", "bx", "by")
        .agg(*aggs)
        .where((F.col("subj") != 0) | (F.col("clip") != 0))
    )


def _cell_cover_expr(level_col_free: int, grid_min: int, cell_size: int):
    """sequence of covered cell columns for a segment bbox."""
    return (
        f"sequence( (least(ax, bx) - {grid_min}) DIV {cell_size},"
        f" (greatest(ax, bx) - {grid_min}) DIV {cell_size} )",
        f"sequence( (least(ay, by) - {grid_min}) DIV {cell_size},"
        f" (greatest(ay, by) - {grid_min}) DIV {cell_size} )",
    )


_PAIR_BLOCK = int(os.environ.get("SPARK_GRAFT_PAIR_BLOCK", "4000000"))


_MARKS_ARROW_SCHEMA = pa.schema(
    [
        ("ax", pa.int64()),
        ("ay", pa.int64()),
        ("bx", pa.int64()),
        ("by", pa.int64()),
        ("px", pa.int64()),
        ("py", pa.int64()),
        ("is_round", pa.bool_()),
        ("col_ovl", pa.bool_()),
    ]
)


_MARKS_PACKED_ARROW_SCHEMA = pa.schema(
    [
        ("_sid", pa.int64()),
        ("k", pa.int64()),
        ("is_round", pa.bool_()),
        ("col_ovl", pa.bool_()),
    ]
)

MARKS_PACKED_SCHEMA = StructType(
    [
        StructField("_sid", LongType()),
        StructField("k", LongType()),
        StructField("is_round", BooleanType()),
        StructField("col_ovl", BooleanType()),
    ]
)


def _find_marks_kernel(tbl: pa.Table, packed: bool = False) -> pa.Table:
    """Per-cell exact pairwise crossing detection (A6/A7): vectorized candidate
    window + orientation-sign prefilter (kernel/batch.interacting_mask, incl. the
    collinear-overlap refinement that keeps same-line chains from flooding the
    exact solver) + the vectorized exact cross solver (kernel/cross_vec).

    Pair enumeration is CHUNKED (ADVICE r02 distributed.py:108): i-rows are
    processed in blocks bounded by a max raw-pair budget, so a crossing-dense
    cell near the hot threshold materializes at most ~_PAIR_BLOCK-row index
    arrays at a time instead of one O(total-pairs) allocation. Coordinates at or
    beyond the int64-product cap (2^30) take the scalar python-int solver.

    packed=False emits marks keyed by segment coordinates (8 columns).
    packed=True (callers that guarantee in-cap coordinates AND ship a stable
    `_sid` per segment) emits 4 columns: (_sid, k) where k is the packed
    along-segment chain key apply_marks_df sorts by — the mark set is the
    round's largest dataset, and halving its width halves the checkpoint,
    shuffle and agg bytes. Arrow-native either way."""
    from ..kernel.batch import _COORD_CAP, interacting_mask
    from ..kernel.cross_vec import cross_pairs_batch

    def col(name):
        return tbl.column(name).to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False
        )

    ax, ay, bx, by = col("ax"), col("ay"), col("bx"), col("by")
    sid = col("_sid") if packed else None
    n = len(ax)
    rows = []  # scalar-path rows (wide coords only)
    outs = []  # vectorized-path column blocks
    if n >= 2:
        order = np.lexsort((by, bx, ay, ax))
        ax, ay, bx, by = ax[order], ay[order], bx[order], by[order]
        if packed:
            sid = sid[order]
        ymin = np.minimum(ay, by)
        ymax = np.maximum(ay, by)
        his = np.searchsorted(ax, bx, side="right")
        i0 = np.arange(n, dtype=np.int64)
        counts = np.maximum(his - i0 - 1, 0)
        cum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(counts)])
        scalar = max(
            abs(int(ax[0])), abs(int(ax[-1])),
            abs(int(ay.min())), abs(int(ay.max())),
            abs(int(bx.min())), abs(int(bx.max())),
            abs(int(by.min())), abs(int(by.max())),
        ) >= _COORD_CAP
        start = 0
        while start < n - 1:
            stop = int(np.searchsorted(cum, cum[start] + _PAIR_BLOCK, side="left"))
            stop = min(max(stop, start + 1), n)
            c = counts[start:stop]
            total = int(c.sum())
            base = cum[start]
            lo = start
            start = stop
            if total == 0:
                continue
            i_rep = np.repeat(np.arange(lo, stop, dtype=np.int64), c)
            j = np.arange(total, dtype=np.int64) - (cum[i_rep] - base) + i_rep + 1
            m = (ymin[j] <= ymax[i_rep]) & (ymax[j] >= ymin[i_rep])
            i_rep, j = i_rep[m], j[m]
            if len(i_rep) == 0:
                continue
            # drop duplicate rows of the SAME segment (exploded into a cell twice)
            same = (
                (ax[i_rep] == ax[j]) & (ay[i_rep] == ay[j])
                & (bx[i_rep] == bx[j]) & (by[i_rep] == by[j])
            )
            i_rep, j = i_rep[~same], j[~same]
            keep, coll = interacting_mask(
                ax[i_rep], ay[i_rep], bx[i_rep], by[i_rep], ax[j], ay[j], bx[j], by[j],
                with_collinear=True,
            )
            i_rep, j, coll = i_rep[keep], j[keep], coll[keep]
            if len(i_rep) == 0:
                continue
            if scalar:
                # wide-coordinate fallback: conservatively flag every mark as
                # collinear-capable (the merge always runs). Unreachable in
                # packed mode — callers choose packed only under the global
                # coordinate cap, which bounds every cell.
                for i, jj in zip(i_rep.tolist(), j.tolist()):
                    ti = (int(ax[i]), int(ay[i]), int(bx[i]), int(by[i]))
                    tj = (int(ax[jj]), int(ay[jj]), int(bx[jj]), int(by[jj]))
                    pm, rnd = cross_pair(ti, tj, 2)
                    for which, x, y in pm:
                        t = ti if which == 0 else tj
                        rows.append((t[0], t[1], t[2], t[3], x, y, rnd, True))
            else:
                pid, which, mx, my, rnd = cross_pairs_batch(
                    ax[i_rep], ay[i_rep], bx[i_rep], by[i_rep],
                    ax[j], ay[j], bx[j], by[j], 2,
                )
                if len(pid):
                    si = np.where(which == 0, i_rep[pid], j[pid])
                    if packed:
                        # the packed along-segment chain key (see
                        # apply_marks_df): (px, py-toward-b) lex order
                        C = 1 << 30
                        ypos = by[si] >= ay[si]
                        k = (mx + C) * (1 << 31) + (np.where(ypos, my, -my) + C)
                        outs.append((sid[si], k, rnd, coll[pid]))
                    else:
                        outs.append(
                            (ax[si], ay[si], bx[si], by[si], mx, my, rnd, coll[pid])
                        )
    if packed:
        if not outs:
            return _MARKS_PACKED_ARROW_SCHEMA.empty_table()
        cols = [np.concatenate([np.asarray(o[k]) for o in outs]) for k in range(4)]
        return pa.Table.from_arrays(
            [
                pa.array(cols[0].astype(np.int64, copy=False)),
                pa.array(cols[1].astype(np.int64, copy=False)),
                pa.array(cols[2].astype(bool, copy=False)),
                pa.array(cols[3].astype(bool, copy=False)),
            ],
            schema=_MARKS_PACKED_ARROW_SCHEMA,
        )
    if rows:
        # wide-coordinate scalar rows -> numpy blocks appended to the outs list
        rc = list(zip(*rows))
        outs.append(
            tuple(np.asarray(rc[k], dtype=np.int64) for k in range(6))
            + (np.asarray(rc[6], dtype=bool), np.asarray(rc[7], dtype=bool))
        )
    if not outs:
        return _MARKS_ARROW_SCHEMA.empty_table()
    cols = [np.concatenate([np.asarray(o[k]) for o in outs]) for k in range(8)]
    return pa.Table.from_arrays(
        [
            pa.array(cols[0].astype(np.int64, copy=False)),
            pa.array(cols[1].astype(np.int64, copy=False)),
            pa.array(cols[2].astype(np.int64, copy=False)),
            pa.array(cols[3].astype(np.int64, copy=False)),
            pa.array(cols[4].astype(np.int64, copy=False)),
            pa.array(cols[5].astype(np.int64, copy=False)),
            pa.array(cols[6].astype(bool, copy=False)),
            pa.array(cols[7].astype(bool, copy=False)),
        ],
        schema=_MARKS_ARROW_SCHEMA,
    )


def _count_and_bounds(segs: DataFrame):
    """ONE scalar agg job: (n, x0, x1, y0, y1) — shared by cell sizing, cover and
    strip planning so each split round launches a single metadata action."""
    row = segs.agg(
        F.count("*").alias("n"),
        F.min(F.least("ax", "bx")).alias("x0"),
        F.max(F.greatest("ax", "bx")).alias("x1"),
        F.min(F.least("ay", "by")).alias("y0"),
        F.max(F.greatest("ay", "by")).alias("y1"),
    ).first()
    return (
        int(row["n"]),
        int(row["x0"] or 0),
        int(row["x1"] or 0),
        int(row["y0"] or 0),
        int(row["y1"] or 0),
    )


def salted_cover(
    segs: DataFrame,
    cells_per_axis: int,
    hot_threshold: int = 20000,
    bounds: tuple[int, int, int, int, int] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Grid cover with TARGETED hot-cell salting: every segment is exploded into
    the coarse cells its bbox covers; cells whose load exceeds hot_threshold are
    additionally split into a 4x4 fine sub-grid — but ONLY the segments covering
    a hot cell are re-exploded, and only within that cell. Cold cells keep a
    single (sx, sy) = (0, 0) salt, so exploded-row growth is proportional to the
    hot-cell share of the data, not global (north-rule skew handling).

    Correct because a crossing pair's intersection point p lies in both bboxes:
    if the coarse cell containing p is cold, the pair meets at that cell's
    (0, 0) salt; if hot, both bbox covers (clamped to the cell) include the fine
    sub-cell containing p.

    Returns (cover_df with group key (cx, cy, sx, sy), loads_df)."""
    if bounds is None:
        n, x0, x1, y0, y1 = _count_and_bounds(segs)
    else:
        n, x0, x1, y0, y1 = bounds
    extent = max(x1 - x0, y1 - y0, 1)
    cell = max(1, (extent + cells_per_axis - 1) // cells_per_axis)

    cx_seq = (
        f"sequence( (least(ax, bx) - {x0}) DIV {cell}, (greatest(ax, bx) - {x0}) DIV {cell} )"
    )
    cy_seq = (
        f"sequence( (least(ay, by) - {y0}) DIV {cell}, (greatest(ay, by) - {y0}) DIV {cell} )"
    )
    covered = (
        segs.withColumn("cx", F.explode(F.expr(cx_seq)))
        .withColumn("cy", F.explode(F.expr(cy_seq)))
    )
    loads = covered.groupBy("cx", "cy").count()
    if n <= hot_threshold:
        # no cell can exceed the threshold's order of magnitude — skip the
        # histogram shuffle + broadcast join entirely (latency on small rounds)
        return (
            covered.withColumn("sx", F.lit(0)).withColumn("sy", F.lit(0)),
            loads,
        )
    hot = (
        loads.where(F.col("count") > hot_threshold)
        .select("cx", "cy")
        .withColumn("_hot", F.lit(True))
    )
    cov = covered.join(F.broadcast(hot), ["cx", "cy"], "left")
    out_cols = [*covered.columns]
    cold = cov.where(F.col("_hot").isNull()).select(
        *out_cols, F.lit(0).alias("sx"), F.lit(0).alias("sy")
    )
    fsz = (cell + 3) // 4  # fine sub-cell size; 4x4 per hot cell
    sx_seq = (
        f"sequence( greatest(least(ax, bx) - {x0} - cx * {cell}, 0) DIV {fsz},"
        f" least(greatest(ax, bx) - {x0} - cx * {cell}, {cell - 1}) DIV {fsz} )"
    )
    sy_seq = (
        f"sequence( greatest(least(ay, by) - {y0} - cy * {cell}, 0) DIV {fsz},"
        f" least(greatest(ay, by) - {y0} - cy * {cell}, {cell - 1}) DIV {fsz} )"
    )
    hotc = (
        cov.where(F.col("_hot").isNotNull())
        .withColumn("sx", F.explode(F.expr(sx_seq)))
        .withColumn("sy", F.explode(F.expr(sy_seq)))
        .select(*out_cols, "sx", "sy")
    )
    return cold.unionByName(hotc), loads


def split_round(
    segs: DataFrame,
    cells_per_axis: int,
    hot_threshold: int = 20000,
    bounds: tuple[int, int, int, int, int] | None = None,
    dedup: bool = True,
    packed: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """One split round: returns (marks_df, stats). Hot cells are salted to a 4x4
    finer sub-grid via salted_cover (only hot-cell segments re-explode).

    dedup=False skips the dropDuplicates shuffle — apply_marks_df's collect_set
    dedupes per segment anyway, so the fixpoint passes False and saves one full
    shuffle of the mark set per round (duplicates exist only for pairs spanning
    cell borders, a thin sliver of the cover).

    packed=True requires `segs` to carry a stable `_sid` column and every
    coordinate under the 2^30 cap; marks come back as (_sid, k) — half the
    bytes of the coordinate-keyed schema (see _find_marks_kernel)."""
    cover, loads = salted_cover(segs, cells_per_axis, hot_threshold, bounds)
    # Explicit repartition on the GROUP KEY ahead of the grouped kernel:
    # HashPartitioning(keys, n) satisfies the groupBy's ClusteredDistribution,
    # so no second shuffle is added — but the user-specified partition count
    # is exempt from AQE byte-based coalescing, which otherwise squeezes the
    # (tiny-bytes, CPU-heavy) cover of a crossing-dense input into 1-2 tasks
    # and serializes the exact cross solver (measured: lines_net n=1024 split
    # kernel 2.6 s on 2 tasks with coalescing vs 64-way parallel without).
    n_part = int(segs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    cover = cover.repartition(n_part, "cx", "cy", "sx", "sy")
    marks = cover.groupBy("cx", "cy", "sx", "sy").applyInArrow(
        lambda tbl: _find_marks_kernel(tbl, packed=packed),
        schema=MARKS_PACKED_SCHEMA if packed else MARKS_SCHEMA,
    )
    if dedup:
        marks = marks.dropDuplicates(
            ["_sid", "k"] if packed else ["ax", "ay", "bx", "by", "px", "py"]
        )
    return marks, loads


def apply_marks_df(
    segs: DataFrame,
    marks: DataFrame,
    extra_aggs: dict[str, str] | None = None,
    skip_final_merge: bool = False,
    explode_partitions: int | None = None,
    packed: bool = False,
) -> DataFrame:
    """A8 as pure Column ops: group marks per segment, sort along the segment,
    explode the sub-segment chain, renormalize direction/counts, re-merge.

    Payload columns (extra_aggs keys) are duplicated onto every sub-segment — the
    reference's default split hook (iOverlay/src/core/edge_data.rs:5-19).

    skip_final_merge=True drops the closing coincident-merge groupBy (a full
    shuffle of the post-split set). Callers may set it ONLY when the round's
    marks contain no collinear-overlap pairs AND no snap-rounded marks:
    sub-segments lie on their parent's line, so coincidences require a
    collinear-overlap parent pair, and rounding can move points onto new
    coincidences (the fixpoint's next round handles those through its merge).

    explode_partitions: when chains are LONG (few segments carrying many marks
    each — the crossing-dense shape), the mark agg's output is only a few rows
    of fat arrays, AQE coalesces it to a handful of partitions, and the chain
    explode + every downstream map stage serialize on them (measured 17
    partitions for a 2.1 M-mark lines_net round). Callers that detect the
    long-chain regime pass the shuffle-partition count here to re-spread the
    joined rows BEFORE the explode (a cheap shuffle: one row per segment).

    packed=True (callers that KNOW |coords| < 2^30, the engine's int64-product
    cap): each mark packs into ONE BIGINT whose lexicographic order is exactly
    the along-segment order ((px, py-toward-b) — the CASE folds the direction
    sign into the key), so the agg collects primitive longs, array_sort
    compares longs (codegen, no struct comparators), and the chain unpacks
    with pure arithmetic after the explode. The wide-coordinate fallback keeps
    the struct formulation."""
    C = 1 << 30
    TC = 1 << 31
    sid_marks = packed and "_sid" in marks.columns
    if sid_marks:
        # kernel already emitted the packed chain key, keyed by the caller's
        # stable segment id: group + join on ONE long
        grouped = marks.groupBy("_sid").agg(F.collect_set("k").alias("mks"))
        j = segs.join(grouped, "_sid", "left").drop("_sid")
    elif packed:
        key = f"(px + {C}) * {TC} + (CASE WHEN by >= ay THEN py ELSE -py END + {C})"
        grouped = marks.groupBy("ax", "ay", "bx", "by").agg(
            F.expr(f"collect_set({key})").alias("mks")
        )
        j = segs.join(grouped, ["ax", "ay", "bx", "by"], "left")
    else:
        grouped = marks.groupBy("ax", "ay", "bx", "by").agg(
            F.collect_set(F.struct("px", "py")).alias("mks")
        )
        j = segs.join(grouped, ["ax", "ay", "bx", "by"], "left")
    if explode_partitions:
        j = j.repartition(explode_partitions)

    # sort key: x asc, then y toward b (sign of by-ay); marks equal to endpoints
    # drop via an O(n) filter — collect_set already guarantees uniqueness, and
    # the array_distinct this replaces is O(n^2) interpreted struct comparisons
    # (measured: a 2.1M-mark lines_net round spent ~60 s in it — ~1.1 billion
    # comparisons over 512-mark chains). The sort uses DEFAULT ordering
    # (packed: primitive longs; wide: a computed struct key field) — a
    # comparator lambda here would be interpreted per comparison (no codegen)
    # and dominates wall-clock when segments carry hundreds of marks.
    if packed:
        ka = f"((ax + {C}) * {TC} + (CASE WHEN by >= ay THEN ay ELSE -ay END + {C}))"
        kb = f"((bx + {C}) * {TC} + (CASE WHEN by >= ay THEN by ELSE -by END + {C}))"
        chain = f"""
          concat(
            array({ka}),
            array_sort(filter(coalesce(mks, array()),
                              k -> k != {ka} AND k != {kb})),
            array({kb})
          )
        """
        pair_struct = "(p, q) -> struct(p AS p, q AS q)"
    else:
        chain = """
          concat(
            array(struct(ax AS px, ay AS py)),
            transform(
              array_sort(
                transform(
                  filter(coalesce(mks, array()),
                         m -> NOT ((m.px = ax AND m.py = ay) OR (m.px = bx AND m.py = by))),
                  m -> struct(m.px AS px,
                              CASE WHEN by >= ay THEN m.py ELSE -m.py END AS k,
                              m.py AS py))
              ),
              s -> struct(s.px AS px, s.py AS py)
            ),
            array(struct(bx AS px, by AS py))
          )
        """
        pair_struct = "(p, q) -> struct(p.px AS px, p.py AS py, q.px AS qx, q.py AS qy)"
    # Pair CONSECUTIVE chain points MAP-SIDE: zip the chain with itself shifted
    # by one (two slices) — no window, so each split round drops a per-segment
    # shuffle+sort stage. Two Catalyst traps drive the exact shape of this
    # expression: (a) indexing chain[i] inside a transform re-inlines and
    # re-evaluates the whole sort/dedup chain PER ELEMENT ACCESS (measured 378 s
    # for 512 segments x 256 marks); (b) naive arrays_zip(slice(chain,..),
    # slice(chain,..)) inlines it 4x per row after projection collapse. Binding
    # the chain to a lambda variable via transform(array(<chain>), ch -> ...)
    # evaluates it exactly ONCE per row; inside the lambda `ch` is a variable
    # reference, not a re-inlined expression. Adjacent chain elements are
    # distinct by construction (unique mark set + endpoint filter), so no
    # p != q filter is needed.
    pairs = f"""
    flatten(transform(array({chain}), ch ->
      zip_with(slice(ch, 1, size(ch) - 1), slice(ch, 2, size(ch)),
               {pair_struct})))
    """
    if packed:
        paired = j.select(
            "subj",
            "clip",
            *[F.col(c) for c in (extra_aggs or {})],
            (F.col("by") >= F.col("ay")).alias("_ypos"),
            F.explode(F.expr(pairs)).alias("e"),
        )
        # arithmetic unpack (p >= 0, so % is already the floor remainder)
        pxs = F.expr(f"e.p DIV {TC} - {C}")
        pyt = F.expr(f"e.p % {TC} - {C}")
        qxs = F.expr(f"e.q DIV {TC} - {C}")
        qyt = F.expr(f"e.q % {TC} - {C}")
        pys = F.when(F.col("_ypos"), pyt).otherwise(-pyt)
        qys = F.when(F.col("_ypos"), qyt).otherwise(-qyt)
    else:
        paired = j.select(
            "subj",
            "clip",
            *[F.col(c) for c in (extra_aggs or {})],
            F.explode(F.expr(pairs)).alias("e"),
        )
        pxs, pys = F.col("e.px"), F.col("e.py")
        qxs, qys = F.col("e.qx"), F.col("e.qy")
    paired = paired.select(
        "subj",
        "clip",
        *[F.col(c) for c in (extra_aggs or {})],
        pxs.alias("_px"),
        pys.alias("_py"),
        qxs.alias("_qx"),
        qys.alias("_qy"),
    )
    fwd = F.expr("_px < _qx OR (_px = _qx AND _py < _qy)")
    out = paired.select(
        F.when(fwd, F.col("_px")).otherwise(F.col("_qx")).alias("ax"),
        F.when(fwd, F.col("_py")).otherwise(F.col("_qy")).alias("ay"),
        F.when(fwd, F.col("_qx")).otherwise(F.col("_px")).alias("bx"),
        F.when(fwd, F.col("_qy")).otherwise(F.col("_py")).alias("by"),
        F.when(fwd, F.col("subj")).otherwise(-F.col("subj")).alias("subj"),
        F.when(fwd, F.col("clip")).otherwise(-F.col("clip")).alias("clip"),
        *[F.col(c) for c in (extra_aggs or {})],
    )
    if skip_final_merge:
        return out
    return merge_segments_df(out, extra_aggs)


def split_segments_df(
    segs: DataFrame,
    target_per_cell: int = 2000,
    max_rounds: int = 16,
    checkpoint_dir: str | None = None,
    extra_aggs: dict[str, str] | None = None,
    pre_merged: bool = False,
    bounds: tuple[int, int, int, int, int] | None = None,
    checkpoint_last: bool = True,
) -> DataFrame:
    """A9 fixpoint: repeat split rounds until no marks (rounded intersections can
    move sub-segments onto new crossings). Each round localCheckpoints (or writes a
    durable checkpoint when checkpoint_dir is set). pre_merged=True skips the
    initial coincident-merge job when the caller already ran it; `bounds` (the
    _count_and_bounds tuple of the input) skips round 0's metadata job when the
    caller already measured it.

    checkpoint_last=False: the TERMINAL round's apply is returned LAZY (its
    inputs — the round's marks and the pre-round segments — are both
    checkpointed, so the lineage stays shallow). A single-consumer caller
    (the overlay pipeline: the fill stage's shuffle is the only action) then
    streams the chain explode straight into its shuffle write instead of
    materializing the post-split set twice. Multi-action callers keep the
    default.

    The terminal probe also records approx midpoint quantiles of the round's
    marks on the result (_ioverlay_strip_mx2_edges) — the fill stage reuses
    them as strip edges instead of running its own sampling job."""
    if not pre_merged:
        segs = merge_segments_df(segs, extra_aggs).localCheckpoint(eager=True)
        bounds = None  # caller bounds described the pre-merge set
    last_n = None
    n_hint = None  # upper bound on the output row count (fills sizing hint)
    spark_parts = int(segs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    from ..session import audit_desc

    mx2_range = None  # global doubled-x range (splitting never leaves the bbox)
    cmax_global = None
    for rnd in range(max_rounds):
        if bounds is None:
            audit_desc(segs.sparkSession, f"split:bounds r{rnd}")
            bounds = _count_and_bounds(segs)  # one scalar job: count + bbox
        if mx2_range is None:
            mx2_range = (2 * bounds[1], 2 * bounds[2])
            # global coordinate cap for downstream dtype narrowing: splitting
            # never leaves the input bbox and snap-rounded marks move <= 1
            cmax_global = (
                max(abs(bounds[1]), abs(bounds[2]), abs(bounds[3]), abs(bounds[4])) + 2
            )
        last_n = bounds[0]
        # parallelism floor: crossing-DENSE inputs (few long segments, many
        # intersections) would otherwise land in one cell and serialize the
        # exact solver; extra cover rows are cheap, idle cells cost nothing
        floor = 8 if bounds[0] >= 64 else 1
        cells_per_axis = max(floor, int((bounds[0] / max(target_per_cell, 1)) ** 0.5))
        # packed marks/chains need every coordinate (incl. snap-rounded marks,
        # which stay within the bbox ±1) under the 2^30 cap; _sid gives the
        # kernel a 1-long segment key (deterministic: segs is checkpointed)
        cmax_round = max(abs(bounds[1]), abs(bounds[2]), abs(bounds[3]), abs(bounds[4]))
        packed_round = cmax_round < (1 << 30) - 2
        segs_round = (
            segs.withColumn("_sid", F.monotonically_increasing_id())
            if packed_round
            else segs
        )
        marks, _ = split_round(
            segs_round, cells_per_axis, bounds=bounds, dedup=False, packed=packed_round
        )
        audit_desc(segs.sparkSession, f"split:kernel+ckpt r{rnd}")
        marks = marks.localCheckpoint(eager=True)
        # ONE probe job for emptiness + the two termination flags (was three
        # separate actions per round):
        #  - need_fix (scalar split.split_segments rule): marks that are ALL
        #    exact split segments at points exactly ON them, so no new
        #    crossings can appear — apply and stop without a verification
        #    round (for crossing-dense inputs that round is a full
        #    cover+kernel pass over the whole post-split set);
        #  - has_col: no collinear-overlap marks + no round marks means the
        #    apply cannot create coincident sub-segments, so the terminal
        #    round may skip its closing merge shuffle entirely.
        # 255 approx quantiles of the marks' x — reused by the fill stage as
        # strip edges (split points dominate the post-split midpoint
        # distribution in the crossing-dense regime; strip edges only steer
        # balance, ANY values are correct). 255, not 1023: querying the
        # quantile summary scales with the fraction count (1023 fractions
        # added ~1.9 s to the probe at 2 M marks, 255 adds ~0.3 s) and ~256
        # strips keep every strip kernel comfortably sized.
        fracs = ", ".join(str(i / 256) for i in range(1, 256))
        px_expr = f"k DIV {1 << 31} - {1 << 30}" if packed_round else "px"
        # quantiles over a ~5% row sample INSIDE the same agg (percentile_approx
        # skips NULLs): the summary insert per row was ~0.5 s at 2 M marks and
        # scales linearly — a sample steers load balance just as well (strip
        # edges carry no correctness weight). The sample predicate hashes the
        # mark itself (rand() is rejected inside aggregates and would not be
        # deterministic anyway).
        sample_cols = "k, _sid" if packed_round else "px, py, ax, ay"
        audit_desc(segs.sparkSession, f"split:probe r{rnd}")
        probe = marks.agg(
            F.count("*").alias("n"),
            F.max("is_round").alias("any_round"),
            F.max("col_ovl").alias("any_col"),
            F.expr(
                f"percentile_approx("
                f"IF(pmod(hash({sample_cols}), 20) = 0, {px_expr}, NULL),"
                f" array({fracs}), 100)"
            ).alias("pq"),
        ).first()
        if probe["n"] == 0:
            n_hint = last_n  # exact: nothing was applied this round
            break
        strip_edges = (
            sorted(set(2 * int(q) for q in probe["pq"])) if probe["pq"] else None
        )
        need_fix = bool(probe["any_round"])
        has_col = bool(probe["any_col"])
        n_marks = int(probe["n"])
        pre_count = bounds[0]
        # long-chain regime (see apply_marks_df): many marks over few segments
        # means the mark agg output is a few fat-array rows that AQE coalesces,
        # serializing the explode — re-spread it. When segments outnumber
        # chains the agg output is already wide; skip the extra shuffle.
        explode_parts = (
            spark_parts
            if n_marks >= 250_000 and bounds[0] <= n_marks // 4
            else None
        )
        segs = apply_marks_df(
            segs_round,
            marks,
            extra_aggs,
            skip_final_merge=not need_fix and not has_col,
            explode_partitions=explode_parts,
            packed=packed_round,
        )
        terminal = not need_fix
        if checkpoint_dir is not None:
            path = f"{checkpoint_dir}/split_r{rnd}"
            segs.write.mode("overwrite").parquet(path)
            segs = segs.sparkSession.read.parquet(path)
        elif not (terminal and not checkpoint_last):
            audit_desc(segs.sparkSession, f"split:apply+ckpt r{rnd}")
            segs = segs.localCheckpoint(eager=True)
        last_n = None  # marks were applied after the count; stale
        bounds = None
        if terminal:
            # terminal round: each mark row adds at most one sub-segment to one
            # parent, so pre-count + mark rows bounds the output — close enough
            # for the fills stage's strip sizing without a count job
            n_hint = pre_count + n_marks
            segs._ioverlay_strip_mx2_edges = strip_edges
            if (
                not checkpoint_last
                and checkpoint_dir is None
                and packed_round
                and not has_col
                and not extra_aggs
            ):
                # fill-stage fusion inputs (compute_fills_df): both are
                # checkpointed, so the fused apply+pack plan stays shallow
                segs._ioverlay_apply_inputs = (segs_round, marks)
            break
    if n_hint is None:
        n_hint = last_n
    segs._ioverlay_n_segments = n_hint  # fills sizing hint (skips a count job)
    segs._ioverlay_mx2_range = mx2_range  # strip-rank outer bucket bounds
    if cmax_global is not None:
        segs._ioverlay_cmax = cmax_global  # bbox cap for dtype narrowing
    return segs


# ---------------------------------------------------------------------------------
# distributed fill (A10): x-strip ray-cast


FILL_SCHEMA = StructType(
    [
        StructField("ax", LongType()),
        StructField("ay", LongType()),
        StructField("bx", LongType()),
        StructField("by", LongType()),
        StructField("subj", LongType()),
        StructField("clip", LongType()),
        StructField("fill", IntegerType()),
    ]
)


_FILL_ARROW_SCHEMA = pa.schema(
    [
        ("ax", pa.int64()),
        ("ay", pa.int64()),
        ("bx", pa.int64()),
        ("by", pa.int64()),
        ("subj", pa.int64()),
        ("clip", pa.int64()),
        ("fill", pa.int32()),
    ]
)

# boundary-filtered fill output: extraction reads only coordinates + fill
# bits, so the pushed-down-boundary path drops subj/clip from the kernel's
# Arrow emit, the checkpoint and every downstream shuffle (2/7 of the bytes)
FILL_BOUNDARY_SCHEMA = StructType(
    [
        StructField("ax", LongType()),
        StructField("ay", LongType()),
        StructField("bx", LongType()),
        StructField("by", LongType()),
        StructField("fill", IntegerType()),
    ]
)

_FILL_BOUNDARY_ARROW_SCHEMA = pa.schema(
    [
        ("ax", pa.int64()),
        ("ay", pa.int64()),
        ("bx", pa.int64()),
        ("by", pa.int64()),
        ("fill", pa.int32()),
    ]
)


def _fill_strips_sorted(
    ax, ay, bx, by, subj, clip, is_home, s, fill_rule, boundary_rule,
    boundary_blob=False,
):
    """Shared strip-fill core: arrays already sorted by strip id `s`; runs the
    windowed fill per contiguous strip slice and yields the output batches
    (boundary-filtered when boundary_rule is set). Used by both the row-explode
    (_strip_fill_iter) and the packed-chain (_packed_fill_iter) shuffles.

    boundary_blob=True (requires boundary_rule): instead of per-segment rows,
    emit ONE BOUNDARY_BLOB_SCHEMA row for the whole partition — the kernel
    already holds the boundary set as numpy arrays, so packing here costs one
    concatenate+tobytes and NO extra Arrow crossing (unlike the retired
    post-checkpoint pack stage, BENCH.md round-5 closing #2). The downstream
    64->1 exchange into the fused extract then moves ~n_partitions blob rows
    instead of millions of segment rows, and the boundary checkpoint stores
    binary blobs instead of per-row UnsafeRows."""
    from ..kernel.extract import boundary_mask
    from ..kernel.fill import compute_fills_windowed
    from ..kernel.segments import Segments

    starts = np.flatnonzero(np.concatenate([[True], s[1:] != s[:-1]]))
    bounds = np.append(starts, len(s))
    outs = []
    for i in range(len(starts)):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        home = is_home[lo:hi]
        if not home.any():
            continue
        segs = Segments(
            ax[lo:hi], ay[lo:hi], bx[lo:hi], by[lo:hi], subj[lo:hi], clip[lo:hi]
        )
        # threads=1: this kernel already runs on every executor thread in
        # parallel (one partition per strip group) — nested pools would
        # oversubscribe the box
        fills = compute_fills_windowed(segs, fill_rule, allow_sweep=False, threads=1)
        mask = home
        if boundary_rule is not None:
            mask = mask & boundary_mask(fills.astype(np.uint8), boundary_rule)
            outs.append(
                (
                    ax[lo:hi][mask], ay[lo:hi][mask],
                    bx[lo:hi][mask], by[lo:hi][mask],
                    fills[mask].astype(np.uint8 if boundary_blob else np.int32),
                )
            )
        else:
            outs.append(
                (
                    ax[lo:hi][mask], ay[lo:hi][mask],
                    bx[lo:hi][mask], by[lo:hi][mask],
                    subj[lo:hi][mask], clip[lo:hi][mask],
                    fills[mask].astype(np.int32),
                )
            )
    if not outs:
        return
    if boundary_blob:
        AX, AY, BX, BY, FL = (
            np.concatenate([o[k] for o in outs]) for k in range(5)
        )
        cmax = max(int(np.abs(c).max(initial=0)) for c in (AX, AY, BX, BY))
        cdt = np.int32 if cmax < 2**31 else np.int64
        blob = (
            b"".join(c.astype(cdt, copy=False).tobytes() for c in (AX, AY, BX, BY))
            + FL.tobytes()
        )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([len(AX)], type=pa.int64()),
                pa.array([cdt().itemsize], type=pa.int32()),
                pa.array([cmax], type=pa.int64()),
                pa.array([blob], type=pa.binary()),
            ],
            names=["cnt", "wc", "cmax", "xyf"],
        )
        return
    schema = (
        _FILL_BOUNDARY_ARROW_SCHEMA if boundary_rule is not None else _FILL_ARROW_SCHEMA
    )
    cols = [np.concatenate([o[k] for o in outs]) for k in range(len(outs[0]))]
    yield from pa.Table.from_arrays([pa.array(c) for c in cols], schema=schema).to_batches()


# boundary-blob fill output (compute_fills_df boundary_blob=True): ONE row per
# fill reduce partition holding the partition's whole boundary set as a raw
# buffer — ax|ay|bx|by (cnt each, wc-byte words) then fill (cnt uint8). cnt and
# cmax ride as columns so extract's metadata job is a trivial sum/max over
# ~n_partitions rows instead of a scan of millions.
BOUNDARY_BLOB_SCHEMA = StructType(
    [
        StructField("cnt", LongType()),
        StructField("wc", IntegerType()),  # coord word size: 4 or 8
        StructField("cmax", LongType()),
        StructField("xyf", BinaryType()),
    ]
)


# packed strip-chain shuffle rows: one row per (upstream partition, strip)
# holding the strip's segment arrays as raw little-endian buffers — the
# shuffle then moves thousands of blob rows instead of millions of segment
# rows (same payload bytes, none of the per-row serialization)
PACKED_STRIP_SCHEMA = StructType(
    [
        StructField("strip", IntegerType()),
        StructField("cnt", LongType()),
        StructField("wc", IntegerType()),  # coord word size: 4 or 8
        StructField("ww", IntegerType()),  # winding word size: 4 or 8
        StructField("xy", BinaryType()),  # ax|ay|bx|by, cnt each
        StructField("sc", BinaryType()),  # subj|clip, cnt each
        StructField("hm", BinaryType()),  # is_home, cnt uint8
    ]
)


def _pack_strips_iter(edges):
    """Map-side pack stage (mapInArrow): compute each segment's strip span
    (np.searchsorted against the driver's quantile edges — same count-of-
    edges<=v semantics as _strip_rank_expr), explode via np.repeat, sort by
    strip ONCE, and emit one binary-blob row per strip present in the
    partition. Coord/winding words narrow to int32 per partition when the
    actual values fit (the reader re-widens; fill math is unchanged)."""
    E = np.asarray(edges, dtype=np.int64)

    def it(batches):
        chunks = list(batches)
        if not chunks:
            return
        tbl = pa.Table.from_batches(chunks)
        if not len(tbl):
            return

        def col(name):
            return tbl.column(name).to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False
            )

        yield from _pack_arrays(
            col("ax"), col("ay"), col("bx"), col("by"),
            col("subj"), col("clip"), E,
        )

    return it


def _apply_pack_strips_iter(edges):
    """FUSED terminal apply + strip pack (mapInArrow): input rows are the
    pre-split segments LEFT-JOINED with their grouped packed mark keys
    (`mks: array<bigint>`, the collect_set of apply_marks_df's packed chain
    key). The chain sort, endpoint filter, explode and direction/count
    renormalization all run in numpy via the scalar `_apply_marks` kernel
    (kernel/split.py — the differential-tested vectorized apply), replacing
    apply_marks_df's JVM array_sort + zip_with + Generate pipeline, which was
    the dominant cost of the terminal fill job on crossing-dense inputs
    (lines_net n=1024: the fused apply+fill job spent ~10 of its 13 s in the
    chain machinery while the python pack+fill kernels cost ~5 s of CPU
    TOTAL — audits, round 5 closing). The packed key decodes exactly as
    apply_marks_df does: px = k DIV 2^31 - 2^30, py' = k % 2^31 - 2^30,
    py = py' when by >= ay else -py'."""
    import pyarrow.compute as pc

    E = np.asarray(edges, dtype=np.int64)
    TC = 1 << 31
    C = 1 << 30

    def it(batches):
        from ..kernel.segments import Segments
        from ..kernel.split import _apply_marks

        chunks = list(batches)
        if not chunks:
            return
        tbl = pa.Table.from_batches(chunks)
        if not len(tbl):
            return

        def col(name):
            return tbl.column(name).to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False
            )

        ax, ay, bx, by = col("ax"), col("ay"), col("bx"), col("by")
        subj, clip = col("subj"), col("clip")
        mks = tbl.column("mks")
        lens = pc.fill_null(pc.list_value_length(mks), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64, copy=False)
        segs = Segments(ax, ay, bx, by, subj, clip)
        if int(lens.sum()) > 0:
            k = pc.list_flatten(mks).to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False
            )
            mi = np.repeat(np.arange(len(ax), dtype=np.int64), lens)
            px = k // TC - C
            pyt = k % TC - C
            py = np.where(by[mi] >= ay[mi], pyt, -pyt)
            segs = _apply_marks(segs, (mi, px, py))
        yield from _pack_arrays(
            segs.ax, segs.ay, segs.bx, segs.by, segs.subj, segs.clip, E
        )

    return it


def _pack_arrays(ax, ay, bx, by, subj, clip, E):
    """Shared pack core: strip spans + explode + per-strip blob rows (see
    _pack_strips_iter). Yields one PACKED_STRIP_SCHEMA RecordBatch."""
    s_lo = np.searchsorted(E, 2 * ax, side="right")
    s_hi = np.searchsorted(E, 2 * bx, side="right")
    s_mid = np.searchsorted(E, ax + bx, side="right")
    copies = s_hi - s_lo + 1
    total = int(copies.sum())
    rep = np.repeat(np.arange(len(ax), dtype=np.int64), copies)
    starts = np.zeros(len(ax), dtype=np.int64)
    np.cumsum(copies[:-1], out=starts[1:])
    strip = s_lo[rep] + (np.arange(total, dtype=np.int64) - starts[rep])
    home = strip == s_mid[rep]
    order = np.argsort(strip, kind="stable")
    rep = rep[order]
    strip_s = strip[order]
    home = home[order]
    # per-partition narrowing by the ACTUAL values (no global gate needed)
    cmax = max(
        int(np.abs(a).max(initial=0)) for a in (ax, ay, bx, by)
    ) if len(ax) else 0
    wmax = max(
        int(np.abs(subj).max(initial=0)), int(np.abs(clip).max(initial=0))
    ) if len(ax) else 0
    cdt = np.int32 if cmax < 2**31 else np.int64
    wdt = np.int32 if wmax < 2**31 else np.int64
    AX = ax[rep].astype(cdt, copy=False)
    AY = ay[rep].astype(cdt, copy=False)
    BX = bx[rep].astype(cdt, copy=False)
    BY = by[rep].astype(cdt, copy=False)
    SU = subj[rep].astype(wdt, copy=False)
    CL = clip[rep].astype(wdt, copy=False)
    HM = home.astype(np.uint8)
    sb = np.flatnonzero(np.concatenate([[True], strip_s[1:] != strip_s[:-1]]))
    se = np.append(sb, total)
    r_strip, r_cnt, r_xy, r_sc, r_hm = [], [], [], [], []
    for i in range(len(sb)):
        lo, hi = int(se[i]), int(se[i + 1])
        r_strip.append(int(strip_s[lo]))
        r_cnt.append(hi - lo)
        r_xy.append(
            np.concatenate([AX[lo:hi], AY[lo:hi], BX[lo:hi], BY[lo:hi]]).tobytes()
        )
        r_sc.append(np.concatenate([SU[lo:hi], CL[lo:hi]]).tobytes())
        r_hm.append(HM[lo:hi].tobytes())
    k = len(r_strip)
    yield pa.RecordBatch.from_arrays(
        [
            pa.array(np.asarray(r_strip, dtype=np.int32)),
            pa.array(np.asarray(r_cnt, dtype=np.int64)),
            pa.array(np.full(k, cdt().itemsize, dtype=np.int32)),
            pa.array(np.full(k, wdt().itemsize, dtype=np.int32)),
            pa.array(r_xy, type=pa.binary()),
            pa.array(r_sc, type=pa.binary()),
            pa.array(r_hm, type=pa.binary()),
        ],
        names=["strip", "cnt", "wc", "ww", "xy", "sc", "hm"],
    )



def _packed_fill_iter(
    fill_rule: FillRule,
    boundary_rule: OverlayRule | None = None,
    boundary_blob: bool = False,
):
    """Reduce-side unpack + fill (mapInArrow over PACKED_STRIP_SCHEMA rows):
    parse each blob row back to arrays (np.frombuffer memcpy), concatenate the
    rows of each strip in strip order, and run the shared strip-fill core."""

    def it(batches):
        chunks = list(batches)
        if not chunks:
            return
        tbl = pa.Table.from_batches(chunks).combine_chunks()
        if not len(tbl):
            return
        strips = tbl.column("strip").to_numpy(zero_copy_only=False).astype(np.int64)
        cnts = tbl.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        wcs = tbl.column("wc").to_numpy(zero_copy_only=False)
        wws = tbl.column("ww").to_numpy(zero_copy_only=False)
        xyc = tbl.column("xy")
        scc = tbl.column("sc")
        hmc = tbl.column("hm")
        order = np.argsort(strips, kind="stable")
        p_ax, p_ay, p_bx, p_by, p_su, p_cl, p_hm, p_s = (
            [], [], [], [], [], [], [], []
        )
        for r in order.tolist():
            n = int(cnts[r])
            cdt = np.int32 if int(wcs[r]) == 4 else np.int64
            wdt = np.int32 if int(wws[r]) == 4 else np.int64
            xy = np.frombuffer(xyc[r].as_py(), dtype=cdt).astype(np.int64, copy=False)
            sc = np.frombuffer(scc[r].as_py(), dtype=wdt).astype(np.int64, copy=False)
            p_ax.append(xy[:n])
            p_ay.append(xy[n : 2 * n])
            p_bx.append(xy[2 * n : 3 * n])
            p_by.append(xy[3 * n :])
            p_su.append(sc[:n])
            p_cl.append(sc[n:])
            p_hm.append(np.frombuffer(hmc[r].as_py(), dtype=np.uint8))
            p_s.append(np.full(n, strips[r], dtype=np.int64))
        yield from _fill_strips_sorted(
            np.concatenate(p_ax), np.concatenate(p_ay),
            np.concatenate(p_bx), np.concatenate(p_by),
            np.concatenate(p_su), np.concatenate(p_cl),
            np.concatenate(p_hm).astype(bool),
            np.concatenate(p_s),
            fill_rule, boundary_rule, boundary_blob,
        )

    return it


def _strip_fill_iter(
    fill_rule: FillRule,
    boundary_rule: OverlayRule | None = None,
    boundary_blob: bool = False,
):
    """Partition-level strip fill (mapInArrow): the partition holds whole
    strips (repartition on the strip key); the python side sorts by strip ONCE
    (numpy, vectorized) and runs the windowed fill kernel per contiguous strip
    slice. Replaces a grouped-map applyInPandas — the grouped-map plan sorts
    every partition JVM-side and pays per-group Arrow overhead; here the rows
    cross into python once per PARTITION.

    Per strip: windings of home segments against ALL segments crossing the
    strip (compute fills on the union, keep rows for home segments only).
    allow_sweep=False — a strip group is a SUBSET of the global segment set,
    and only the ray-at-midpoint fill formulations are subset-safe.

    boundary_rule: extraction's boundary filter pushed into the kernel — the
    stage ships only result-boundary rows (extract takes pre_filtered=True)."""

    def it(batches):
        chunks = list(batches)
        if not chunks:
            return
        tbl = pa.Table.from_batches(chunks)
        if not len(tbl):
            return

        def col(name, dtype=np.int64):
            return tbl.column(name).to_numpy(zero_copy_only=False).astype(
                dtype, copy=False
            )

        strip = col("strip", np.int64)
        order = np.argsort(strip, kind="stable")
        yield from _fill_strips_sorted(
            col("ax")[order], col("ay")[order], col("bx")[order], col("by")[order],
            col("subj")[order], col("clip")[order], col("is_home", bool)[order],
            strip[order], fill_rule, boundary_rule, boundary_blob,
        )

    return it


def _bsearch_rank_expr(vexpr: str, edges: list[int]) -> str:
    """SQL for `np.searchsorted(edges, vexpr, side="right")`: a balanced
    nested-IF tree returning the count of edges <= value. log2(len(edges))
    comparisons per row, fully codegen-able — no python in the plan.

    Keep the tree SMALL (<= ~15 edges): the generated Java contains every
    branch, and past ~60 IF nodes the method exceeds HotSpot's huge-method
    JIT limit — the expression then runs in the bytecode interpreter
    (measured 15x: 0.33 s vs 4.7/5.3 s for 15/63/255 edges over 16.8 M rows).
    Larger strip counts go through _strip_rank_expr's two-level scheme."""

    def gen(lo: int, hi: int) -> str:
        if lo == hi:
            return str(lo)
        mid = (lo + hi) // 2
        return (
            f"(IF(({vexpr}) < {int(edges[mid])}L, "
            f"{gen(lo, mid)}, {gen(mid + 1, hi)}))"
        )

    return gen(0, len(edges))


def _strip_rank_expr(vexpr: str, edges: list[int], lo2: int, hi2: int) -> str:
    """Strip index for large strip counts: a JIT-sized coarse quantile rank
    (<= 15-edge IF tree) times a uniform arithmetic subdivision of the coarse
    bucket's value range. Strip edges only steer LOAD BALANCE — fill values
    are exact for any monotone bucketization (each segment is still evaluated
    against everything crossing its home strip) — so snapping the fine level
    to uniform-within-bucket trades nothing but balance granularity, and the
    coarse level still absorbs global skew. Monotone in vexpr (coarse rank is
    monotone; the fine term is clamped to its bucket), so s_lo <= s_mid <=
    s_hi holds and sequence(s_lo, s_hi) always covers the home strip.
    lo2/hi2: global doubled-x data range (outermost bucket bounds). All fine
    arithmetic runs in DOUBLE: the int64 difference could overflow at the
    +-2^62 coordinate extremes, and balance needs no exactness."""
    if len(edges) <= 15:
        return _bsearch_rank_expr(vexpr, edges)
    k = -(-(len(edges) + 1) // 16)  # fine subdivisions per coarse bucket
    coarse = edges[k - 1 :: k][:15]
    lows = [lo2] + coarse
    highs = coarse + [hi2]
    lo_arr = "array(" + ", ".join(f"{int(v)}L" for v in lows) + ")"
    hi_arr = "array(" + ", ".join(f"{int(v)}L" for v in highs) + ")"
    c = _bsearch_rank_expr(vexpr, coarse)
    return (
        f"(({c}) * {k} + least({k - 1}, greatest(0, CAST(floor("
        f"(CAST({vexpr} AS DOUBLE) - CAST(element_at({lo_arr}, ({c}) + 1) AS DOUBLE))"
        f" * {k} / greatest(1.0D,"
        f" CAST(element_at({hi_arr}, ({c}) + 1) AS DOUBLE)"
        f" - CAST(element_at({lo_arr}, ({c}) + 1) AS DOUBLE))"
        f") AS INT))))"
    )


def compute_fills_df(
    segs: DataFrame,
    fill_rule: FillRule = FillRule.EVEN_ODD,
    n_strips: int | None = None,
    boundary_rule: OverlayRule | None = None,
    boundary_blob: bool = False,
) -> DataFrame:
    """Distributed winding classification: strip-partition the x-axis on midpoint
    quantiles; every segment is exploded into each strip it crosses and evaluated
    (ray-cast at its own midpoint) in its home strip only.

    Correct because: the downward ray at the segment's midpoint x* only crosses
    segments whose x-span contains x*, and every such segment also crosses the home
    strip, hence is present in the group.

    boundary_rule: when the caller extracts ONE overlay rule next, the
    extraction's boundary filter is pushed into the fill kernel — the stage
    emits only result-boundary segments (extract_shapes_df then takes
    pre_filtered=True).

    boundary_blob: emit BOUNDARY_BLOB_SCHEMA rows (one per reduce partition)
    instead of per-segment rows — the fill kernel packs its boundary output
    in-kernel, so the extract checkpoint + 64->1 fused exchange carry blob
    rows (extract_shapes_df must be told packed_boundary=True)."""
    if boundary_blob and boundary_rule is None:
        raise ValueError("boundary_blob requires boundary_rule")
    spark = segs.sparkSession
    n = getattr(segs, "_ioverlay_n_segments", None)
    if n is None and n_strips is None:
        n = segs.count()
    if n_strips is None:
        # strip kernels are O(n_strip * m_strip): finer strips cut the quadratic
        # term; per-strip constants are negligible beyond ~2k segments
        n_strips = max(1, min(1024, n // 2000))
    hint_edges = getattr(segs, "_ioverlay_strip_mx2_edges", None)
    mx2_range = getattr(segs, "_ioverlay_mx2_range", None)
    cmax_cap = getattr(segs, "_ioverlay_cmax", None)
    if n_strips > 1 and hint_edges:
        # edges precomputed by the split fixpoint's probe (mark-x quantiles,
        # doubled) — zero extra jobs; downsample evenly to the strip budget
        k = len(hint_edges)
        if k > n_strips - 1:
            idx = np.linspace(0, k - 1, n_strips - 1).round().astype(int)
            edges = sorted(set(hint_edges[int(i)] for i in idx))
        else:
            edges = list(hint_edges)
    elif n_strips > 1:
        # strip edges from SAMPLED midpoint quantiles (doubled-coordinate
        # midpoints). Strip edges only steer load balance — fill values are
        # exact for ANY strip boundaries (each segment is still evaluated
        # against everything crossing its home strip) — so a bounded random
        # sample replaces the full-scan approxQuantile: one cheap job whose
        # cost is independent of the segment count (the full scan was a
        # second full pass over the post-split set).
        mids = segs.select(((F.col("ax") + F.col("bx"))).alias("mx2"))
        # unknown n (explicit n_strips, no hint): sample nothing away — small
        # callers pass explicit strip counts on small data
        frac = min(1.0, 400_000 / max(n, 1)) if n is not None else 1.0
        if frac < 1.0:
            mids = mids.sample(fraction=frac, seed=7)
        vals = mids.toPandas()["mx2"].to_numpy(np.int64)
        if len(vals):
            qs = np.quantile(
                vals, [i / n_strips for i in range(1, n_strips)], method="lower"
            )
            edges = sorted(set(int(q) for q in qs))
            mx2_range = (int(vals.min()), int(vals.max()))
        else:
            edges = []
    else:
        edges = []

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    packed = (
        bool(edges)
        and os.environ.get("SPARK_GRAFT_FILL_PACKED", "1") != "0"
    )
    apply_inputs = getattr(segs, "_ioverlay_apply_inputs", None)
    if (
        packed
        and apply_inputs is not None
        and os.environ.get("SPARK_GRAFT_APPLY_FUSED", "1") != "0"
    ):
        # FUSED terminal apply + pack (see _apply_pack_strips_iter): join the
        # grouped packed mark keys onto the pre-round segments and run the
        # chain explode in numpy inside the pack stage, skipping the JVM
        # array_sort/zip_with/Generate pipeline entirely. The explicit
        # repartition spreads the fat mks-array rows before the python stage
        # (AQE would coalesce the join output by BYTES and serialize it).
        segs_round, marks = apply_inputs
        grouped = marks.groupBy("_sid").agg(F.collect_set("k").alias("mks"))
        j = (
            segs_round.join(grouped, "_sid", "left")
            .drop("_sid")
            .repartition(n_part)
        )
        return (
            j.mapInArrow(_apply_pack_strips_iter(edges), schema=PACKED_STRIP_SCHEMA)
            .repartition(n_part, "strip")
            .mapInArrow(
                _packed_fill_iter(fill_rule, boundary_rule, boundary_blob),
                schema=BOUNDARY_BLOB_SCHEMA
                if boundary_blob
                else (
                    FILL_BOUNDARY_SCHEMA if boundary_rule is not None else FILL_SCHEMA
                ),
            )
        )
    if packed:
        # PACKED strip-chain shuffle (VERDICT r04 #4): the strip span, the
        # explode, and the is_home flag all move python-side into one
        # mapInArrow pack stage that emits a single binary-blob row per
        # (upstream partition, strip) — the strip hash shuffle then carries
        # thousands of blob rows instead of millions of segment rows (same
        # payload bytes, none of the per-row serialization, no codegen
        # bsearch over every exploded row). The reduce side parses the blobs
        # (np.frombuffer memcpy) and runs the same strip-fill core.
        return (
            segs.select("ax", "ay", "bx", "by", "subj", "clip")
            .mapInArrow(_pack_strips_iter(edges), schema=PACKED_STRIP_SCHEMA)
            .repartition(n_part, "strip")
            .mapInArrow(
                _packed_fill_iter(fill_rule, boundary_rule, boundary_blob),
                schema=BOUNDARY_BLOB_SCHEMA
                if boundary_blob
                else (
                    FILL_BOUNDARY_SCHEMA if boundary_rule is not None else FILL_SCHEMA
                ),
            )
        )
    if edges:
        # strip index of a doubled-x value: a pure Column expression inside
        # whole-stage codegen. This replaces, in order of history: an
        # interpreted `size(filter(...))` HOF (O(n_strips) per row, VERDICT
        # r02 Wrong #4), then an Arrow pandas_udf — correct but it broke the
        # stage's codegen pipeline with a JVM->python->JVM round trip for
        # every post-split row — then a single 255-edge nested-IF tree, whose
        # generated method exceeded HotSpot's JIT size limit and ran
        # INTERPRETED (~85 s of CPU per 16.8 M rows; the two-level scheme in
        # _strip_rank_expr is ~10x). The outer bucket bounds come from the
        # split fixpoint's bbox (or the sample's min/max); a missing range
        # falls back to the edge span, which only costs balance at the tails.
        if mx2_range is None:
            span = max(1, int(edges[-1]) - int(edges[0]))
            mx2_range = (int(edges[0]) - span, int(edges[-1]) + span)
        segs = segs.select(
            "*",
            F.expr(_strip_rank_expr("2 * ax", edges, *mx2_range)).cast("int").alias("s_lo"),
            F.expr(_strip_rank_expr("2 * bx", edges, *mx2_range)).cast("int").alias("s_hi"),
            F.expr(_strip_rank_expr("ax + bx", edges, *mx2_range)).cast("int").alias("s_mid"),
        )
    else:
        segs = (
            segs.withColumn("s_lo", F.lit(0))
            .withColumn("s_hi", F.lit(0))
            .withColumn("s_mid", F.lit(0))
        )
    # narrow the strip shuffle when the known bbox allows: coordinates to
    # int32 (gated on the split fixpoint's full x+y coordinate cap — NOT
    # mx2_range, which bounds only x) and winding counts to int32 (|subj| of a
    # merged row is bounded by the number of coincident inputs, hence by the
    # segment count — the gate requires that count to be known and < 2^31).
    # The strip kernel's column intake upcasts back to int64, so fill math is
    # unchanged; this halves the stage's shuffle write/read + Arrow bytes
    # (the n=1024 lines_net fill map stage ships ~100 MB).
    if (
        cmax_cap is not None
        and int(cmax_cap) < (1 << 31) - 1
        and n is not None
        and int(n) < (1 << 31) - 1
    ):
        out_cols = [
            F.col("ax").cast("int").alias("ax"),
            F.col("ay").cast("int").alias("ay"),
            F.col("bx").cast("int").alias("bx"),
            F.col("by").cast("int").alias("by"),
            F.col("subj").cast("int").alias("subj"),
            F.col("clip").cast("int").alias("clip"),
            F.col("strip").cast("int").alias("strip"),
            F.col("is_home"),
        ]
    else:
        out_cols = ["ax", "ay", "bx", "by", "subj", "clip", "strip", "is_home"]
    with_strips = (
        segs.withColumn("strip", F.explode(F.expr("sequence(s_lo, s_hi)")))
        .withColumn("is_home", F.col("strip") == F.col("s_mid"))
        .select(*out_cols)
    )
    return (
        # ONE hash shuffle on the strip key; strips are grouped python-side
        # inside the partition (see _strip_fill_iter)
        with_strips.repartition(n_part, "strip")
        .mapInArrow(
            _strip_fill_iter(fill_rule, boundary_rule, boundary_blob),
            schema=BOUNDARY_BLOB_SCHEMA
            if boundary_blob
            else (FILL_BOUNDARY_SCHEMA if boundary_rule is not None else FILL_SCHEMA),
        )
    )


def _local_overlay_kernel(rule: OverlayRule, fill_rule: FillRule, options: OverlayOptions):
    """One-task exact kernel over a merged segment set: split fixpoint + fill +
    extract + hole binding, all in numpy/python — the List-solver analog.

    Uses the BATCHED split/fill machinery (vectorized candidate prefilter; exact
    python-int cross solver only on interacting pairs — bit-identical to the
    scalar kernel, differential-tested) treating the whole job as one tile;
    falls back to the scalar python-int path when coordinates exceed the
    int64-safe range."""
    from ..kernel.batch import _COORD_CAP, _fills_batch, _split_batch
    from ..kernel.extract import extract_shapes
    from ..kernel.fill import compute_fills_windowed as kernel_fills
    from ..kernel.segments import Segments
    from ..kernel.split import split_segments as kernel_split

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        segs = Segments(
            pdf["ax"].to_numpy(np.int64),
            pdf["ay"].to_numpy(np.int64),
            pdf["bx"].to_numpy(np.int64),
            pdf["by"].to_numpy(np.int64),
            pdf["subj"].to_numpy(np.int64),
            pdf["clip"].to_numpy(np.int64),
        )
        coords = [segs.ax, segs.ay, segs.bx, segs.by]
        cmax = max((int(np.abs(c).max()) for c in coords if len(c)), default=0)
        if cmax < _COORD_CAP:
            segs = _split_batch(segs)  # vectorized prefilter + exact solver
        else:
            segs = kernel_split(segs)  # python-int path for huge coordinates
        # fill: the x-windowed midpoint ray-cast (O(n * local density) — exact,
        # differential-tested against the dense kernel)
        fills = kernel_fills(segs, fill_rule)
        shapes, areas = extract_shapes(segs, fills, rule, options, with_areas=True)
        rows = []
        rid = 0
        for si, (shape, s_areas) in enumerate(zip(shapes, areas)):
            for ri, (ring, a2) in enumerate(zip(shape, s_areas)):
                rows.append(
                    (
                        si,
                        rid,
                        ri > 0,
                        [int(p[0]) for p in ring],
                        [int(p[1]) for p in ring],
                        a2,
                    )
                )
                rid += 1
        return pd.DataFrame(
            rows, columns=["shape_id", "ring_id", "is_hole", "pts_x", "pts_y", "area2"]
        )

    return run


def distributed_overlay(
    segs: DataFrame,
    rule: OverlayRule,
    fill_rule: FillRule = FillRule.EVEN_ODD,
    options: OverlayOptions | None = None,
    checkpoint_dir: str | None = None,
    small_threshold: int = 100_000,
    pair_threshold: int = 40_000,
    force_distributed: bool = False,
) -> DataFrame:
    """End-to-end distributed boolean overlay of ONE huge job.

    Strategy dispatch (reference Solver::is_list_split / is_fragmentation_required,
    iOverlay/src/core/solver.rs:141-189, applied at pipeline level): the
    distributed MERGE always runs (it is the stage that shrinks the data — e.g. a
    contiguous checkerboard's interior edges cancel), then TWO criteria pick the
    plan: the post-merge segment count AND an estimated candidate-pair bound
    (sum of c·(c−1)/2 over a 32×32 grid-cover histogram). The pair bound matters
    because post-merge size says nothing about post-SPLIT size — a lines-net of
    2n long strips is only 8n segments but explodes into n² crossings, which
    would OOM a single task at scale. Both small → one applyInPandas task runs
    the exact kernel (split + fill + extract + hole binding) in one job; either
    large (or force_distributed) → the fully distributed fixpoint / x-strip fill
    / component extraction pipeline. Differential tests assert the paths agree.

    segs: (ax, ay, bx, by, subj, clip) raw directed-normalized segments (e.g. from
    the DataFrame segment builder). Returns rings: (shape_id, ring_id, is_hole,
    pts_x, pts_y, area2)."""
    from ..session import audit_desc, ship_package

    ship_package(segs.sparkSession)
    from .distributed_extract import RINGS_OUT_SCHEMA, extract_shapes_df

    if options is None:
        options = OverlayOptions()
    audit_desc(segs.sparkSession, "merge+ckpt")
    merged = merge_segments_df(segs).localCheckpoint(eager=True)
    audit_desc(segs.sparkSession, "merge:bounds")
    bounds = _count_and_bounds(merged)
    if not force_distributed and bounds[0] <= small_threshold:
        cover, _ = salted_cover(merged, cells_per_axis=32, hot_threshold=1 << 62, bounds=bounds)
        est_pairs = int(
            cover.groupBy("cx", "cy")
            .count()
            .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2))
            .first()[0]
            or 0
        )
        # every crossing adds two sub-segments: the POST-split size bound is what
        # the one-task kernel's O(n*m) fill must survive, not the input size
        est_out = bounds[0] + 2 * est_pairs
        if est_out <= pair_threshold:
            return (
                merged.withColumn("_g", F.lit(0))
                .groupBy("_g")
                .applyInPandas(
                    _local_overlay_kernel(rule, fill_rule, options), schema=RINGS_OUT_SCHEMA
                )
            )
    split = split_segments_df(
        merged,
        checkpoint_dir=checkpoint_dir,
        pre_merged=True,
        bounds=bounds,
        # the fill stage's shuffle is the sole consumer of the terminal apply:
        # stream the chain explode straight into the shuffle write
        checkpoint_last=False,
    )
    # boundary rows leave the fill kernel as per-partition binary blobs (the
    # kernel already holds them as numpy arrays — packing there is free and
    # the checkpoint + fused 64->1 exchange then carry ~n_partitions rows
    # instead of millions; SPARK_GRAFT_BOUNDARY_BLOB=0 restores the row feed)
    blob = os.environ.get("SPARK_GRAFT_BOUNDARY_BLOB", "1") != "0"
    fills = compute_fills_df(
        split, fill_rule, boundary_rule=rule, boundary_blob=blob
    )
    # splitting never leaves the input bbox, so the merge-stage bounds cap the
    # coordinates of every downstream row — extract can skip its max scan
    cmax_hint = max(abs(bounds[1]), abs(bounds[2]), abs(bounds[3]), abs(bounds[4]))
    return extract_shapes_df(
        fills,
        rule,
        options,
        pre_filtered=True,
        cmax_hint=cmax_hint,
        # post-split row count UPPER BOUND >= boundary rows: when it already
        # clears the fused cap, extract skips its count job (one barrier less)
        n_edges_hint=getattr(split, "_ioverlay_n_segments", None),
        packed_boundary=blob,
    )


def contours_to_segments_df(spark: SparkSession, contours_df: DataFrame) -> DataFrame:
    """(role, cid, pts_x, pts_y) contour rows -> normalized segments, pure Column ops.

    Map-side only: edge pairs are built INSIDE the array columns (transform over
    index i pairing point i with point (i+1) mod n), then exploded — no window,
    no shuffle (a lead()-window formulation would range-shuffle every point).
    `cid` remains the caller-provided stable contour id (determinism), though the
    output no longer depends on it."""
    pairs = contours_df.where(F.size("pts_x") >= 2).select(
        "role",
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
        "role",
        F.col("e.p0x").alias("p0x"),
        F.col("e.p0y").alias("p0y"),
        F.col("e.p1x").alias("p1x"),
        F.col("e.p1y").alias("p1y"),
    ).where((F.col("p0x") != F.col("p1x")) | (F.col("p0y") != F.col("p1y")))
    fwd = (F.col("p0x") < F.col("p1x")) | (
        (F.col("p0x") == F.col("p1x")) & (F.col("p0y") < F.col("p1y"))
    )
    sgn = F.when(fwd, F.lit(1)).otherwise(F.lit(-1))
    return nxt.select(
        F.when(fwd, F.col("p0x")).otherwise(F.col("p1x")).alias("ax"),
        F.when(fwd, F.col("p0y")).otherwise(F.col("p1y")).alias("ay"),
        F.when(fwd, F.col("p1x")).otherwise(F.col("p0x")).alias("bx"),
        F.when(fwd, F.col("p1y")).otherwise(F.col("p0y")).alias("by"),
        F.when(F.col("role") == "subject", sgn).otherwise(F.lit(0)).cast("long").alias("subj"),
        F.when(F.col("role") == "clip", sgn).otherwise(F.lit(0)).cast("long").alias("clip"),
    )
