"""Port of the reference edge-data overlay suite
(iOverlay/tests/edge_overlay_tests.rs: union_squares, intersect_squares,
union_squares_i64).

The reference feeds raw directed InputEdges with a user payload (an EdgeColor
per side) through EdgeOverlay and asserts the exact S8 vector output: directed
edges with SideFill bits plus the payload merged by the user's count-aware
merge hook (iOverlay/src/core/edge_data.rs:5-45).

Spark-first expression: the payload rides as extra columns through
edge_overlay_links (merge hook = a SQL aggregate over the coincident-merge
groupBy, split hook = column duplication onto sub-segments); the directed
ordering + SideFill come from the kernel's walk_vectors over the collected
links. The reference's EdgeDataMerge fold is pairwise with accumulated counts;
the SQL aggregate below is the set-based equivalent, which agrees whenever the
fold is order-independent (always true for this suite's color lattice)."""

import numpy as np
import pytest

from ioverlay_spark.kernel.extract import walk_vectors
from ioverlay_spark.kernel.segments import Segments
from ioverlay_spark.operators.edge_overlay import edge_overlay_links
from ioverlay_spark.options import FillRule, OverlayRule

# Color encoding: the reference's enum, as small ints for JVM-side aggregation.
NONE, RED, GREEN, UNDEF = 0, 1, 2, 3


def _color_merge_expr(color_col: str, count_col: str) -> str:
    """The reference EdgeColor merge (edge_overlay_tests.rs:30-59) as a SQL
    aggregate: colors backed by a non-zero winding count win; two distinct
    backed colors -> Undefined; no backed color -> unanimous color or None."""
    backed = f"CASE WHEN {count_col} <> 0 THEN {color_col} END"
    return (
        f"CASE WHEN count(DISTINCT {backed}) > 1 THEN {UNDEF} "
        f"WHEN count(DISTINCT {backed}) = 1 THEN max({backed}) "
        f"WHEN count(DISTINCT {color_col}) = 1 THEN max({color_col}) "
        f"ELSE {NONE} END"
    )


COLOR_AGGS = {
    "subj_color": _color_merge_expr("subj_color", "subj"),
    "clip_color": _color_merge_expr("clip_color", "clip"),
}


def _square_edges(x0, y0, x1, y1):
    """InputEdge list of the reference's `square` helper: CCW ring edges."""
    pts = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
    return [(pts[i], pts[(i + 1) % 4]) for i in range(4)]


def _seg_rows(edges, is_subject, subj_color, clip_color):
    """Canonical (a<b) rows with signed winding on one channel + payload,
    mirroring kernel build_segments (iOverlay/src/segm/build.rs:130-146)."""
    rows = []
    for (ax, ay), (bx, by) in edges:
        fwd = (ax, ay) < (bx, by)
        a, b = ((ax, ay), (bx, by)) if fwd else ((bx, by), (ax, ay))
        cnt = 1 if fwd else -1
        subj = cnt if is_subject else 0
        clip = 0 if is_subject else cnt
        rows.append((a[0], a[1], b[0], b[1], subj, clip, subj_color, clip_color))
    return rows


def _vector_shapes(spark, subj_rows, clip_rows, rule):
    """Distributed merge+split+fill with the color merge, then the kernel S8
    walk over the collected links -> [(ax, ay, bx, by, side_fill, sc, cc)]."""
    segs = spark.createDataFrame(
        subj_rows + clip_rows,
        "ax long, ay long, bx long, by long, subj long, clip long, "
        "subj_color int, clip_color int",
    )
    links = edge_overlay_links(segs, FillRule.NON_ZERO, extra_aggs=COLOR_AGGS)
    rows = links.collect()
    order = sorted(range(len(rows)), key=lambda i: (rows[i].ax, rows[i].ay,
                                                    rows[i].bx, rows[i].by))
    rows = [rows[i] for i in order]
    kseg = Segments(
        np.array([r.ax for r in rows], dtype=np.int64),
        np.array([r.ay for r in rows], dtype=np.int64),
        np.array([r.bx for r in rows], dtype=np.int64),
        np.array([r.by for r in rows], dtype=np.int64),
        np.array([r.subj for r in rows], dtype=np.int64),
        np.array([r.clip for r in rows], dtype=np.int64),
    )
    fills = np.array([r.fill for r in rows], dtype=np.int64)
    colors = {(r.ax, r.ay, r.bx, r.by): (r.subj_color, r.clip_color)
              for r in rows}
    shapes = []
    for edges, hole in walk_vectors(kseg, fills, rule):
        out = []
        for ax, ay, bx, by, side in edges:
            key = (ax, ay, bx, by) if (ax, ay) < (bx, by) else (bx, by, ax, ay)
            sc, cc = colors[key]
            out.append((ax, ay, bx, by, side, sc, cc))
        shapes.append((out, hole))
    hulls = [e for e, hole in shapes if not hole]
    holes = [e for e, hole in shapes if hole]
    assert not holes
    return [[h] for h in hulls]


def _rot(seq):
    k = min(range(len(seq)), key=lambda i: seq[i])
    return tuple(seq[k:]) + tuple(seq[:k])


def test_union_squares(spark):
    # edge_overlay_tests.rs union_squares: two touching squares, the shared
    # wall cancels; each surviving edge keeps its own side's color.
    subj = _seg_rows(_square_edges(0, 0, 4, 4), True, RED, NONE)
    clip = _seg_rows(_square_edges(4, 0, 8, 4), False, NONE, GREEN)
    shapes = _vector_shapes(spark, subj, clip, OverlayRule.UNION)
    assert len(shapes) == 1 and len(shapes[0]) == 1
    want = [
        (0, 4, 0, 0, 1, RED, NONE),
        (0, 0, 4, 0, 1, RED, NONE),
        (4, 0, 8, 0, 4, NONE, GREEN),
        (8, 0, 8, 4, 4, NONE, GREEN),
        (8, 4, 4, 4, 4, NONE, GREEN),
        (4, 4, 0, 4, 1, RED, NONE),
    ]
    assert _rot(shapes[0][0]) == _rot(want)


def test_intersect_squares(spark):
    # edge_overlay_tests.rs intersect_squares: partial collinear overlap on the
    # shared bottom/top runs -> split + count-aware color merge (Red+Green on
    # the doubly-backed pieces, single color where only one side has winding).
    subj = _seg_rows(_square_edges(0, 0, 4, 4), True, RED, NONE)
    clip = _seg_rows(_square_edges(2, 0, 6, 4), False, NONE, GREEN)
    shapes = _vector_shapes(spark, subj, clip, OverlayRule.INTERSECT)
    assert len(shapes) == 1 and len(shapes[0]) == 1
    want = [
        (2, 4, 2, 0, 7, NONE, GREEN),
        (2, 0, 4, 0, 5, RED, GREEN),
        (4, 0, 4, 4, 13, RED, NONE),
        (4, 4, 2, 4, 5, RED, GREEN),
    ]
    assert _rot(shapes[0][0]) == _rot(want)


def test_union_squares_i64(spark):
    # edge_overlay_tests.rs union_squares_i64: same geometry through the wide
    # coordinate path — shifted beyond i32 range to actually exercise i64.
    big = 1 << 33
    subj = _seg_rows(_square_edges(big, big, big + 4, big + 4), True, RED, NONE)
    clip = _seg_rows(_square_edges(big + 4, big, big + 8, big + 4),
                     False, NONE, GREEN)
    shapes = _vector_shapes(spark, subj, clip, OverlayRule.UNION)
    assert len(shapes) == 1 and len(shapes[0]) == 1
    assert len(shapes[0][0]) == 6
