"""A18 contour decomposition + S7 OGC extraction kernel tests."""

import numpy as np

from ioverlay_spark.kernel.decompose import decompose_contours, decompose_ring
from ioverlay_spark.kernel.extract import extract_shapes_ogc, ring_area2
from ioverlay_spark.kernel.overlay import build_graph
from ioverlay_spark.options import DEFAULT_OPTIONS, FillRule, OverlayRule


def sq(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]], dtype=np.int64)


def test_decompose_simple_ring_unchanged():
    parts = decompose_ring(sq(0, 0, 4))
    assert len(parts) == 1
    assert parts[0].tolist() == sq(0, 0, 4).tolist()


def test_decompose_bowtie():
    ring = np.array([[0, 0], [2, 0], [1, 1], [2, 2], [0, 2], [1, 1]], dtype=np.int64)
    parts = decompose_ring(ring)
    assert len(parts) == 2
    # each part is simple (no repeated vertex) and closed-area nonzero
    for p in parts:
        assert len({tuple(q) for q in p.tolist()}) == len(p)
        assert ring_area2(p) != 0
    # total unsigned area preserved: two unit-ish triangles
    assert sum(abs(ring_area2(p)) for p in parts) == 4


def test_decompose_nested_repeats():
    ring = np.array(
        [[0, 0], [10, 0], [10, 10], [5, 10], [5, 5], [7, 5], [7, 8], [5, 8], [5, 10], [0, 10]],
        dtype=np.int64,
    )
    parts = decompose_ring(ring)
    assert len(parts) == 2
    assert sorted(len(p) for p in parts) == [5, 5]


def test_decompose_consecutive_duplicates_dropped():
    ring = np.array([[0, 0], [0, 0], [4, 0], [4, 4], [4, 4], [0, 4]], dtype=np.int64)
    parts = decompose_ring(ring)
    assert len(parts) == 1
    assert len(parts[0]) == 4


def test_decompose_contours_multi():
    parts = decompose_contours([sq(0, 0, 2), sq(10, 10, 2)])
    assert len(parts) == 2


def test_ogc_pinch_union_splits():
    g = build_graph([sq(0, 0, 2), sq(2, 2, 2)], [], FillRule.NON_ZERO)
    shapes = extract_shapes_ogc(g.segments, g.fills, OverlayRule.SUBJECT, DEFAULT_OPTIONS)
    assert len(shapes) == 2
    assert sum(ring_area2(r) for s in shapes for r in s) == 2 * (4 + 4)
    # every output ring is simple
    for s in shapes:
        for r in s:
            assert len({tuple(q) for q in r.tolist()}) == len(r)


def test_ogc_matches_default_on_simple_input():
    g = build_graph([sq(0, 0, 100)], [sq(25, 25, 50)], FillRule.EVEN_ODD)
    a = g.extract(OverlayRule.DIFFERENCE)
    b = extract_shapes_ogc(g.segments, g.fills, OverlayRule.DIFFERENCE, DEFAULT_OPTIONS)
    assert [[r.tolist() for r in s] for s in a] == [[r.tolist() for r in s] for s in b]
