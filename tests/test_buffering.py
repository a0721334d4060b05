"""Buffering kernel tests (reference mesh suites: iOverlay tests/stroke, tests/outline)."""

import numpy as np

from ioverlay_spark.kernel.buffering import LineCap, LineJoin, outline, stroke
from ioverlay_spark.kernel.extract import ring_area2


def area(shapes):
    return sum(ring_area2(r) for s in shapes for r in s) / 2


def test_butt_stroke_exact_rect():
    s = stroke(np.array([[0, 0], [100, 0]]), 20, cap=LineCap.BUTT)
    assert len(s) == 1
    assert area(s) == 2000


def test_square_cap():
    s = stroke(np.array([[0, 0], [100, 0]]), 20, cap=LineCap.SQUARE)
    assert area(s) == 2400


def test_round_cap_close_to_disk():
    s = stroke(np.array([[0, 0], [100, 0]]), 20, cap=LineCap.ROUND)
    # 2000 + pi*r^2 (inscribed polygon slightly smaller)
    assert 2000 + 250 < area(s) <= 2000 + np.pi * 100


def test_closed_ring_stroke_has_hole():
    s = stroke(np.array([[0, 0], [100, 0], [100, 100], [0, 100]]), 20, is_closed=True)
    assert len(s) == 1 and len(s[0]) == 2  # hull + hole
    assert 7500 < area(s) < 8400


def test_outline_dilate_erode():
    sq = [np.array([[0, 0], [100, 0], [100, 100], [0, 100]], dtype=np.int64)]
    assert 14000 < area(outline(sq, outer_offset=10)) <= 10000 + 4000 + np.pi * 100
    assert area(outline(sq, inner_offset=10)) == 6400


def test_erode_away_entirely():
    sq = [np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=np.int64)]
    assert outline(sq, inner_offset=6) == []


def test_bevel_join_runs():
    s = stroke(
        np.array([[0, 0], [100, 0], [100, 100]]), 20, cap=LineCap.BUTT, join=LineJoin.BEVEL
    )
    assert 3800 <= area(s) <= 4100
