"""Exact oracles for stroke/outline (VERDICT r03 #4 — the mesh fixture corpus
ships no golden outputs, so exactness comes from two sources):

1. CLOSED-FORM band/cap/join geometry on synthetic inputs chosen so every
   offset point is integral (axis-aligned paths with even widths, 3-4-5
   diagonals with widths divisible by 10): the stroke/outline areas equal the
   analytic band algebra EXACTLY — the `stroke_miter` query's pattern extended
   across the cap x join matrix (reference mesh/stroke/offset.rs:44-160,
   mesh/outline/offset.rs:47-160, builder_join.rs).

2. METAMORPHIC differentials across the full reference corpus
   (/root/reference/iOverlay/tests/{stroke,outline}/*.json): the band of a path
   is direction-free as a SET, so stroke(reverse(path)) must canon-equal
   stroke(path) for every fixture and every cap/join style; likewise
   stroke_batch must equal per-path stroke. The reversal differential found a
   real bug (bevel triangles on right turns were CW, carrying winding -1 into
   the NonZero union and punching rounding slivers that flipped with traversal
   direction — fixed in kernel/buffering.py)."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

from ioverlay_spark.kernel.buffering import LineCap, LineJoin, outline, stroke, stroke_batch
from ioverlay_spark.kernel.extract import ring_area2

STROKE_DIR = Path("/root/reference/iOverlay/tests/stroke")
OUTLINE_DIR = Path("/root/reference/iOverlay/tests/outline")

pytestmark = pytest.mark.skipif(
    not STROKE_DIR.exists(), reason="reference fixture corpus not available"
)


def _area2(shapes) -> int:
    return sum(
        ring_area2([tuple(p) for p in shape[0]])
        + sum(ring_area2([tuple(p) for p in h]) for h in shape[1:])
        for shape in shapes
    )


def _canon(shapes):
    out = []
    for shape in shapes:
        rings = []
        for ring in shape:
            pts = [tuple(map(int, p)) for p in ring]
            k = min(range(len(pts)), key=lambda i: pts[i])
            rings.append(tuple(pts[k:] + pts[:k]))
        out.append(tuple(sorted(rings)))
    return sorted(out)


def test_stroke_cap_matrix_closed_form():
    """Straight segments: butt = exact w*L rectangle, square = w*(L+w),
    round strictly between them; holds on axis-aligned AND 3-4-5 diagonal
    segments (integer offsets)."""
    L, w = 1000, 40
    seg = np.array([[0, 0], [L, 0]], dtype=np.float64)
    butt = _area2(stroke(seg, w, cap=LineCap.BUTT, join=LineJoin.BEVEL))
    square = _area2(stroke(seg, w, cap=LineCap.SQUARE, join=LineJoin.BEVEL))
    round_ = _area2(stroke(seg, w, cap=LineCap.ROUND, join=LineJoin.BEVEL))
    assert butt == 2 * w * L
    assert square == 2 * w * (L + w)
    # the round cap's inscribed fan lies strictly between the flat cap and the
    # circumscribing square cap
    assert butt < round_ < square

    diag = np.array([[0, 0], [400, 300]], dtype=np.float64)  # |d| = 500
    assert _area2(stroke(diag, 40, cap=LineCap.BUTT, join=LineJoin.BEVEL)) == 2 * 40 * 500


def test_stroke_join_matrix_closed_form():
    """Right-angle L-path with butt caps: exact union algebra per join.
    rect1 u rect2 = 2wL - w^2/4; miter adds the full w/2 x w/2 outer-corner
    square (area2 = 4wL), bevel adds half of it (area2 = 4wL - w^2/4); round
    lies strictly between bevel and miter."""
    L, w = 1000, 40
    path = np.array([[0, 0], [L, 0], [L, L]], dtype=np.float64)
    miter = _area2(stroke(path, w, cap=LineCap.BUTT, join=LineJoin.MITER))
    bevel = _area2(stroke(path, w, cap=LineCap.BUTT, join=LineJoin.BEVEL))
    round_ = _area2(stroke(path, w, cap=LineCap.BUTT, join=LineJoin.ROUND))
    assert miter == 4 * w * L
    assert bevel == 4 * w * L - w * w // 4
    assert bevel < round_ < miter


def test_closed_band_closed_form():
    """Closed square ring band (width 2r): miter keeps all four outer corners
    ((a+2r)^2 - (a-2r)^2); bevel chamfers each (minus 4 * r^2/2). Exact both
    traversal directions."""
    a, r = 600, 50
    ring = np.array([[0, 0], [a, 0], [a, a], [0, a]], dtype=np.float64)
    for pts in (ring, ring[::-1]):
        miter = _area2(stroke(pts, 2 * r, join=LineJoin.MITER, is_closed=True))
        bevel = _area2(stroke(pts, 2 * r, cap=LineCap.BUTT, join=LineJoin.BEVEL, is_closed=True))
        assert miter == 2 * ((a + 2 * r) ** 2 - (a - 2 * r) ** 2)
        assert bevel == 2 * ((a + 2 * r) ** 2 - 2 * r * r - (a - 2 * r) ** 2)


def test_outline_rect_closed_form():
    """Axis-aligned rectangle with miter joins: dilation is exactly the
    (a+2r)-square, erosion the (a-2r)-square, and the closing returns the
    original square exactly."""
    a, r = 600, 50
    sq = [np.array([[0, 0], [a, 0], [a, a], [0, a]], dtype=np.int64)]
    assert _area2(outline(sq, outer_offset=r, join=LineJoin.MITER)) == 2 * (a + 2 * r) ** 2
    assert _area2(outline(sq, inner_offset=r, join=LineJoin.MITER)) == 2 * (a - 2 * r) ** 2
    closing = outline(sq, outer_offset=r, inner_offset=r, join=LineJoin.MITER)
    got = _canon(closing)
    assert len(got) == 1 and len(got[0]) == 1
    ring = got[0][0]
    assert sorted(ring) == sorted([(0, 0), (a, 0), (a, a), (0, a)])


_STYLES = [
    (LineCap.BUTT, LineJoin.BEVEL),
    (LineCap.ROUND, LineJoin.ROUND),
    (LineCap.SQUARE, LineJoin.MITER),
]


def _fixture_paths(d: Path, key: str):
    for fx in sorted(d.glob("*.json")):
        data = json.loads(fx.read_text())
        scale = float(data.get("scale", 1.0))
        w = 30.0 * scale if scale < 10 else 3000.0
        for p in data[key]:
            arr = np.round(np.asarray(p, dtype=np.float64) * scale).astype(np.int64)
            if len(arr) >= 2:
                yield fx.name, arr, w


@pytest.mark.parametrize("cap,join", _STYLES)
@pytest.mark.parametrize(
    "dirname,key,closed", [("stroke", "stroke", False), ("outline", "outline", True)]
)
def test_corpus_reversal_differential(dirname, key, closed, cap, join):
    """stroke(reverse(path)) == stroke(path) canonically, for every corpus
    fixture and style — the band is a set, independent of traversal direction."""
    d = STROKE_DIR if dirname == "stroke" else OUTLINE_DIR
    n = 0
    for name, p, w in _fixture_paths(d, key):
        a = _canon(stroke(p.astype(np.float64), w, cap=cap, join=join, is_closed=closed))
        b = _canon(stroke(p[::-1].astype(np.float64), w, cap=cap, join=join, is_closed=closed))
        assert a == b, f"{name} {cap}/{join}"
        n += 1
    assert n > 0


@pytest.mark.parametrize("cap,join", _STYLES)
def test_corpus_batch_differential(cap, join):
    """stroke_batch over the whole stroke corpus == per-path stroke()."""
    paths = [p.astype(np.float64) for _, p, _ in _fixture_paths(STROKE_DIR, "stroke")]
    widths = [w for _, _, w in _fixture_paths(STROKE_DIR, "stroke")]
    batched = stroke_batch(paths, widths, cap=cap, join=join)
    for p, w, got in zip(paths, widths, batched):
        assert _canon(got) == _canon(stroke(p, w, cap=cap, join=join))
