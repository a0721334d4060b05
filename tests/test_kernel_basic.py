"""Kernel unit + property tests (mirrors the reference's inline unit suites,
iOverlay/src/segm/build.rs:148-434, iOverlay/src/split/cross_solver.rs:314-409)."""

import numpy as np
import pytest

from ioverlay_spark.kernel import (
    build_graph,
    build_segments,
    overlay,
    ring_area2,
    simplify,
    sort_and_merge,
    split_segments,
)
from ioverlay_spark.options import FillRule, OverlayOptions, OverlayRule


def sq(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]], dtype=np.int64)


def shapes_area2(shapes):
    # hull area + hole areas (holes have opposite sign)
    return sum(ring_area2(ring) for shape in shapes for ring in shape)


class TestSegments:
    def test_build_counts(self):
        segs = build_segments([sq(0, 0, 10)], True)
        assert len(segs) == 4
        # CCW square: bottom edge is left-to-right => +1
        assert set(segs.subj.tolist()) == {1, -1}
        assert segs.clip.tolist() == [0, 0, 0, 0]

    def test_degenerate_contour_dropped(self):
        segs = build_segments([np.array([[0, 0], [5, 0], [10, 0]])], True)
        segs = sort_and_merge(segs)
        assert len(segs) == 0

    def test_merge_opposite_cancels(self):
        a = build_segments([sq(0, 0, 10)], True)
        b = build_segments([sq(0, 0, 10)[::-1]], True)  # reversed ring cancels
        merged = sort_and_merge(type(a).concat([a, b]))
        assert len(merged) == 0


class TestSplit:
    def test_crossing_squares_split(self):
        segs = sort_and_merge(
            type(build_segments([], True)).concat(
                [build_segments([sq(0, 0, 10)], True), build_segments([sq(5, 5, 10)], False)]
            )
        )
        out = split_segments(segs)
        # 2 crossings add 2 segments each
        assert len(out) == 12

    def test_exact_midpoint_cross(self):
        # X crossing at integer point
        a = np.array([[0, 0], [10, 10], [0, 10], [10, 0]])
        res = simplify([a], FillRule.NON_ZERO)
        assert len(res) > 0


class TestOverlayBasics:
    def test_disjoint(self):
        res = overlay([sq(0, 0, 4)], [sq(100, 100, 4)], OverlayRule.INTERSECT)
        assert res == []
        res = overlay([sq(0, 0, 4)], [sq(100, 100, 4)], OverlayRule.UNION)
        assert len(res) == 2

    def test_identical(self):
        res = overlay([sq(0, 0, 8)], [sq(0, 0, 8)], OverlayRule.XOR)
        assert res == []
        res = overlay([sq(0, 0, 8)], [sq(0, 0, 8)], OverlayRule.INTERSECT)
        assert shapes_area2(res) == 2 * 64

    def test_hole_created(self):
        res = overlay([sq(0, 0, 100)], [sq(25, 25, 50)], OverlayRule.DIFFERENCE)
        assert len(res) == 1
        assert len(res[0]) == 2  # hull + hole
        assert shapes_area2(res) == 2 * (100 * 100 - 50 * 50)

    def test_empty_subject(self):
        assert overlay([], [sq(0, 0, 4)], OverlayRule.INTERSECT) == []
        assert shapes_area2(overlay([], [sq(0, 0, 4)], OverlayRule.UNION)) == 2 * 16

    @pytest.mark.parametrize("fill", list(FillRule))
    def test_area_identities(self, fill):
        subj = [sq(0, 0, 60), sq(30, 30, 60)]
        clip = [sq(15, 15, 60)]
        g = build_graph(subj, clip, fill)
        a = {r: shapes_area2(g.extract(r)) for r in OverlayRule}
        assert a[OverlayRule.UNION] == a[OverlayRule.INTERSECT] + a[OverlayRule.XOR]
        assert a[OverlayRule.SUBJECT] == a[OverlayRule.DIFFERENCE] + a[OverlayRule.INTERSECT]
        assert a[OverlayRule.CLIP] == a[OverlayRule.INVERSE_DIFFERENCE] + a[OverlayRule.INTERSECT]
        assert a[OverlayRule.XOR] == a[OverlayRule.DIFFERENCE] + a[OverlayRule.INVERSE_DIFFERENCE]

    def test_self_intersecting_simplify(self):
        # bowtie resolves into two triangles under even-odd
        bow = np.array([[0, 0], [10, 10], [10, 0], [0, 10]])
        res = simplify([bow], FillRule.EVEN_ODD)
        assert shapes_area2(res) == 2 * 50  # two triangles, 25 each


class TestBigCoordinates:
    def test_large_coords_exact(self):
        s = 1 << 29
        res = overlay([sq(-s, -s, 2 * s)], [sq(0, 0, 2 * s)], OverlayRule.INTERSECT)
        assert shapes_area2(res) == 2 * s * s


def test_windowed_fills_match_dense():
    """compute_fills_windowed must be bit-identical to compute_fills on
    intersection-free sets (random stars, all four fill rules)."""
    import numpy as np

    from ioverlay_spark.kernel.fill import compute_fills, compute_fills_windowed
    from ioverlay_spark.kernel.segments import Segments, build_segments, sort_and_merge
    from ioverlay_spark.kernel.split import split_segments
    from ioverlay_spark.options import FillRule

    rng = np.random.default_rng(7)
    for _ in range(20):
        rings = [
            rng.integers(-200, 200, size=(int(rng.integers(3, 10)), 2))
            for _ in range(int(rng.integers(1, 6)))
        ]
        segs = split_segments(
            sort_and_merge(
                Segments.concat(
                    [
                        build_segments([np.asarray(r, dtype=np.int64) for r in rings[:2]], True),
                        build_segments([np.asarray(r, dtype=np.int64) for r in rings[2:]], False),
                    ]
                )
            )
        )
        for fr in FillRule:
            assert np.array_equal(
                compute_fills(segs, fr), compute_fills_windowed(segs, fr)
            )


def test_segtree_fills_match_dense():
    """compute_fills_segtree (the vectorized segment-tree ray-shoot that
    replaces the python sweep on dense int64-extent sets) must be bit-identical
    to compute_fills on post-split sets — shared-node soups, verticals,
    negative windings — AND on strip SUBSETS (ray-at-midpoint semantics, so the
    r03 sweep-subset trap must not apply to it)."""
    import numpy as np

    from ioverlay_spark.kernel.fill import compute_fills, compute_fills_segtree
    from ioverlay_spark.kernel.segments import Segments, build_segments
    from ioverlay_spark.kernel.split import split_segments
    from ioverlay_spark.options import FillRule

    rng = np.random.default_rng(17)
    for trial in range(30):
        base = 0 if trial % 3 else int(rng.integers(1, 1 << 28))
        span = 40 if trial % 3 else 50
        nring = int(rng.integers(1, 5))
        mk = lambda: base + rng.integers(-span, span, (int(rng.integers(3, 9)), 2)).astype(
            np.int64
        )
        segs = split_segments(
            Segments.concat(
                [
                    build_segments([mk() for _ in range(nring)], True),
                    build_segments([mk() for _ in range(nring)], False),
                ]
            )
        )
        for fr in FillRule:
            assert np.array_equal(compute_fills(segs, fr), compute_fills_segtree(segs, fr))
        # subset safety: an arbitrary x-slice of the set (the distributed
        # strip kernel's shape) must still match the dense fill ON THE SUBSET
        if len(segs) >= 4:
            mid = int(np.median(segs.ax))
            keep = np.flatnonzero((segs.bx >= mid) | (segs.ax <= mid))
            sub = Segments(
                segs.ax[keep], segs.ay[keep], segs.bx[keep], segs.by[keep],
                segs.subj[keep], segs.clip[keep],
            )
            assert np.array_equal(
                compute_fills(sub, FillRule.NON_ZERO),
                compute_fills_segtree(sub, FillRule.NON_ZERO),
            )


def test_sweep_fills_match_dense():
    """compute_fills_sweep must be bit-identical to compute_fills on post-split
    sets — dense shared-node soups, verticals, negative windings, and
    >2^31-extent coordinates (the object-int territory the sweep replaces)."""
    import numpy as np

    from ioverlay_spark.kernel.fill import compute_fills, compute_fills_sweep
    from ioverlay_spark.kernel.segments import Segments, build_segments
    from ioverlay_spark.kernel.split import split_segments
    from ioverlay_spark.options import FillRule

    rng = np.random.default_rng(3)
    for trial in range(30):
        base = 0 if trial % 3 else int(rng.integers(1, 1 << 58))
        span = 40 if trial % 3 else 50
        nring = int(rng.integers(1, 5))
        mk = lambda: base + rng.integers(-span, span, (int(rng.integers(3, 9)), 2)).astype(
            np.int64
        )
        segs = split_segments(
            Segments.concat(
                [
                    build_segments([mk() for _ in range(nring)], True),
                    build_segments([mk() for _ in range(nring)], False),
                ]
            )
        )
        for fr in FillRule:
            assert np.array_equal(compute_fills(segs, fr), compute_fills_sweep(segs, fr))


def test_grid_candidates_match_xwindow():
    """_candidate_pairs_grid must return exactly the bbox-overlap pair set the
    x-window enumeration produces (long diagonal chords trigger the grid)."""
    import numpy as np

    import ioverlay_spark.kernel.split as sp
    from ioverlay_spark.kernel.segments import Segments, sort_and_merge

    rng = np.random.default_rng(9)
    for _ in range(10):
        n = int(rng.integers(150, 500))
        ax = rng.integers(-100000, 100000, n)
        bx = ax + rng.integers(1, 80000, n)
        ay = rng.integers(-100000, 100000, n)
        by = ay + rng.integers(-80000, 80000, n)
        s = sort_and_merge(
            Segments(
                ax.astype(np.int64),
                ay.astype(np.int64),
                bx.astype(np.int64),
                np.where(by == ay, ay + 1, by).astype(np.int64),
                np.ones(n, dtype=np.int64),
                np.zeros(n, dtype=np.int64),
            )
        )
        ymin = np.minimum(s.ay, s.by)
        ymax = np.maximum(s.ay, s.by)
        orig = sp._candidate_pairs_grid
        sp._candidate_pairs_grid = lambda *a, **k: None
        try:
            xw = sp._candidate_pairs(s)
        finally:
            sp._candidate_pairs_grid = orig
        g = sp._candidate_pairs_grid(s, ymin, ymax, 1 << 62)
        assert g is not None
        assert set(map(tuple, xw.tolist())) == set(map(tuple, g.tolist()))


def test_apply_marks_matches_scalar_reference():
    """Vectorized _apply_marks must produce the same multiset of sub-segments
    as the scalar walk (endpoint marks, duplicates, reversed sub-directions)."""
    import numpy as np

    from ioverlay_spark.kernel.segments import Segments
    from ioverlay_spark.kernel.split import _apply_marks, _apply_marks_ref

    rng = np.random.default_rng(13)

    def canon(s):
        a = np.stack([s.ax, s.ay, s.bx, s.by, s.subj, s.clip], axis=1)
        return sorted(map(tuple, a.tolist()))

    for _ in range(60):
        n = int(rng.integers(2, 40))
        ax = rng.integers(-50, 50, n)
        bx = ax + rng.integers(0, 30, n)
        ay = rng.integers(-50, 50, n)
        by = ay + rng.integers(-30, 30, n)
        by = np.where((ax == bx) & (ay == by), ay + 1, by)
        swap = (bx < ax) | ((bx == ax) & (by < ay))
        s = Segments(
            np.where(swap, bx, ax).astype(np.int64),
            np.where(swap, by, ay).astype(np.int64),
            np.where(swap, ax, bx).astype(np.int64),
            np.where(swap, ay, by).astype(np.int64),
            rng.integers(-3, 4, n).astype(np.int64),
            rng.integers(-3, 4, n).astype(np.int64),
        )
        marks = []
        for _ in range(int(rng.integers(0, 60))):
            i = int(rng.integers(0, n))
            if rng.random() < 0.25:
                marks.append(
                    (i, int(s.ax[i]), int(s.ay[i]))
                    if rng.random() < 0.5
                    else (i, int(s.bx[i]), int(s.by[i]))
                )
            else:
                t = rng.random()
                marks.append(
                    (
                        i,
                        int(round(s.ax[i] + t * (s.bx[i] - s.ax[i]))),
                        int(round(s.ay[i] + t * (s.by[i] - s.ay[i]))),
                    )
                )
            if rng.random() < 0.3 and marks:
                marks.append(marks[-1])
        assert canon(_apply_marks(s, marks)) == canon(_apply_marks_ref(s, marks))


def test_fast_walk_contours_matches_scalar():
    """extract_shapes' vectorized degree-2 fast walk (incl. the list-ranking
    long-ring branch, rings > 64 points) must be contour-for-contour identical
    to walk_contours; pinch graphs must fall back (None)."""
    import numpy as np

    from ioverlay_spark.kernel.extract import _fast_walk_contours, walk_contours
    from ioverlay_spark.kernel.fill import compute_fills
    from ioverlay_spark.kernel.segments import Segments, build_segments
    from ioverlay_spark.kernel.split import split_segments
    from ioverlay_spark.options import FillRule, OverlayRule

    def compare(segs, fills, rule):
        fast = _fast_walk_contours(segs, fills, rule, False, None)
        walk = walk_contours(segs, fills, rule, False)
        if fast is None:
            return None
        assert len(fast) == len(walk)
        for a, b in zip(fast, walk):
            assert [tuple(p) for p in a[0]] == [tuple(p) for p in b[0]]
            assert a[1] == b[1]
        return True

    # one long ring (> 64 points: exercises the list-ranking branch)
    t = np.linspace(0, 2 * np.pi, 300, endpoint=False)
    ring = np.stack(
        [np.round(10000 * np.cos(t)), np.round(10000 * np.sin(t))], axis=1
    ).astype(np.int64)
    segs = split_segments(build_segments([ring], True))
    assert compare(segs, compute_fills(segs, FillRule.NON_ZERO), OverlayRule.SUBJECT)

    # hull + hole
    sq = lambda s: np.array([[-s, -s], [s, -s], [s, s], [-s, s]], dtype=np.int64)
    segs = split_segments(
        Segments.concat(
            [build_segments([sq(100)], True), build_segments([sq(50)[::-1]], True)]
        )
    )
    assert compare(segs, compute_fills(segs, FillRule.NON_ZERO), OverlayRule.SUBJECT)

    # degree-4 pinch (XOR corner touch): the round-4 IN-sector involution
    # serves it vectorized — must match the scalar walk exactly
    a = np.array([[0, 0], [100, 0], [100, 100], [0, 100]], dtype=np.int64)
    b = np.array([[100, 100], [200, 100], [200, 200], [100, 200]], dtype=np.int64)
    segs = split_segments(
        Segments.concat([build_segments([a], True), build_segments([b], False)])
    )
    assert compare(segs, compute_fills(segs, FillRule.EVEN_ODD), OverlayRule.XOR)

    # random soups across rules
    rng = np.random.default_rng(31)
    for trial in range(15):
        mk = lambda npts, span: rng.integers(-span, span, (npts, 2)).astype(np.int64)
        segs = split_segments(
            Segments.concat(
                [
                    build_segments([mk(int(rng.integers(3, 80)), 300) for _ in range(3)], True),
                    build_segments([mk(int(rng.integers(3, 80)), 300) for _ in range(2)], False),
                ]
            )
        )
        fills = compute_fills(segs, FillRule.NON_ZERO)
        for rule in (OverlayRule.UNION, OverlayRule.INTERSECT, OverlayRule.XOR):
            compare(segs, fills, rule)


def test_fast_walk_pinch_dense_matches_scalar():
    """Adversarial differential for the round-4 sim-walk path: grid-aligned
    rect soups (shared corners => degree-4/6/8 pinch nodes on many tiles) and
    fans of triangles through one point (a single very-high-degree node). The
    fast walk must serve these withOUT falling back and emit contours
    bit-identical to walk_contours (reference trigger order included)."""
    import numpy as np

    from ioverlay_spark.kernel.extract import _fast_walk_contours, walk_contours
    from ioverlay_spark.kernel.fill import compute_fills
    from ioverlay_spark.kernel.segments import Segments, build_segments
    from ioverlay_spark.kernel.split import split_segments
    from ioverlay_spark.options import FillRule, OverlayRule

    def compare(segs, fills, rule):
        fast = _fast_walk_contours(segs, fills, rule, False, None)
        walk = walk_contours(segs, fills, rule, False)
        assert fast is not None  # sim path must serve pinch graphs
        assert len(fast) == len(walk)
        for a, b in zip(fast, walk):
            assert [tuple(p) for p in a[0]] == [tuple(p) for p in b[0]]
            assert a[1] == b[1]

    rng = np.random.default_rng(20260818)
    for trial in range(60):
        nr = int(rng.integers(2, 7))
        rs, rc = [], []
        for i in range(nr):
            x0, y0 = (rng.integers(0, 8, 2) * 25).astype(np.int64)
            w, h = (rng.integers(1, 5, 2) * 25).astype(np.int64)
            r = np.array(
                [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]],
                dtype=np.int64,
            )
            (rs if i % 2 == 0 else rc).append(r)
        if not rc:
            rc.append(np.array([[0, 0], [25, 0], [25, 25], [0, 25]], dtype=np.int64))
        segs = split_segments(
            Segments.concat([build_segments(rs, True), build_segments(rc, False)])
        )
        for fr in (FillRule.EVEN_ODD, FillRule.NON_ZERO):
            fills = compute_fills(segs, fr)
            for rule in (
                OverlayRule.XOR,
                OverlayRule.UNION,
                OverlayRule.INTERSECT,
                OverlayRule.DIFFERENCE,
            ):
                compare(segs, fills, rule)

    for trial in range(20):
        k = int(rng.integers(3, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        tris = []
        for a0 in ang:
            p1 = np.round(200 * np.array([np.cos(a0), np.sin(a0)])).astype(np.int64)
            p2 = np.round(
                200 * np.array([np.cos(a0 + 0.3), np.sin(a0 + 0.3)])
            ).astype(np.int64)
            tris.append(np.array([[0, 0], list(p1), list(p2)], dtype=np.int64))
        segs = split_segments(
            Segments.concat(
                [
                    build_segments(tris[::2], True),
                    build_segments(tris[1::2] or [tris[0]], False),
                ]
            )
        )
        for fr in (FillRule.EVEN_ODD, FillRule.NON_ZERO):
            fills = compute_fills(segs, fr)
            for rule in (OverlayRule.XOR, OverlayRule.UNION):
                compare(segs, fills, rule)
