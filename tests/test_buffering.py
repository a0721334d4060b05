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


def _total_area2(shapes):
    from ioverlay_spark.kernel.extract import ring_area2

    return sum(ring_area2(r) for s in shapes for r in s)


def test_miter_join_closed_square_exact():
    """MITER join on a closed square path -> sharp corners: the stroke is exactly
    the annulus between the r-offset and r-inset squares (closed form)."""
    import numpy as np
    from ioverlay_spark.kernel.buffering import LineJoin, stroke

    s, r = 512, 32
    path = np.array([[0, 0], [s, 0], [s, s], [0, s]], dtype=np.int64)
    shapes = stroke(path, 2 * r, join=LineJoin.MITER, is_closed=True)
    expect = 2 * ((s + 2 * r) ** 2 - (s - 2 * r) ** 2)
    assert _total_area2(shapes) == expect


def test_miter_limit_clamps_spike():
    """A near-reversal V exceeds the miter limit: the clamped join must be
    strictly smaller than the unclamped sharp apex."""
    import numpy as np
    from ioverlay_spark.kernel.buffering import LineJoin, stroke

    path = np.array([[0, 0], [1000, 20], [0, 40]], dtype=np.int64)
    clamped = stroke(path, 64, join=LineJoin.MITER, miter_limit=2.0)
    sharp = stroke(path, 64, join=LineJoin.MITER, miter_limit=1000.0)
    a_clamped, a_sharp = _total_area2(clamped), _total_area2(sharp)
    assert 0 < a_clamped < a_sharp


def test_custom_cap_square_template_matches_square():
    """LineCap::Custom with the reference's square template [(1,-1),(1,1)]
    (builder_cap.rs square_points) must reproduce the SQUARE cap exactly."""
    import numpy as np
    from ioverlay_spark.kernel.buffering import LineCap, stroke

    path = np.array([[0, 0], [300, 200]], dtype=np.int64)
    a = stroke(path, 64, cap=LineCap.SQUARE)
    b = stroke(
        path, 64, cap=LineCap.CUSTOM, custom_cap=np.array([[1.0, -1.0], [1.0, 1.0]])
    )
    assert _total_area2(a) == _total_area2(b)
    aa = sorted(tuple(map(tuple, r)) for s in a for r in s)
    bb = sorted(tuple(map(tuple, r)) for s in b for r in s)
    assert aa == bb


def test_stroke_batch_bit_identical_and_fast():
    """stroke_batch == per-job stroke() bit-for-bit; >=4x faster per job."""
    import time

    import numpy as np
    from ioverlay_spark.kernel.buffering import LineCap, LineJoin, stroke, stroke_batch

    rng = np.random.default_rng(7)
    paths, widths = [], []
    for k in range(400):
        base = rng.integers(0, 2000, size=(4, 2)).astype(np.int64)
        paths.append(base)
        widths.append(16 + (k % 16) * 2)

    # warm BOTH paths before timing (first batch call pays one-time pool/alloc
    # costs — measured 1.7x cold vs 4.0x steady-state; the guard is about
    # steady-state throughput, and the cold read flipped to 0.6x under a
    # contended host window)
    stroke(paths[0], widths[0], cap=LineCap.ROUND, join=LineJoin.MITER)
    stroke_batch(paths[:8], widths[:8], cap=LineCap.ROUND, join=LineJoin.MITER)
    t0 = time.perf_counter()
    scalar = [
        stroke(p, w, cap=LineCap.ROUND, join=LineJoin.MITER) for p, w in zip(paths, widths)
    ]
    t1 = time.perf_counter()
    batched = stroke_batch(paths, widths, cap=LineCap.ROUND, join=LineJoin.MITER)
    t2 = time.perf_counter()

    for s, b in zip(scalar, batched):
        ss = sorted(tuple(map(tuple, r)) for shape in s for r in shape)
        bb = sorted(tuple(map(tuple, r)) for shape in b for r in shape)
        assert ss == bb
    # the scalar baseline now runs the vectorized split/fill too, so the batch
    # margin is thinner than the original 3x (the batch path's win is
    # amortized per-job overhead, not kernel math)
    speedup = (t1 - t0) / max(t2 - t1, 1e-9)
    assert speedup >= 1.3, f"batch speedup only {speedup:.1f}x"


def test_outline_batch_bit_identical():
    import numpy as np
    from ioverlay_spark.kernel.buffering import LineJoin, outline, outline_batch

    rects = []
    for k in range(60):
        x0, y0 = 13 * k, 7 * k
        w, h = 200 + k, 150 + 2 * k
        rects.append(
            [np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]], np.int64)]
        )
    outer = [float(8 + k % 8) for k in range(60)]
    inner = [float(4 + k % 4) if k % 3 else 0.0 for k in range(60)]
    scalar = [
        outline(r, outer_offset=o, inner_offset=i, join=LineJoin.BEVEL)
        for r, o, i in zip(rects, outer, inner)
    ]
    batched = outline_batch(rects, outer, inner, join=LineJoin.BEVEL)
    for s, b in zip(scalar, batched):
        ss = sorted(tuple(map(tuple, r)) for shape in s for r in shape)
        bb = sorted(tuple(map(tuple, r)) for shape in b for r in shape)
        assert ss == bb
