"""Port of the reference fragment suite (iOverlay/tests/fragment_tests.rs):
the four asserting test fns compare the LIST / TREE / FRAG solver strategies
for identical output on crossing-dense grids (many_squares, no_overlap,
many_lines, discrete_spiral; the remaining two fns only print JSON).

The engine's strategy analogs: the scalar kernel (list solver), the batched
tile kernel (vectorized candidates + cross solver), and the distributed Spark
plan (grid-fragment solver). All three must produce the same shapes."""

from __future__ import annotations

import numpy as np
import pytest

from ioverlay_spark.kernel.batch import overlay_batch
from ioverlay_spark.kernel.overlay import overlay
from ioverlay_spark.options import FillRule, OverlayRule

NZ = FillRule.NON_ZERO


def many_squares(sx, sy, size, offset, n):
    out = []
    y = sy
    for _ in range(n):
        x = sx
        for _ in range(n):
            out.append(np.array(
                [(x, y), (x, y + size), (x + size, y + size), (x + size, y)],
                dtype=np.int64))
            x += offset
        y += offset
    return out


def romb(x, y, a):
    return np.array([(x - a, y), (x, y - a), (x + a, y), (x, y + a)], dtype=np.int64)


def square(x, y, a):
    return np.array(
        [(x - a, y + a), (x - a, y - a), (x + a, y - a), (x + a, y + a)], dtype=np.int64
    )


def repeat_xy(origin, x0, y0, dx, dy, count):
    out = []
    x = x0
    for _ in range(count):
        y = y0
        for _ in range(count):
            out.append(origin + np.array([x, y], dtype=np.int64))
            y += dy
        x += dx
    return out


def many_lines_x(a, n):
    w = a // 2
    s = a * n // 2
    x = -s + w // 2
    out = []
    for _ in range(n):
        out.append(np.array([(x, -s), (x, s), (x + w, s), (x + w, -s)], dtype=np.int64))
        x += a
    return out


def many_lines_y(a, n):
    h = a // 2
    s = a * n // 2
    y = -s + h // 2
    out = []
    for _ in range(n):
        out.append(np.array([(-s, y), (s, y), (s, y - h), (-s, y - h)], dtype=np.int64))
        y += a
    return out


def discrete_spiral(count, a):
    rects = []
    a2, a4, a6 = 2 * a, 4 * a, 6 * a
    r = 0
    for _ in range(count):
        rects.append(np.array(
            [(-r, -r), (-r, -r - a2), (r + a2, -r - a2), (r + a2, -r)], dtype=np.int64))
        rects.append(np.array(
            [(-r - a4, r + a6), (-r - a4, r + a4), (r + a2, r + a4), (r + a2, r + a6)],
            dtype=np.int64))
        rects.append(np.array(
            [(-r - a6, r + a4), (-r - a6, -(r + a4)), (-r - a4, -(r + a4)), (-r - a4, r + a4)],
            dtype=np.int64))
        rects.append(np.array(
            [(r + a2, r + a4), (r + a2, -r), (r + a4, -r), (r + a4, r + a4)], dtype=np.int64))
        r += a4
        rects.append(romb(-r, r, a2))
        rects.append(romb(-r, -r, a2))
        rects.append(romb(r - a2, a4 - r, a2))
        rects.append(romb(r - a2, r, a2))
    return rects


def canon(shapes):
    """Canonical form for cross-strategy equality: per ring, rotate to the
    lexicographically-least vertex; sort rings within a shape and shapes."""
    out = []
    for shape in shapes:
        rings = []
        for ring in shape:
            pts = [tuple(map(int, p)) for p in ring]
            k = min(range(len(pts)), key=lambda i: pts[i])
            rings.append(tuple(pts[k:] + pts[:k]))
        out.append(tuple(sorted(rings)))
    return sorted(out)


def batch_overlay(subj, clip, rule, fill):
    res = overlay_batch([(subj, clip)], [rule], fill)
    return res[0][rule]


CASES = {
    "many_squares": lambda n: (
        many_squares(0, 0, 20, 30, n),
        many_squares(15, 15, 20, 30, n - 1),
        OverlayRule.XOR,
    ),
    "no_overlap": lambda n: (
        repeat_xy(square(0, 0, 2), 0, 0, 10, 10, n),
        repeat_xy(romb(0, 0, 4), 5, 5, 10, 10, n - 1),
        OverlayRule.XOR,
    ),
    "many_lines": lambda n: (
        many_lines_x(20, n),
        many_lines_y(20, n),
        OverlayRule.INTERSECT,
    ),
    "spiral": lambda n: (discrete_spiral(n, 4), [], OverlayRule.SUBJECT),
}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("n", [12, 25])
def test_strategies_agree_kernel_vs_batch(name, n):
    subj, clip, rule = CASES[name](n)
    scalar = overlay(subj, clip, rule, NZ)
    batched = batch_overlay(subj, clip, rule, NZ)
    assert canon(scalar) == canon(batched)
    if name == "no_overlap":
        assert len(scalar) == n * n + (n - 1) * (n - 1)


@pytest.mark.parametrize("name", sorted(CASES))
def test_strategies_agree_distributed(spark, name):
    n = 12
    subj, clip, rule = CASES[name](n)
    from ioverlay_spark.operators.distributed import (
        contours_to_segments_df,
        distributed_overlay,
    )

    rows = [("subject", i, [int(p[0]) for p in r], [int(p[1]) for p in r])
            for i, r in enumerate(subj)]
    rows += [("clip", len(subj) + i, [int(p[0]) for p in r], [int(p[1]) for p in r])
             for i, r in enumerate(clip)]
    df = spark.createDataFrame(rows, ["role", "cid", "pts_x", "pts_y"])
    out = distributed_overlay(
        contours_to_segments_df(spark, df), rule, NZ, force_distributed=True
    ).toPandas()
    scalar = overlay(subj, clip, rule, NZ)
    exp = sorted(
        abs(int(__import__("ioverlay_spark.kernel.extract", fromlist=["ring_area2"])
                .ring_area2(r)))
        for shape in scalar for r in shape
    )
    got = sorted(abs(int(a)) for a in out["area2"].tolist())
    assert got == exp