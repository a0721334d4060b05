"""Ports of the reference slice suite (iOverlay/tests/slice_tests.rs): structural
assertions (shape/ring counts, sometimes ring sizes) for slicing by lines, paths
and windows, plus a seeded version of its randomized degenerate sweeps."""

import numpy as np
import pytest

from ioverlay_spark.kernel.string_ops import slice_shape
from ioverlay_spark.options import FillRule

NZ = FillRule.NON_ZERO


def ring(*pts):
    return np.array(pts, dtype=np.int64)


def counts(shapes):
    return (len(shapes), sorted((len(s) for s in shapes), reverse=True))


SQUARE10 = ring((10, -10), (10, 10), (-10, 10), (-10, -10))
SQUARE10_CCW = ring((-10, -10), (-10, 10), (10, 10), (10, -10))


def test_miss_slice():
    r = slice_shape([SQUARE10], [ring((-15, -20), (-15, 20))], NZ)
    assert counts(r) == (1, [1])


def test_edge_slice():
    r = slice_shape([SQUARE10], [ring((-10, -20), (-10, 20))], NZ)
    assert counts(r) == (1, [1])


def test_inside_slice():
    r = slice_shape([SQUARE10], [ring((0, -5), (0, 5))], NZ)
    assert counts(r) == (1, [1])


def test_middle_slice():
    r = slice_shape([SQUARE10_CCW], [ring((0, -20), (0, 20))], NZ)
    assert counts(r) == (2, [1, 1])


def test_cross_slice():
    r = slice_shape(
        [SQUARE10_CCW], [ring((0, -20), (0, 20)), ring((-20, 0), (20, 0))], NZ
    )
    assert counts(r) == (4, [1, 1, 1, 1])


def test_cross_inside_slice():
    r = slice_shape(
        [SQUARE10_CCW], [ring((0, -5), (0, 5)), ring((-5, 0), (5, 0))], NZ
    )
    assert counts(r) == (1, [1])


def test_window():
    window = ring((-5, -5), (-5, 5), (5, 5), (5, -5), (-5, -5))
    r = slice_shape([SQUARE10], [window], NZ)
    assert counts(r) == (2, [2, 1])


def test_2_windows():
    body = ring((15, -15), (15, 15), (-15, 15), (-15, -15))
    w0 = ring((-10, -10), (-10, 10), (10, 10), (10, -10), (-10, -10))
    w1 = ring((-5, -5), (-5, 5), (5, 5), (5, -5), (-5, -5))
    r = slice_shape([body], [w0, w1], NZ)
    assert counts(r) == (3, [2, 2, 1])


def test_ideal_triangle():
    tri = [ring((-5, 0), (5, 0)), ring((-5, 0), (0, 5)), ring((5, 0), (0, 5))]
    r = slice_shape([SQUARE10_CCW], tri, NZ)
    assert counts(r) == (2, [2, 1])


def test_not_ideal_triangle():
    tri = [ring((-7, 0), (7, 0)), ring((-5, 0), (0, 5)), ring((5, 0), (0, 5))]
    r = slice_shape([SQUARE10_CCW], tri, NZ)
    assert counts(r) == (2, [2, 1])


def test_bridge_to_triangle_0():
    body = ring((-4, -4), (-4, 4), (4, 4), (4, -4))
    tri = [
        ring((0, 2), (0, 1)),
        ring((-1, -1), (0, 1)),
        ring((-1, -1), (1, -1)),
        ring((0, 1), (1, -1)),
    ]
    r = slice_shape([body], tri, NZ)
    assert counts(r) == (2, [2, 1])


def test_bridge_to_triangle_1():
    body = ring((-2, -2), (-2, 2), (2, 2), (2, -2))
    tri = [
        ring((-2, -2), (-1, -1)),
        ring((-1, -1), (0, 1)),
        ring((-1, -1), (1, -1)),
        ring((0, 1), (1, -1)),
    ]
    r = slice_shape([body], tri, NZ)
    assert counts(r) == (2, [2, 1])


def test_join_to_hole():
    shape = [
        ring((-3, -2), (-3, 2), (3, 2), (3, -2)),
        ring((0, -1), (1, -1), (1, 1), (0, 1)),
    ]
    tri = [
        ring((-2, -1), (0, 0)),
        ring((-2, 1), (0, 0)),
        ring((-2, -1), (-2, 1)),
    ]
    r = slice_shape(shape, tri, NZ)
    assert counts(r) == (2, [3, 1])


def test_tiny_0():
    r = slice_shape(
        [ring((2, -2), (0, -1), (1, 2))], [ring((2, 1), (-1, -2))], NZ
    )
    assert counts(r) == (2, [1, 1])


def test_tiny_1():
    r = slice_shape(
        [ring((0, 2), (0, -1), (-1, -2))],
        [ring((-1, -2), (-1, -1)), ring((1, -1), (-2, -1))],
        NZ,
    )
    assert counts(r) == (3, [1, 1, 1])


def test_tiny_2():
    r = slice_shape(
        [ring((1, 4), (-4, 4), (-2, -4))],
        [ring((1, 4), (-2, 2)), ring((-4, 4), (3, 3)), ring((-2, 2), (-2, 1))],
        NZ,
    )
    assert counts(r) == (2, [1, 1])
    sizes = sorted(len(s[0]) for s in r)
    assert sizes == [3, 4]


def test_tiny_3():
    r = slice_shape(
        [ring((-4, -2), (2, 2), (3, -3))],
        [
            ring((-1, -2), (1, 0)),
            ring((-2, -2), (3, -1)),
            ring((-2, -4), (2, -1)),
        ],
        NZ,
    )
    assert counts(r) == (2, [1, 1])


def test_tiny_4():
    r = slice_shape(
        [ring((4, 0), (0, -3), (-1, 3), (3, 4))],
        [
            ring((0, 3), (0, -1)),
            ring((1, -2), (1, 2)),
            ring((-1, 3), (3, 0)),
            ring((2, 2), (0, -1)),
        ],
        NZ,
    )
    assert counts(r) == (2, [2, 1])
    shp = max(r, key=len)
    assert sorted(len(p) for p in shp) == [4, 4]


def test_tiny_5_degenerate_body():
    # collinear 3-point "polygon": nothing to slice
    r = slice_shape(
        [ring((1, -1), (-1, -1), (-2, -1))],
        [ring((1, 1), (0, 0)), ring((-1, -1), (2, 2))],
        NZ,
    )
    assert counts(r) == (0, [])


@pytest.mark.parametrize("radius,n_pts,n_lines,iters", [(5, 3, 1, 800), (8, 3, 3, 800), (8, 8, 8, 400)])
def test_random_degenerate_sweep(radius, n_pts, n_lines, iters):
    """Seeded port of slice_tests.rs test_random_*: tiny random polygons sliced by
    tiny random lines must terminate with structurally valid output."""
    rng = np.random.default_rng(radius * 1000 + n_pts * 10 + n_lines)
    a = radius // 2
    for _ in range(iters):
        body = rng.integers(-a, a + 1, size=(n_pts, 2)).astype(np.int64)
        lines = [
            rng.integers(-a, a + 1, size=(2, 2)).astype(np.int64)
            for _ in range(n_lines)
        ]
        shapes = slice_shape([body], lines, NZ)
        for shape in shapes:
            assert len(shape) >= 1
            for path in shape:
                assert len(path) > 2
