"""Port of the reference OGC suite (iOverlay/tests/ocg_tests.rs, 19 test fns):
fixed pinch-point fixtures (tests 0-11 + inverts), the two checkerboard sweeps,
and seeded versions of the randomized grid-hole / self-intersection sweeps.

The reference asserts shapes positionally; extraction order is an
implementation detail, so the port compares the SORTED structure multiset
(per-shape ring counts and ring lengths) — the same geometric claim.

OGC semantics (ISO 19125-1): the interior of every surface is a connected point
set — shapes touching only at pinch vertices split into separate polygons
(extract_ogc, iOverlay/src/core/extract_ogc.rs:19-350)."""

from __future__ import annotations

import numpy as np
import pytest

from ioverlay_spark.kernel.extract import extract_shapes_ogc, ring_area2
from ioverlay_spark.kernel.overlay import build_graph
from ioverlay_spark.options import ContourDirection, FillRule, OverlayOptions, OverlayRule

EO = FillRule.EVEN_ODD
NZ = FillRule.NON_ZERO


def P(*pts):
    return np.array(pts, dtype=np.int64)


def ogc_overlay(subj, clip, rule, fill_rule, options=OverlayOptions()):
    g = build_graph(subj, clip, fill_rule, options)
    return extract_shapes_ogc(g.segments, g.fills, rule, options)


def structure(shapes):
    """Sorted (n_rings, sorted ring lengths desc) per shape — order-free."""
    return sorted(
        ((len(s), sorted((len(r) for r in s), reverse=True)) for s in shapes),
        reverse=True,
    )


# --- fixed fixtures -----------------------------------------------------------


def _l_holes_case(options):
    subj = [P((0, 0), (5, 0), (5, 5), (0, 5))]
    clip = [
        P((1, 2), (1, 4), (3, 4), (3, 3), (2, 3), (2, 2)),
        P((2, 1), (2, 2), (3, 2), (3, 3), (4, 3), (4, 1)),
    ]
    return ogc_overlay(subj, clip, OverlayRule.DIFFERENCE, EO, options)


def test_0_shared_vertex_l_holes():
    r = _l_holes_case(OverlayOptions())
    assert structure(r) == [(2, [8, 4]), (1, [4])]


def test_0_invert_direction():
    r = _l_holes_case(OverlayOptions(output_direction=ContourDirection.CLOCKWISE))
    assert structure(r) == [(2, [8, 4]), (1, [4])]
    # CW output: hulls negative shoelace, holes positive
    for shape in r:
        assert ring_area2(shape[0]) < 0
        for hole in shape[1:]:
            assert ring_area2(hole) > 0


def test_1_diamond_of_squares():
    subj = [P((0, 0), (5, 0), (5, 5), (0, 5))]
    clip = [
        P((1, 2), (1, 3), (2, 3), (2, 2)),
        P((2, 1), (2, 2), (3, 2), (3, 1)),
        P((2, 3), (2, 4), (3, 4), (3, 3)),
        P((3, 2), (3, 3), (4, 3), (4, 2)),
    ]
    r = ogc_overlay(subj, clip, OverlayRule.DIFFERENCE, EO)
    assert structure(r) == [(2, [12, 4]), (1, [4])]


def test_2_diagonal_hole_chain():
    subj = [P((0, 0), (7, 0), (7, 7), (0, 7))]
    clip = [
        P((1, 3), (1, 4), (2, 4), (2, 3)),
        P((2, 2), (2, 3), (3, 3), (3, 2)),
        P((2, 4), (2, 5), (3, 5), (3, 4)),
        P((3, 1), (3, 2), (4, 2), (4, 1)),
        P((3, 3), (3, 4), (4, 4), (4, 3)),
        P((3, 5), (3, 6), (4, 6), (4, 5)),
        P((4, 2), (4, 3), (5, 3), (5, 2)),
        P((4, 4), (4, 5), (5, 5), (5, 4)),
        P((5, 3), (5, 4), (6, 4), (6, 3)),
    ]
    r = ogc_overlay(subj, clip, OverlayRule.DIFFERENCE, EO)
    assert len(r) == 5
    assert sorted(len(s) for s in r) == [1, 1, 1, 1, 2]


def test_3_self_touching_union():
    subj = [P((0, 3), (0, 0), (3, 0), (3, 2), (1, 2), (1, 1), (2, 1), (2, 3))]
    r = ogc_overlay(subj, [], OverlayRule.UNION, EO)
    assert structure(r) == [(2, [6, 4])]


def test_4_stair_holes_touching_boundary():
    subj = [P((0, 4), (0, 0), (4, 0), (4, 3), (3, 3), (3, 4))]
    clip = [P((1, 2), (1, 1), (2, 1), (2, 2)), P((2, 3), (2, 2), (3, 2), (3, 3))]
    r = ogc_overlay(subj, clip, OverlayRule.DIFFERENCE, EO)
    assert structure(r) == [(3, [6, 4, 4])]


def _stair_holes(options):
    subj = [P((0, 4), (0, 0), (4, 0), (4, 4))]
    clip = [P((1, 2), (1, 1), (2, 1), (2, 2)), P((2, 3), (2, 2), (3, 2), (3, 3))]
    return ogc_overlay(subj, clip, OverlayRule.DIFFERENCE, EO, options)


def test_5_stair_holes_interior():
    assert structure(_stair_holes(OverlayOptions())) == [(3, [4, 4, 4])]


def test_5_invert_direction():
    r = _stair_holes(OverlayOptions(output_direction=ContourDirection.CLOCKWISE))
    assert structure(r) == [(3, [4, 4, 4])]
    for shape in r:
        assert ring_area2(shape[0]) < 0


def test_6_boundary_notch_holes():
    subj = [P((0, 3), (0, 0), (5, 0), (5, 3), (3, 3), (3, 2), (2, 2), (2, 3))]
    clip = [P((1, 2), (1, 1), (2, 1), (2, 2)), P((3, 2), (3, 1), (4, 1), (4, 2))]
    r = ogc_overlay(subj, clip, OverlayRule.DIFFERENCE, EO)
    assert structure(r) == [(3, [8, 4, 4])]


def test_7_plus_of_squares_splits():
    subj = [
        P((0, 2), (0, 1), (1, 1), (1, 2)),
        P((2, 2), (2, 1), (3, 1), (3, 2)),
        P((1, 1), (1, 0), (2, 0), (2, 1)),
        P((1, 3), (1, 2), (2, 2), (2, 3)),
    ]
    r = ogc_overlay(subj, [], OverlayRule.UNION, EO)
    assert structure(r) == [(1, [4])] * 4


def test_8_ring_of_squares_union():
    subj = [
        P(
            (0, 4), (0, 0), (5, 0), (5, 4), (3, 4), (3, 3), (4, 3), (4, 2),
            (3, 2), (3, 1), (2, 1), (2, 2), (1, 2), (1, 3), (2, 3), (2, 4),
        )
    ]
    clip = [P((2, 3), (2, 2), (3, 2), (3, 3))]
    r = ogc_overlay(subj, clip, OverlayRule.UNION, EO)
    assert structure(r) == [(1, [16]), (1, [4])]


def test_9_pinwheel_self_union():
    subj = [
        P((-3, 0), (-3, -3), (0, -3), (0, 0), (3, 0), (3, 3), (0, 3), (0, 0)),
        P((-1, -2), (-2, -1), (0, 0), (1, 2), (2, 1), (0, 0)),
    ]
    r = ogc_overlay(subj, [], OverlayRule.UNION, EO)
    assert structure(r) == [(2, [4, 3]), (2, [4, 3])]


def test_10_fan_non_zero():
    subj = [
        P((0, 0), (-6, 2), (-2, -6)),
        P((-3, 0), (0, 0), (-3, -1)),
        P((0, 0), (4, -6), (4, 6)),
    ]
    r = ogc_overlay(subj, [], OverlayRule.UNION, NZ)
    assert sorted(len(s) for s in r) == [1, 2]


def test_11_four_petals_with_holes():
    subj = [
        P(
            (-5, 5), (-4, 1), (0, 0), (-4, -1), (-5, -5), (0, 0),
            (5, -5), (4, -1), (0, 0), (4, 1), (5, 5), (0, 0),
        ),
        P(
            (-3, -2), (-3, -1), (0, 0), (-3, 1), (-3, 2), (0, 0),
            (3, 2), (3, 1), (0, 0), (3, -1), (3, -2), (0, 0),
        ),
    ]
    r = ogc_overlay(subj, [], OverlayRule.UNION, NZ)
    assert structure(r) == [(2, [3, 3])] * 4


# --- checkerboard sweeps ------------------------------------------------------


@pytest.mark.parametrize("n", list(range(4, 21)))
def test_checkerboard_a(n):
    # frame + n vertical and n horizontal 1-wide lines: the subject grid of
    # touching squares must split into n^2 + (n-1)^2 separate polygons + frame
    m = n
    x0 = y0 = 1
    x1 = y1 = 2 * (m + 1)
    subj = [P((x0 - 1, y1 + 1), (x0 - 1, y0 - 1), (x1 + 1, y0 - 1), (x1 + 1, y1 + 1))]
    for i in range(m):
        x = 2 * (i + 1)
        subj.append(P((x, y0), (x, y1), (x + 1, y1), (x + 1, y0)))
        y = 2 * (i + 1)
        subj.append(P((x0, y), (x0, y + 1), (x1, y + 1), (x1, y)))
    r = ogc_overlay(subj, [], OverlayRule.SUBJECT, EO)
    assert len(r) == n * n + (n - 1) * (n - 1) + 1
    assert sorted(len(s) for s in r)[-1] == 2  # exactly one shape has the hole


@pytest.mark.parametrize("n", list(range(3, 21)))
def test_checkerboard_b(n):
    m = n
    x0 = y0 = 1
    x1 = y1 = 2 * m
    subj = [P((x0 - 1, y1 + 1), (x0 - 1, y0 - 1), (x1 + 1, y0 - 1), (x1 + 1, y1 + 1))]
    y = y0
    for i in range(2 * m - 1):
        x = x0 + (i & 1)
        while x < x1:
            subj.append(P((x, y + 1), (x, y), (x + 1, y), (x + 1, y + 1)))
            x += 2
        y += 1
    r = ogc_overlay(subj, [], OverlayRule.SUBJECT, EO)
    a = 2 * n - 3
    assert len(r) == a * a // 2 + 1
    mains = [s for s in r if len(s) > 1]
    assert len(mains) == 1
    assert len(mains[0]) == 6


# --- seeded randomized sweeps -------------------------------------------------

_M64 = (1 << 64) - 1


class GridRng:
    """The reference suite's deterministic LCG (ocg_tests.rs GridRng)."""

    def __init__(self, seed: int):
        self.state = (seed ^ 0xA076_1D64_78BD_642F) & _M64

    def next_u32(self) -> int:
        self.state = (self.state * 0xE703_7ED1_A0B4_28DB + 0x8EBC_6AF0_9C88_C6E3) & _M64
        return (self.state >> 32) & 0xFFFFFFFF

    def percent(self, value: int) -> bool:
        return self.next_u32() % 100 < value

    def range_i32(self, lo: int, hi: int) -> int:
        return lo + self.next_u32() % (hi - lo + 1)

    def range_usize(self, lo: int, hi: int) -> int:
        return lo + self.next_u32() % (hi - lo + 1)

    def unit_f64(self) -> float:
        return self.next_u32() / 0xFFFFFFFF


def _remaining_components(n: int, clipped: list[bool]) -> int:
    visited = [False] * (n * n)
    comps = 0
    for start in range(n * n):
        if clipped[start] or visited[start]:
            continue
        comps += 1
        visited[start] = True
        stack = [start]
        while stack:
            idx = stack.pop()
            x, y = idx % n, idx // n
            for nb in (
                [idx - 1] * (x > 0) + [idx + 1] * (x + 1 < n)
                + [idx - n] * (y > 0) + [idx + n] * (y + 1 < n)
            ):
                if not clipped[nb] and not visited[nb]:
                    visited[nb] = True
                    stack.append(nb)
    return comps


def _rect(x0, y0, x1, y1):
    return P((x0, y0), (x1, y0), (x1, y1), (x0, y1))


def _random_grid_holes(seed: int, n: int, fill_percent: int):
    rng = GridRng(seed)
    clipped = [rng.percent(fill_percent) for _ in range(n * n)]
    cnt = sum(clipped)
    if cnt == 0 or cnt == n * n:
        return
    expected = _remaining_components(n, clipped)
    subj = [_rect(0, 0, n, n)]
    clip = [
        _rect(x, y, x + 1, y + 1)
        for y in range(n)
        for x in range(n)
        if clipped[y * n + x]
    ]
    r = ogc_overlay(subj, clip, OverlayRule.DIFFERENCE, EO)
    assert len(r) == expected, f"seed={seed} n={n} fill={fill_percent}"


@pytest.mark.parametrize("seed", list(range(48)))
def test_random_grid_holes(seed):
    # seeded port of the reference's 256-seed sweep (48 seeds x 3 sizes here;
    # connectivity oracle = 4-connected component count of uncovered cells)
    _random_grid_holes(seed, 8, 35)
    _random_grid_holes(seed ^ 0x9E37_79B9_7F4A_7C15, 10, 45)
    _random_grid_holes(seed ^ 0xD1B5_4A32_D192_ED03, 12, 55)


def _random_star(rng: GridRng, center_abs: int, rmin: int, rmax: int) -> np.ndarray:
    import math

    def gcd(a, b):
        while b:
            a, b = b, a % b
        return a

    n = 9 + 2 * rng.range_usize(0, 5)
    step = rng.range_usize(2, n // 2)
    while gcd(n, step) != 1:
        step += 1
        if step >= n // 2:
            step = 2
    cx = rng.range_i32(-center_abs, center_abs)
    cy = rng.range_i32(-center_abs, center_abs)
    radius = float(rng.range_i32(rmin, rmax))
    shift = rng.unit_f64() * 2 * math.pi
    pts = []
    for i in range(n):
        aj = (rng.unit_f64() - 0.5) * 0.18
        rj = 0.72 + rng.unit_f64() * 0.56
        ang = shift + 2 * math.pi * i / n + aj
        rr = radius * rj
        pts.append((cx + round(rr * math.cos(ang)), cy + round(rr * math.sin(ang))))
    return P(*[pts[(i * step) % n] for i in range(n)])


def _shapes_area(shapes) -> int:
    return sum(
        abs(abs(ring_area2(s[0])) - sum(abs(ring_area2(h)) for h in s[1:]))
        for s in shapes
    )


def _random_self_intersections(seed: int, n_contours: int, n_holes: int):
    rng = GridRng(seed)
    subj = [_random_star(rng, 760, 260, 640) for _ in range(n_contours)]
    clip = [_random_star(rng, 680, 60, 220) for _ in range(n_holes)]
    r = ogc_overlay(subj, clip, OverlayRule.DIFFERENCE, EO)
    flat = [ring for shape in r for ring in shape]
    normalized = ogc_overlay(flat, [], OverlayRule.UNION, EO)
    a_r, a_n = _shapes_area(r), _shapes_area(normalized)
    tol = max(20_000, max(a_r, a_n) // 5)
    assert abs(a_r - a_n) <= tol, f"seed={seed}: {a_r} vs {a_n}"
    for shape in r:
        assert shape
        for contour in shape:
            assert len(contour) >= 3


@pytest.mark.parametrize("seed", list(range(16)))
def test_random_self_intersections(seed):
    # seeded port of the reference's 128-seed sweep (16 seeds x 3 shapes here)
    _random_self_intersections(seed, 1, 12)
    _random_self_intersections(seed ^ 0x9E37_79B9_7F4A_7C15, 2, 20)
    _random_self_intersections(seed ^ 0xD1B5_4A32_D192_ED03, 3, 28)