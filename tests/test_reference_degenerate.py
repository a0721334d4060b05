"""Ports of the reference's degenerate/edge-case suites (VERDICT round-1 item 10):
iOverlay/tests/empty_tests.rs, direction_tests.rs, fill_rule_tests.rs,
crash_tests.rs (+ a small dynamic star sweep). The boolean golden fixtures cover
the happy paths; these cover empty/degenerate/direction semantics."""

import numpy as np
import pytest

from ioverlay_spark.kernel import overlay, simplify
from ioverlay_spark.kernel.extract import ring_area2
from ioverlay_spark.options import (
    ContourDirection,
    FillRule,
    OverlayOptions,
    OverlayRule,
)


def ring(*pts):
    return np.array(pts, dtype=np.int64)


# ---------------------------------------------------------------------- empty


def test_empty_single_point_contour():
    # iOverlay/tests/empty_tests.rs test_00: 1-point contour -> no graph
    assert overlay([ring((0, 0))], [], OverlayRule.SUBJECT, FillRule.NON_ZERO) == []


def test_empty_two_point_contour():
    # empty_tests.rs test_01: 2-point (degenerate) contour -> no graph
    assert (
        overlay([ring((0, 0), (1, 0))], [], OverlayRule.SUBJECT, FillRule.NON_ZERO)
        == []
    )


def test_empty_both_sides():
    assert overlay([], [], OverlayRule.UNION, FillRule.EVEN_ODD) == []


# ------------------------------------------------------------------ direction


def _diamond(r):
    return ring((-r, 0), (0, -r), (r, 0), (0, r))


def test_direction_simplify_output_orientation():
    # direction_tests.rs test_0
    ccw = OverlayOptions(output_direction=ContourDirection.COUNTER_CLOCKWISE)
    cw = OverlayOptions(output_direction=ContourDirection.CLOCKWISE)
    r0 = simplify([_diamond(5)], FillRule.NON_ZERO, ccw)[0][0]
    assert ring_area2(r0) > 0
    r1 = simplify([_diamond(5)], FillRule.NON_ZERO, cw)[0][0]
    assert ring_area2(r1) < 0


def test_direction_hole_orientation():
    # direction_tests.rs test_1: outer diamond + reversed inner diamond (hole)
    outer = _diamond(10)
    inner = ring((-5, 0), (0, 5), (5, 0), (0, -5))  # opposite winding
    ccw = OverlayOptions(output_direction=ContourDirection.COUNTER_CLOCKWISE)
    cw = OverlayOptions(output_direction=ContourDirection.CLOCKWISE)
    r0 = simplify([outer, inner], FillRule.NON_ZERO, ccw)[0]
    assert ring_area2(r0[0]) > 0 and ring_area2(r0[1]) < 0
    r1 = simplify([outer, inner], FillRule.NON_ZERO, cw)[0]
    assert ring_area2(r1[0]) < 0 and ring_area2(r1[1]) > 0


def test_direction_default_overlay():
    # direction_tests.rs test_2: default = CCW hulls, CW holes
    outer = _diamond(10)
    inner = ring((-5, 0), (0, 5), (5, 0), (0, -5))
    r = overlay([outer, inner], [], OverlayRule.SUBJECT, FillRule.NON_ZERO)
    assert ring_area2(r[0][0]) > 0 and ring_area2(r[0][1]) < 0


# ------------------------------------------------------------------ fill rules


def _square(radius, clockwise):
    pts = [(-radius, -radius), (-radius, radius), (radius, radius), (radius, -radius)]
    if not clockwise:
        pts = pts[::-1]
    return ring(*pts)


def _counts(shapes):
    return (len(shapes), [len(s) for s in shapes])


@pytest.mark.parametrize(
    "outer_cw,inner_cw,expect",
    [
        # fill_rule_tests.rs test_both_clock_wise
        (True, True, {"even_odd": (1, [2]), "non_zero": (1, [1]),
                      "negative": (1, [1]), "positive": (0, [])}),
        # test_both_counter_clock_wise
        (False, False, {"even_odd": (1, [2]), "non_zero": (1, [1]),
                        "negative": (0, []), "positive": (1, [1])}),
        # test_cw_and_ccw
        (True, False, {"even_odd": (1, [2]), "non_zero": (1, [2]),
                       "negative": (1, [2]), "positive": (0, [])}),
        # test_ccw_and_cw
        (False, True, {"even_odd": (1, [2]), "non_zero": (1, [2]),
                       "negative": (0, []), "positive": (1, [2])}),
    ],
)
def test_fill_rules_winding_combinations(outer_cw, inner_cw, expect):
    subj = [_square(10, outer_cw), _square(5, inner_cw)]
    for rule_name, want in expect.items():
        got = overlay(subj, [], OverlayRule.SUBJECT, FillRule(rule_name))
        assert _counts(got) == want, f"{rule_name}: {_counts(got)} != {want}"


# ---------------------------------------------------------------------- crash


def test_crash_00_triangles_through_origin():
    # crash_tests.rs test_00 / test_02: self-intersecting triangle fans
    subj = [
        ring((0, 0), (0, 4), (3, -5)),
        ring((0, 0), (1, 7), (2, -8)),
        ring((0, 0), (4, -4), (5, 7)),
    ]
    r = overlay(subj, [], OverlayRule.SUBJECT, FillRule.NON_ZERO)
    assert len(r) > 0


def test_crash_02_triangle_fan_variant():
    subj = [
        ring((0, 0), (1, 6), (6, 4)),
        ring((0, 0), (6, 5), (2, -2)),
        ring((0, 0), (3, -1), (1, 3)),
    ]
    r = overlay(subj, [], OverlayRule.SUBJECT, FillRule.NON_ZERO)
    assert len(r) > 0
    # batched kernel must agree with the scalar kernel on this degenerate input
    from ioverlay_spark.kernel.batch import overlay_batch

    batch = overlay_batch([(subj, []), (subj, [])], [OverlayRule.SUBJECT], FillRule.NON_ZERO)
    for res in batch:
        got = sorted(
            sorted(tuple(map(tuple, rg.tolist())) for rg in sh)
            for sh in res[OverlayRule.SUBJECT]
        )
        want = sorted(
            sorted(tuple(map(tuple, rg.tolist())) for rg in sh) for sh in r
        )
        assert got == want


@pytest.mark.parametrize(
    "pts",
    [
        [(3, 4), (5, 0), (3, 3), (4, 2), (5, -2)],  # crash_tests test_03
        [(-4, -2), (1, -3), (-1, 3), (1, -4), (4, -3)],  # crash_tests test_04
    ],
)
def test_crash_self_crossing_paths_no_panic(pts):
    r = overlay([ring(*pts)], [], OverlayRule.SUBJECT, FillRule.NON_ZERO)
    # result may be empty or not; the requirement is robust termination +
    # valid ring structure
    for shape in r:
        for rg in shape:
            assert len(rg) >= 3


def test_crash_05_float_sliver_ogc():
    # crash_tests.rs test_05: float slivers at scale 50k through the OGC path
    subj = [
        [
            (24902.9222201258, 11129.9683052215),
            (24821.9592401258, 11107.1269052215),
            (24902.9218201258, 11129.9681852215),
            (24898.9601001258, 11128.8505052215),
        ],
        [
            (20094.9253001258, 12125.6660652215),
            (20094.9253001258, 12125.6647652215),
            (29795.5156201258, 10942.5275852215),
        ],
        [
            (24902.2200401258, 11129.7702052215),
            (24902.3098801258, 11129.7955452215),
            (24902.4788601258, 11129.8432252215),
        ],
        [
            (24902.4819801258, 11129.8441052215),
            (24902.4832001258, 11129.8444452215),
            (24902.4821401258, 11129.8441452215),
        ],
    ]
    scale = 50_000.0

    def quant(v):
        # half away from zero, matching the adapter
        return int(np.floor(abs(v) * scale + 0.5)) * (1 if v >= 0 else -1)

    rings = [ring(*[(quant(x), quant(y)) for x, y in path]) for path in subj]
    from ioverlay_spark.kernel import build_graph
    from ioverlay_spark.kernel.extract import extract_shapes_ogc

    opts = OverlayOptions(preserve_output_collinear=True)
    g = build_graph(rings, [], FillRule.NON_ZERO, opts)
    r = extract_shapes_ogc(g.segments, g.fills, OverlayRule.SUBJECT, opts)
    for shape in r:
        for rg in shape:
            assert len(rg) >= 3


def test_crash_06_self_touching_hole_with_tail():
    # crash_tests.rs test_06
    subj = [
        ring((0, 0), (8, 0), (8, 8), (0, 8)),
        ring((2, 2), (2, 6), (6, 6), (6, 2), (2, 2), (5, 3), (3, 5)),
        ring((10, 0), (12, 0), (12, 2), (10, 2)),
    ]
    r = simplify(subj, FillRule.NON_ZERO)
    assert len(r) == 2


# --------------------------------------------------------------- dynamic stars


def _star(cx, cy, r1, r2, n, angle):
    pts = []
    for i in range(2 * n):
        r = r1 if i % 2 == 0 else r2
        a = angle + np.pi * i / n
        pts.append((int(round(cx + r * np.cos(a))), int(round(cy + r * np.sin(a)))))
    return ring(*pts)


@pytest.mark.parametrize("steps", [11])
def test_dynamic_rotating_star_union(steps):
    # dynamic_tests.rs flavor: rotating stars vs a fixed star, union must stay
    # non-empty and structurally valid across dense angles
    fixed = _star(0, 0, 1000, 500, 7, 0.0)
    for k in range(steps):
        ang = 2 * np.pi * k / steps / 7
        rot = _star(0, 0, 1000, 500, 7, ang)
        shapes = overlay([fixed], [rot], OverlayRule.UNION, FillRule.EVEN_ODD)
        assert shapes, f"angle step {k} produced empty union"
        total = sum(ring_area2(rg) for sh in shapes for rg in sh)
        # union area >= each input's area (property invariant)
        assert total >= abs(ring_area2(fixed))


# ------------------------------------------------------------------- simplify
# ports of iOverlay/tests/simplify_tests.rs


def test_simplify_0_tiny_rect_collinear_preserved():
    opts = OverlayOptions(preserve_input_collinear=True, preserve_output_collinear=True)
    r = simplify(
        [ring((10614, 4421), (10609, 4421), (10609, 4415), (10614, 4415))],
        FillRule.NON_ZERO,
        opts,
    )
    assert len(r) == 1 and len(r[0]) == 1


def _sq(px, py):
    return ring((-5 + px, -5 + py), (-5 + px, 5 + py), (5 + px, 5 + py), (5 + px, -5 + py))


def test_simplify_1_ring_of_squares_makes_donut():
    # 8 squares around a missing center: union = one shape with one hole
    opts = OverlayOptions(preserve_input_collinear=True, preserve_output_collinear=True)
    rings = [
        _sq(-10, -10), _sq(-10, 0), _sq(-10, 10), _sq(0, -10),
        _sq(0, 10), _sq(10, -10), _sq(10, 0), _sq(10, 10),
    ]
    r = simplify(rings, FillRule.NON_ZERO, opts)
    assert len(r) == 1 and len(r[0]) == 2


def test_simplify_3_self_crossing_bowtie():
    r = overlay(
        [ring((0, 0), (3, 1), (0, 3), (3, 0))], [], OverlayRule.SUBJECT, FillRule.NON_ZERO
    )
    assert len(r) == 1 and len(r[0]) == 1


def test_simplify_4_touching_triangles_merge():
    opts = OverlayOptions(preserve_output_collinear=True)
    r = simplify(
        [
            ring((-5, 0), (0, 0), (0, 5)),
            ring((-3, 2), (-1, 2), (-1, 1)),
        ],
        FillRule.NON_ZERO,
        opts,
    )
    assert len(r) == 1 and len(r[0]) == 1
    assert len(r[0][0]) == 7
