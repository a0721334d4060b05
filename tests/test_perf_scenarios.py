"""Correctness oracles for the six reference perf scenarios not yet audited
end-to-end (performance/rust_app/src/test/test_{1,4,5,6,7,8}_*.rs — checkerboard,
lines_net and spiral already have their own audited paths).

Closed-form oracles where the geometry admits one (not_overlap, windows,
nested_squares, wind_mill's reference-validated shape count), plus the engine's
area-partition identities (difference + intersect = subject; xor = union -
intersect) for the float scenarios, evaluated at small n so the whole module
stays fast."""

import numpy as np
import pytest

from ioverlay_spark import scenarios
from ioverlay_spark.kernel import overlay, ring_area2, simplify
from ioverlay_spark.functions.float_shell import float_overlay
from ioverlay_spark.options import FillRule, OverlayRule


def total_area2(shapes):
    return sum(ring_area2(r) for s in shapes for r in s)


def ring_count(shapes):
    return sum(len(s) for s in shapes)


class TestNotOverlap:
    @pytest.mark.parametrize("n", [2, 5, 16])
    def test_union_is_identity(self, n):
        subj, clip = scenarios.not_overlap(n)
        shapes = overlay(subj, clip, OverlayRule.UNION, FillRule.NON_ZERO)
        expect = n * n + (n - 1) * (n - 1)
        assert len(shapes) == expect
        assert ring_count(shapes) == expect  # no holes
        # every output ring is one untouched 10x10 square
        assert all(ring_area2(s[0]) == 200 for s in shapes)


class TestWindows:
    @pytest.mark.parametrize("n", [1, 3, 8])
    def test_difference_keeps_frames(self, n):
        subj, clip = scenarios.windows(n)
        shapes = overlay(subj, clip, OverlayRule.DIFFERENCE, FillRule.NON_ZERO)
        assert len(shapes) == n * n
        # each frame: 20x20 outer (area2=800) + 10x10 cutout (area2=-200)
        for s in shapes:
            assert len(s) == 2
            assert ring_area2(s[0]) == 800
            assert ring_area2(s[1]) == -200
        assert total_area2(shapes) == 600 * n * n


class TestNestedSquares:
    @pytest.mark.parametrize("n", [1, 2, 7])
    def test_xor_closed_form(self, n):
        subj, clip = scenarios.nested_squares(n)
        shapes = overlay(subj, clip, OverlayRule.XOR, FillRule.NON_ZERO)
        # per ring k (0-based): 4 bars minus their 2x2 corner overlaps leave
        # 4 sticks of area2 = 32k + 16 each; totals are closed-form.
        assert len(shapes) == 4 * n
        assert ring_count(shapes) == 4 * n
        assert total_area2(shapes) == 64 * n * n
        areas = sorted(ring_area2(s[0]) for s in shapes)
        expect = sorted(32 * k + 16 for k in range(n) for _ in range(4))
        assert areas == expect


class TestWindMill:
    @pytest.mark.parametrize("n", [1, 2, 5])
    def test_difference_shape_count(self, n):
        # the reference's own validation: DIFFERENCE yields exactly n^2 shapes
        # (test_8_wind_mill.rs:122-131 validate(), invoked with
        # OverlayRule::Difference in main.rs:275).
        subj, clip = scenarios.wind_mill(n)
        shapes = overlay(subj, clip, OverlayRule.DIFFERENCE, FillRule.NON_ZERO)
        assert len(shapes) == n * n

    @pytest.mark.parametrize("n", [1, 2, 5])
    def test_intersect_piece_count(self, n):
        # hand-derived: per cell the 4 pinwheel triangles each clip one rect
        # corner -> 4 disjoint right triangles per cell (verified analytically
        # for triangle/rect pairs 1 and 2; 3 and 4 follow by 180-degree
        # symmetry of the template).
        subj, clip = scenarios.wind_mill(n)
        shapes = overlay(subj, clip, OverlayRule.INTERSECT, FillRule.NON_ZERO)
        assert len(shapes) == 4 * n * n

    def test_translation_consistency(self):
        # cells are translations of one template, so total area scales as n^2
        base = overlay(*scenarios.wind_mill(1), OverlayRule.INTERSECT, FillRule.NON_ZERO)
        big = overlay(*scenarios.wind_mill(4), OverlayRule.INTERSECT, FillRule.NON_ZERO)
        assert total_area2(big) == 16 * total_area2(base)
        assert total_area2(base) > 0


def _float_area2(shapes):
    tot = 0.0
    for s in shapes:
        for r in s:
            x, y = np.asarray(r[:, 0], dtype=np.float64), np.asarray(r[:, 1], dtype=np.float64)
            tot += float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))
    return tot


@pytest.mark.parametrize(
    "gen,n",
    [(scenarios.corrosion, 4), (scenarios.corrosion, 8), (scenarios.concentric, 3)],
)
def test_float_scenario_partition_identities(gen, n):
    """difference + intersect partition the subject; xor = union - intersect.
    clean_result=False keeps all four results on the SAME integer grid so the
    identities are exact in quantized space."""
    subj, clip = gen(n)
    kw = dict(fill_rule=FillRule.NON_ZERO, dtype=np.float64, clean_result=False)
    diff = float_overlay(subj, clip, OverlayRule.DIFFERENCE, **kw)
    inter = float_overlay(subj, clip, OverlayRule.INTERSECT, **kw)
    union = float_overlay(subj, clip, OverlayRule.UNION, **kw)
    xor = float_overlay(subj, clip, OverlayRule.XOR, **kw)
    subj_only = float_overlay(subj, clip, OverlayRule.SUBJECT, **kw)
    a_subj = _float_area2(subj_only)
    assert a_subj > 0
    rel = lambda a, b: abs(a - b) / max(abs(b), 1e-9)
    # adapter-grid quantization makes these exact up to float64 summation noise
    assert rel(_float_area2(diff) + _float_area2(inter), a_subj) < 1e-9
    assert rel(_float_area2(xor), _float_area2(union) - _float_area2(inter)) < 1e-9


def test_corrosion_distributed_agreement(spark):
    """The distributed pipeline and the scalar kernel agree on the corrosion
    scenario (ring-canonical totals), mirroring the reference's cross-solver
    agreement suite (fragment_tests.rs)."""
    from ioverlay_spark.functions.float_shell import NumpyFloatAdapter
    from ioverlay_spark.operators.distributed import distributed_overlay
    from ioverlay_spark.kernel.segments import build_segments

    subj, clip = scenarios.corrosion(6)
    adapter = NumpyFloatAdapter.fit(np.concatenate(subj + clip))
    subj_i = [adapter.quantize(r) for r in subj]
    clip_i = [adapter.quantize(r) for r in clip]

    scalar = overlay(subj_i, clip_i, OverlayRule.DIFFERENCE, FillRule.NON_ZERO)

    segs = build_segments(subj_i, True)
    segs_c = build_segments(clip_i, False)
    rows = []
    for s, is_subj in ((segs, True), (segs_c, False)):
        for ax, ay, bx, by, sv, cv in zip(
            s.ax.tolist(), s.ay.tolist(), s.bx.tolist(), s.by.tolist(),
            s.subj.tolist(), s.clip.tolist(),
        ):
            rows.append((ax, ay, bx, by, sv, cv))
    df = spark.createDataFrame(rows, "ax long, ay long, bx long, by long, subj int, clip int")
    dist = distributed_overlay(
        df, OverlayRule.DIFFERENCE, FillRule.NON_ZERO, force_distributed=True
    ).collect()

    dist_total = sum(r.area2 for r in dist)
    scalar_total = sum(ring_area2(r) for s in scalar for r in s)
    assert dist_total == scalar_total
    assert len(dist) == sum(len(s) for s in scalar)
