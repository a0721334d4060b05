"""Port of iOverlay/tests/doc_tests.rs (4 README/doc examples).

The reference only println!s the results; here each example asserts the
geometric outcome it demonstrates (the docs' claimed behavior)."""

import numpy as np

from ioverlay_spark.functions.float_shell import (
    float_clip_path,
    float_overlay,
    float_slice_shape,
)
from ioverlay_spark.options import FillRule, OverlayRule


def _ring_area(r):
    p = np.asarray(r, dtype=np.float64)
    return 0.5 * float(
        np.sum(p[:, 0] * np.roll(p[:, 1], -1) - np.roll(p[:, 0], -1) * p[:, 1])
    )


def test_simple_union_o_and_dash():
    # doc_tests.rs test_simple_union: "O" union "-": the bar crosses the O's
    # hole, splitting it into two holes on one merged hull.
    subj = [
        np.array([[1.0, 0.0], [4.0, 0.0], [4.0, 5.0], [1.0, 5.0]]),
        np.array([[2.0, 1.0], [2.0, 4.0], [3.0, 4.0], [3.0, 1.0]]),
    ]
    clip = [np.array([[0.0, 2.0], [5.0, 2.0], [5.0, 3.0], [0.0, 3.0]])]
    result = float_overlay(subj, clip, OverlayRule.UNION, FillRule.EVEN_ODD,
                           dtype=np.float64)
    assert len(result) == 1
    assert len(result[0]) == 3  # hull + the two split holes
    holes = sorted(abs(_ring_area(r)) for r in result[0][1:])
    assert holes == [1.0, 1.0]


def test_custom_point_difference():
    # doc_tests.rs test_custom_point: 3x3 square minus centered 1x1 square.
    subj = [np.array([[0.0, 0.0], [0.0, 3.0], [3.0, 3.0], [3.0, 0.0]])]
    clip = [np.array([[1.0, 1.0], [1.0, 2.0], [2.0, 2.0], [2.0, 1.0]])]
    result = float_overlay(subj, clip, OverlayRule.DIFFERENCE,
                           FillRule.EVEN_ODD, dtype=np.float64)
    assert len(result) == 1
    assert len(result[0]) == 2
    assert abs(abs(_ring_area(result[0][0])) - 9.0) < 1e-9
    assert abs(abs(_ring_area(result[0][1])) - 1.0) < 1e-9


def test_slice_doc():
    # doc_tests.rs test_slice: zigzag polyline through a square — pieces
    # partition the square (total area preserved, more than one piece).
    polygon = [np.array([[1.0, 1.0], [1.0, 4.0], [4.0, 4.0], [4.0, 1.0]])]
    line = [np.array([[3.0, 5.0], [2.0, 2.0], [3.0, 3.0], [2.0, 0.0]])]
    result = float_slice_shape(polygon, line, FillRule.NON_ZERO)
    assert len(result) >= 2
    total = sum(sum(_ring_area(r) for r in shape) for shape in result)
    assert abs(total - 9.0) < 1e-6


def test_clip_doc():
    # doc_tests.rs test_clip: the same zigzag clipped to the square interior —
    # non-empty, total kept length below the path length, all points in-box.
    polygon = [np.array([[1.0, 1.0], [1.0, 4.0], [4.0, 4.0], [4.0, 1.0]])]
    line = np.array([[3.0, 5.0], [2.0, 2.0], [3.0, 3.0], [2.0, 0.0]])
    result = float_clip_path(polygon, line, FillRule.NON_ZERO,
                             invert=False, boundary_included=False)
    assert len(result) >= 1
    path_len = float(np.sum(np.hypot(*(np.diff(line, axis=0).T))))
    kept = sum(
        float(np.sum(np.hypot(*(np.diff(p, axis=0).T)))) for p in result
    )
    assert 0.0 < kept < path_len
    for p in result:
        assert (p[:, 0] >= 1.0 - 1e-6).all() and (p[:, 0] <= 4.0 + 1e-6).all()
        assert (p[:, 1] >= 1.0 - 1e-6).all() and (p[:, 1] <= 4.0 + 1e-6).all()
