"""Property tests for polyline clip/slice (reference string-op invariants)."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from ioverlay_spark.kernel.extract import ring_area2
from ioverlay_spark.kernel.string_ops import clip_path, slice_shape


def rect(x, y, w, h):
    return np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h]], dtype=np.int64)


def manhattan_len(path) -> int:
    d = np.abs(np.diff(np.asarray(path, dtype=np.int64), axis=0))
    return int(d.sum())


rect_params = st.tuples(
    st.integers(0, 50000), st.integers(0, 50000),
    st.integers(100, 5000), st.integers(100, 5000),
)


@settings(max_examples=40, deadline=None)
@given(rect_params, st.integers(-6000, 6000), st.integers(-6000, 6000))
def test_clip_pieces_bounded_and_inside(rp, dx, dy):
    """Clipped pieces of an axis-aligned staircase path: total length never exceeds
    the input, and every piece vertex lies inside the closed clip region."""
    x, y, w, h = rp
    body = [rect(x, y, w, h)]
    px, py = x + dx, y + dy
    path = np.array(
        [[px, py], [px + 3000, py], [px + 3000, py + 2500], [px + 7000, py + 2500]],
        dtype=np.int64,
    )
    pieces = clip_path(body, path, boundary_included=True)
    assert sum(manhattan_len(p) for p in pieces) <= manhattan_len(path)
    for p in pieces:
        for qx, qy in np.asarray(p, dtype=np.int64):
            assert x <= qx <= x + w and y <= qy <= y + h


@settings(max_examples=40, deadline=None)
@given(rect_params, st.integers(1, 99))
def test_slice_preserves_total_area(rp, fx):
    """Slicing a rect by any interior vertical line preserves total area and
    produces exactly two pieces."""
    x, y, w, h = rp
    body = [rect(x, y, w, h)]
    xs = x + max(1, (w * fx) // 100)
    if xs >= x + w:
        xs = x + w - 1
    cut = np.array([[xs, y - 10], [xs, y + h + 10]], dtype=np.int64)
    shapes = slice_shape(body, [cut])
    areas = [sum(ring_area2(r) for r in s) for s in shapes]
    assert len(shapes) == 2
    assert sum(areas) == 2 * w * h
    assert all(a > 0 for a in areas)
