"""Raster<->vector kernel tests (north-rule tile kernels)."""

import numpy as np

from ioverlay_spark.kernel.extract import ring_area2
from ioverlay_spark.kernel.raster import rasterize, vectorize


def test_aligned_rect_exact_roundtrip():
    rect = [np.array([[128, 64], [320, 64], [320, 256], [128, 256]], dtype=np.int64)]
    mask = rasterize(rect, origin=(0, 0), size_px=(8, 8), px=64)
    assert mask.sum() == 3 * 3
    rings = vectorize(mask, origin=(0, 0), px=64)
    assert len(rings) == 1
    assert sorted(map(tuple, rings[0].tolist())) == sorted(
        map(tuple, rect[0].tolist())
    )


def test_donut_hole_sign_and_roundtrip():
    donut = [
        np.array([[64, 64], [448, 64], [448, 448], [64, 448]]),
        np.array([[192, 192], [192, 320], [320, 320], [320, 192]]),  # CW hole
    ]
    mask = rasterize(donut, origin=(0, 0), size_px=(8, 8), px=64)
    rings = vectorize(mask, origin=(0, 0), px=64)
    areas = sorted(ring_area2(r) for r in rings)
    assert len(rings) == 2
    assert areas[0] < 0 < areas[1]  # one CW hole, one CCW hull
    assert np.array_equal(mask, rasterize(rings, origin=(0, 0), size_px=(8, 8), px=64))


def test_triangle_raster_vector_raster_stable():
    tri = [np.array([[10, 10], [500, 30], [250, 480]])]
    mask = rasterize(tri, origin=(0, 0), size_px=(8, 8), px=64)
    rings = vectorize(mask, origin=(0, 0), px=64)
    assert np.array_equal(mask, rasterize(rings, origin=(0, 0), size_px=(8, 8), px=64))


def test_empty_and_offgrid():
    mask = rasterize([], origin=(0, 0), size_px=(4, 4), px=64)
    assert not mask.any()
    assert vectorize(mask, origin=(0, 0), px=64) == []
    # polygon entirely off the tile
    far = [np.array([[10000, 10000], [10100, 10000], [10100, 10100], [10000, 10100]])]
    mask = rasterize(far, origin=(0, 0), size_px=(4, 4), px=64)
    assert not mask.any()
