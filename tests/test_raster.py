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


def test_rasterize_rects_matches_rasterize():
    """Vectorized batched rect rasterization must be bit-identical to the general
    per-ring kernel, including overlapping rects (even-odd parity) and partial
    tile overlap."""
    import numpy as np
    from ioverlay_spark.kernel.raster import rasterize, rasterize_rects

    rng = np.random.default_rng(11)
    for trial in range(50):
        n = int(rng.integers(1, 8))
        rects = []
        for _ in range(n):
            x1, y1 = rng.integers(-100, 500, size=2)
            w, h = rng.integers(1, 300, size=2)
            rects.append((int(x1), int(y1), int(x1 + w), int(y1 + h)))
        rects = np.array(rects, dtype=np.int64)
        rings = [
            np.array([[a, b], [c, b], [c, d], [a, d]], dtype=np.int64)
            for a, b, c, d in rects
        ]
        origin = (int(rng.integers(-64, 64)), int(rng.integers(-64, 64)))
        px = int(rng.choice([1, 3, 16, 64]))
        size = (int(rng.integers(1, 40)), int(rng.integers(1, 40)))
        a = rasterize(rings, origin=origin, size_px=size, px=px)
        b = rasterize_rects(rects, origin=origin, size_px=size, px=px)
        assert np.array_equal(a, b), f"trial {trial} diverged"


def test_rasterize_vectorized_edges_general_rings():
    """The vectorized (edge, column)-pair path must equal the former per-edge loop:
    spot-check non-rectilinear rings against brute-force center-in-polygon."""
    import numpy as np
    from ioverlay_spark.kernel.raster import rasterize

    tri = np.array([[0, 0], [40, 0], [0, 40]], dtype=np.int64)
    mask = rasterize([tri], origin=(0, 0), size_px=(10, 10), px=4)
    for r in range(10):
        for c in range(10):
            cx, cy = (2 * c + 1) * 2, (2 * r + 1) * 2  # centers at 4c+2
            # strictly inside the triangle x>0,y>0,x+y<40 (boundary: above-test)
            expect = cx >= 0 and cy >= 0 and cx + cy < 40
            assert bool(mask[r, c]) == expect, (r, c)


def test_vectorize_tiles_batch_matches_scalar(spark):
    """The batched marching-squares kernel in operators/raster_df.vectorize_tiles
    (one unpackbits + 3-D edge diffs per batch, flat per-tile edge slices) must
    produce ring-for-ring identical output to the scalar kernel vectorize()
    applied per tile row — including hole direction, ring order and ring_idx."""
    import numpy as np
    from pyspark.sql import functions as F

    from ioverlay_spark.kernel.raster import vectorize
    from ioverlay_spark.operators.raster_df import rasterize_rect_tiles, vectorize_tiles

    rng = np.random.default_rng(5)
    rows = []
    for rid in range(40):
        x1 = int(rng.integers(0, 1 << 12)) * 64
        y1 = int(rng.integers(0, 1 << 12)) * 64
        w = int(rng.integers(1, 64)) * 64
        h = int(rng.integers(1, 64)) * 64
        rows.append((rid, x1, y1, x1 + w, y1 + h))
    rects = spark.createDataFrame(rows, ["r_id", "x1", "y1", "x2", "y2"])
    tiles = rasterize_rect_tiles(rects, tile_level=10, size_px=32).localCheckpoint(eager=True)
    assert tiles.count() > 0

    got = sorted(
        (r["tile_x"], r["tile_y"], r["ring_idx"], tuple(r["pts_x"]), tuple(r["pts_y"]))
        for r in vectorize_tiles(tiles).collect()
    )
    from ioverlay_spark.functions.exprgen import GRID_BITS

    want = []
    shift = GRID_BITS - 10
    tile_side = 1 << shift
    px = tile_side // 32
    for t in tiles.collect():
        mask = np.unpackbits(
            np.frombuffer(t["mask"], dtype=np.uint8), count=32 * 32
        ).reshape(32, 32).astype(bool)
        ox = t["tile_x"] * 32 * px
        oy = t["tile_y"] * 32 * px
        for i, ring in enumerate(vectorize(mask, origin=(ox, oy), px=px)):
            want.append(
                (t["tile_x"], t["tile_y"], i, tuple(ring[:, 0].tolist()), tuple(ring[:, 1].tolist()))
            )
    assert got == sorted(want) and len(got) > 0
