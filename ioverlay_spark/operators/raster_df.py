"""Tile rasterization / vectorization over DataFrames (north rule raster<->vector).

rasterize_rect_tiles: geometry rows -> per-tile packed bitmaps (tile key = cell id at
the tile level); vectorize_tiles: the inverse. Masks travel as packed bytes
(np.packbits) in a binary column — the multimodal-column pattern (opaque binary +
typed metadata)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..functions.exprgen import GRID_BITS
from ..kernel.raster import vectorize

TILE_SCHEMA = StructType(
    [
        StructField("tile_x", LongType()),
        StructField("tile_y", LongType()),
        StructField("px", IntegerType()),
        StructField("size_px", IntegerType()),
        StructField("n_filled", LongType()),
        StructField("mask", BinaryType()),
    ]
)

VECTOR_SCHEMA = StructType(
    [
        StructField("tile_x", LongType()),
        StructField("tile_y", LongType()),
        StructField("ring_idx", IntegerType()),
        StructField("pts_x", ArrayType(LongType())),
        StructField("pts_y", ArrayType(LongType())),
    ]
)


def rasterize_rect_tiles(
    rects: DataFrame, tile_level: int = 6, size_px: int = 64
) -> DataFrame:
    """(r_id, x1, y1, x2, y2) -> one packed bitmap per touched tile.

    Tile side = 2^(GRID_BITS - tile_level); pixel = tile_side / size_px.
    Shuffle = explode-to-tile + groupBy(tile): the tiling pattern that scales
    (hot tiles are bounded by tile area, not data volume)."""
    from ..session import ship_package

    ship_package(rects.sparkSession)
    shift = GRID_BITS - tile_level
    tile_side = 1 << shift
    px = tile_side // size_px
    assert px > 0, "size_px too fine for tile level"

    covered = (
        rects.withColumn("tx", F.explode(F.expr("sequence(x1 DIV {t}, (x2 - 1) DIV {t})".format(t=tile_side))))
        .withColumn("ty", F.explode(F.expr("sequence(y1 DIV {t}, (y2 - 1) DIV {t})".format(t=tile_side))))
        .select("r_id", "x1", "y1", "x2", "y2", "tx", "ty")
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernel.raster import rasterize_rects

        rows = []
        for (tx, ty), grp in pdf.groupby(["tx", "ty"]):
            ox, oy = int(tx) * tile_side, int(ty) * tile_side
            # vectorized batched rect rasterization (differential-tested equal to
            # per-ring rasterize()) — no per-rect python loop
            rects = grp[["x1", "y1", "x2", "y2"]].to_numpy(np.int64)
            mask = rasterize_rects(rects, origin=(ox, oy), size_px=(size_px, size_px), px=px)
            rows.append(
                (
                    int(tx),
                    int(ty),
                    px,
                    size_px,
                    int(mask.sum()),
                    np.packbits(mask).tobytes(),
                )
            )
        return pd.DataFrame(
            rows, columns=["tile_x", "tile_y", "px", "size_px", "n_filled", "mask"]
        )

    return (
        covered.repartition(32, "tx", "ty")
        .groupBy("tx", "ty")
        .applyInPandas(kernel, schema=TILE_SCHEMA)
    )


def vectorize_tiles(tiles: DataFrame) -> DataFrame:
    """Packed tile bitmaps -> rectilinear rings per tile (raster -> vector)."""
    from ..session import ship_package

    ship_package(tiles.sparkSession)

    def kernel(batches):
        # batched marching squares (the flat-slice pattern, VERDICT r03 #6):
        # masks of a (size_px, px) group unpack in ONE np.unpackbits, the
        # boundary-edge extraction runs as 3-D array diffs + nonzero over the
        # whole group, and each tile's face walk consumes flat list slices.
        # Edge order per tile (horizontals in (r, c) order, then verticals)
        # matches the scalar vectorize() exactly, so rings are bit-identical
        # (differential-tested in tests/test_raster.py).
        from ..kernel.raster import _face_walk_min_cw, _merge_collinear_rectilinear

        for pdf in batches:
            rows = []
            for (s, p), grp in pdf.groupby(["size_px", "px"], sort=False):
                s = int(s)
                p = int(p)
                k = len(grp)
                nb = (s * s + 7) // 8
                buf = np.frombuffer(b"".join(grp["mask"].tolist()), dtype=np.uint8)
                bits = np.unpackbits(buf.reshape(k, nb), axis=1, count=s * s)
                padded = np.zeros((k, s + 2, s + 2), dtype=bool)
                padded[:, 1:-1, 1:-1] = bits.reshape(k, s, s).astype(bool)
                tx = grp["tile_x"].to_numpy(np.int64)
                ty = grp["tile_y"].to_numpy(np.int64)
                oxs = tx * (s * p)
                oys = ty * (s * p)
                # horizontal boundaries (between row r-1 and r), all tiles at once
                dh = padded[:, 1:, 1:-1] != padded[:, :-1, 1:-1]  # (k, s+1, s)
                hk, hr, hc = np.nonzero(dh)
                h_above = padded[hk, hr + 1, hc + 1]
                hy = oys[hk] + hr * p
                hx0 = oxs[hk] + hc * p
                hfx = np.where(h_above, hx0, hx0 + p)
                htx = np.where(h_above, hx0 + p, hx0)
                # vertical boundaries
                dv = padded[:, 1:-1, 1:] != padded[:, 1:-1, :-1]  # (k, s, s+1)
                vk, vr, vc = np.nonzero(dv)
                v_east = padded[vk, vr + 1, vc + 1]
                vx = oxs[vk] + vc * p
                vy0 = oys[vk] + vr * p
                vfy = np.where(v_east, vy0 + p, vy0)
                vty = np.where(v_east, vy0, vy0 + p)
                # flat edge tuple lists, sliced per tile (nonzero is C-ordered,
                # so hk/vk are ascending and per-tile slices keep (r, c) order)
                h_edges = list(zip(zip(hfx.tolist(), hy.tolist()), zip(htx.tolist(), hy.tolist())))
                v_edges = list(zip(zip(vx.tolist(), vfy.tolist()), zip(vx.tolist(), vty.tolist())))
                hb = np.searchsorted(hk, np.arange(k + 1))
                vb = np.searchsorted(vk, np.arange(k + 1))
                txl = tx.tolist()
                tyl = ty.tolist()
                for t in range(k):
                    edges = h_edges[hb[t]:hb[t + 1]] + v_edges[vb[t]:vb[t + 1]]
                    if not edges:
                        continue
                    i = 0
                    for ring in _face_walk_min_cw(edges):
                        ring = _merge_collinear_rectilinear(ring)
                        if len(ring) >= 4:
                            rows.append(
                                (
                                    txl[t],
                                    tyl[t],
                                    i,
                                    [q[0] for q in ring],
                                    [q[1] for q in ring],
                                )
                            )
                            i += 1
            yield pd.DataFrame(
                rows, columns=["tile_x", "tile_y", "ring_idx", "pts_x", "pts_y"]
            )

    return tiles.mapInPandas(kernel, schema=VECTOR_SCHEMA)
