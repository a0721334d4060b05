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
        for pdf in batches:
            rows = []
            for t in pdf.itertuples():
                size_px = int(t.size_px)
                px = int(t.px)
                mask = np.unpackbits(
                    np.frombuffer(t.mask, dtype=np.uint8), count=size_px * size_px
                ).reshape(size_px, size_px).astype(bool)
                ox = int(t.tile_x) * size_px * px
                oy = int(t.tile_y) * size_px * px
                for i, ring in enumerate(vectorize(mask, origin=(ox, oy), px=px)):
                    rows.append(
                        (
                            int(t.tile_x),
                            int(t.tile_y),
                            i,
                            ring[:, 0].tolist(),
                            ring[:, 1].tolist(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["tile_x", "tile_y", "ring_idx", "pts_x", "pts_y"]
            )

    return tiles.mapInPandas(kernel, schema=VECTOR_SCHEMA)
