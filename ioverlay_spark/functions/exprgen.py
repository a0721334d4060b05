"""Single-source-of-truth SQL expression generation for Spark AND DuckDB.

Every derived quantity the driver's oracle checks (geometry from doc_id, cell ids,
tile covers) is generated here once and rendered to both dialects, so the Spark
DataFrame result and the DuckDB oracle are exactly value-identical (pure BIGINT
arithmetic — no floats, no dialect-dependent semantics; all operands non-negative
so %-sign conventions agree).

The synthetic geometry layer: each document deterministically yields
- one axis-aligned rectangle  [x1, x2) x [y1, y2)  (its "geo payload" region), and
- one query point (px, py),
on a 2^20 x 2^20 integer grid — the FloatPointAdapter-quantized space the kernel
operates in (reference analog: iOverlay/src/float/overlay.rs:146-159).
"""

from __future__ import annotations

GRID_BITS = 20
GRID = 1 << GRID_BITS


def _shl(x: str, k: int, dialect: str) -> str:
    if k == 0:
        return x
    return f"({x} << {k})" if dialect == "duckdb" else f"shiftleft({x}, {k})"


def _shr(x: str, k: int, dialect: str) -> str:
    if k == 0:
        return x
    return f"({x} >> {k})" if dialect == "duckdb" else f"shiftright({x}, {k})"


def bigint(x: str, dialect: str) -> str:
    return f"CAST({x} AS BIGINT)"


# --- deterministic geometry from a bigint id column ------------------------------

def rect_exprs(id_col: str, dialect: str) -> dict[str, str]:
    """Rectangle payload for a document id: x1,y1,x2,y2 (all BIGINT, inside the grid)."""
    i = bigint(id_col, dialect)
    x1 = f"(({i} * 2654435761) % {1 << 19})"
    y1 = f"((({i} * 40503) + 99991) % {1 << 19})"
    w = f"(256 + (({i} * 97) % 8192))"
    h = f"(256 + (({i} * 193) % 8192))"
    return {
        "x1": x1,
        "y1": y1,
        "x2": f"({x1} + {w})",
        "y2": f"({y1} + {h})",
    }


def point_exprs(id_col: str, dialect: str) -> dict[str, str]:
    """Query point for a document id — co-extensive with the rectangle payload region
    ([0, 2^19) per axis) so spatial joins have realistic density."""
    i = bigint(id_col, dialect)
    return {
        "px": f"((({i} * 7919) + 31) % {1 << 19})",
        "py": f"((({i} * 104729) + 57) % {1 << 19})",
    }


# --- hierarchical cell index (quadkey / Morton, H3/S2 analog) --------------------

def spread_bits(col: str, level: int, dialect: str) -> str:
    """Interleave-ready bit spread: sum_k ((col>>k)&1) << 2k."""
    terms = [_shl(f"({_shr(col, k, dialect)} & 1)", 2 * k, dialect) for k in range(level)]
    return "(" + " + ".join(terms) + ")"


def cell_expr(x_col: str, y_col: str, level: int, dialect: str) -> str:
    """Morton cell id at `level` (2^level cells per axis) over the 2^20 grid.

    Generalizes the reference GridLayout cell indexing
    (iOverlay/src/split/grid_layout.rs:17-120) to a hierarchy."""
    shift = GRID_BITS - level
    cx = _shr(bigint(x_col, dialect), shift, dialect)
    cy = _shr(bigint(y_col, dialect), shift, dialect)
    return f"({spread_bits(cx, level, dialect)} + {_shl(spread_bits(cy, level, dialect), 1, dialect)})"


def cell_xy_exprs(x_col: str, y_col: str, level: int, dialect: str) -> tuple[str, str]:
    """Non-interleaved (cx, cy) cell coordinates at `level` — used for range covers."""
    shift = GRID_BITS - level
    return (
        _shr(bigint(x_col, dialect), shift, dialect),
        _shr(bigint(y_col, dialect), shift, dialect),
    )


def morton_from_cxcy(cx_col: str, cy_col: str, level: int, dialect: str) -> str:
    return f"({spread_bits(cx_col, level, dialect)} + {_shl(spread_bits(cy_col, level, dialect), 1, dialect)})"


# --- island pairs for the cluster_overlay driver query ---------------------------

def island_rect_exprs(id_col: str, dialect: str) -> dict[str, str]:
    """Two overlapping rectangles per document on a 16384-spaced island grid.

    Island (doc) contents stay within ~10.6k of the island origin while islands
    sit 16384 apart, so every document is its own bbox-overlap cluster and the
    two rects (r2 = r1 shifted by (w>>1, h>>1)) always overlap — union is ONE
    ring with closed-form area 2*w*h - ceil(w/2)*ceil(h/2)."""
    i = bigint(id_col, dialect)
    ox = f"(({i} % 1024) * 16384)"
    oy = (
        f"(({i} // 1024) * 16384)"
        if dialect == "duckdb"
        else f"(CAST({i} / 1024 AS BIGINT) * 16384)"
    )
    x1 = f"({ox} + (({i} * 2654435761) % 4096))"
    y1 = f"({oy} + ((({i} * 40503) + 99991) % 4096))"
    w = f"(256 + (({i} * 97) % 4096))"
    h = f"(256 + (({i} * 193) % 4096))"
    w2 = _shr(w, 1, dialect)
    h2 = _shr(h, 1, dialect)
    return {
        "x1": x1, "y1": y1, "w": w, "h": h,
        "x2": f"({x1} + {w})", "y2": f"({y1} + {h})",
        "bx1": f"({x1} + {w2})", "by1": f"({y1} + {h2})",
        "bx2": f"({x1} + {w2} + {w})", "by2": f"({y1} + {h2} + {h})",
        # union area2 = 2*(2wh - ceil(w/2)*ceil(h/2)); ceil via w - (w>>1)
        "union_area2": f"(2 * (2 * {w} * {h} - ({w} - {w2}) * ({h} - {h2})))",
    }


def island_frame_exprs(id_col: str, dialect: str) -> dict[str, str]:
    """Concentric square pair per document on the 16384-spaced island grid:
    outer square of side W (subject), inner square of side W>>1 centered-ish
    inside it (clip). DIFFERENCE is exactly ONE shape with a hull and a hole —
    the closed-form oracle for the clustered hole-binding path:
    hull area2 = 2*W*W, hole area2 = -2*w*w, net 2*(W*W - w*w), rings = 2."""
    i = bigint(id_col, dialect)
    ox = f"(({i} % 1024) * 16384)"
    oy = (
        f"(({i} // 1024) * 16384)"
        if dialect == "duckdb"
        else f"(CAST({i} / 1024 AS BIGINT) * 16384)"
    )
    x1 = f"({ox} + (({i} * 48271) % 4096))"
    y1 = f"({oy} + ((({i} * 69621) + 12345) % 4096))"
    W = f"(512 + (({i} * 131) % 2048))"
    w = _shr(W, 1, dialect)
    t = _shr(W, 2, dialect)
    return {
        "x1": x1, "y1": y1, "W": W, "w": w,
        "x2": f"({x1} + {W})", "y2": f"({y1} + {W})",
        "ix1": f"({x1} + {t})", "iy1": f"({y1} + {t})",
        "ix2": f"({x1} + {t} + {w})", "iy2": f"({y1} + {t} + {w})",
        "diff_area2": f"(2 * ({W} * {W} - {w} * {w}))",
    }
