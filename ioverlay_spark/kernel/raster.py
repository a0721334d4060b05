"""Raster <-> vector tile kernels (north rule: raster-to-vector tile rasterization).

- rasterize: polygons -> per-tile boolean pixel mask (even-odd / winding at pixel
  centers; exact integer comparisons — a pixel is filled iff its center is inside).
- vectorize: pixel mask -> rectilinear polygon rings (unit boundary edges with
  filled-side-left, stitched by the same planar face walk the slicer uses, collinear
  vertices merged). vectorize(rasterize(x)) is exact for pixel-aligned input.

Both are pure numpy and run per tile inside applyInPandas at the Spark layer
(tile key = cell id, SURVEY.md §2.7).
"""

from __future__ import annotations

import numpy as np

from ..options import FillRule


def rasterize(
    rings: list[np.ndarray],
    origin: tuple[int, int],
    size_px: tuple[int, int],
    px: int,
    fill_rule: FillRule = FillRule.EVEN_ODD,
) -> np.ndarray:
    """Rasterize rings onto a (h, w) bool mask. Pixel (r, c) covers the square
    [origin_x + c*px, +px) x [origin_y + r*px, +px); it is filled iff its center
    (doubled coords: 2*origin + (2c+1)*px) is inside under the fill rule."""
    w, h = size_px
    mask_wind = np.zeros((h, w), dtype=np.int64)
    ox, oy = origin
    # pixel center rows (doubled coordinates to stay integer)
    cy2 = 2 * oy + (2 * np.arange(h, dtype=np.int64) + 1) * px  # (h,)
    cx2 = 2 * ox + (2 * np.arange(w, dtype=np.int64) + 1) * px  # (w,)

    # gather all ring edges, normalized to ax<bx with count +-1 (vertical edges
    # never cross the downward ray)
    ea, eb, ecnt = [], [], []
    for ring in rings:
        pts = np.asarray(ring, dtype=np.int64).reshape(-1, 2)
        n = len(pts)
        if n < 3:
            continue
        p0 = pts
        p1 = np.roll(pts, -1, axis=0)
        fwd = p0[:, 0] < p1[:, 0]
        bwd = p1[:, 0] < p0[:, 0]
        keep = fwd | bwd
        ea.append(np.where(fwd[:, None], p0, p1)[keep])
        eb.append(np.where(fwd[:, None], p1, p0)[keep])
        ecnt.append(np.where(fwd[keep], 1, -1).astype(np.int64))
    if not ea:
        return np.zeros((h, w), dtype=bool)
    a = np.concatenate(ea)
    b = np.concatenate(eb)
    cnt = np.concatenate(ecnt)

    # vectorized over (edge, column) pairs: column c is in the edge's x-span iff
    # 2*ax <= cx2[c] < 2*bx, i.e. c in [ceil((2(ax-ox)-px)/(2px)), same for bx)
    def ceil_div(n_arr, d):
        return -((-n_arr) // d)

    c0 = np.clip(ceil_div(2 * (a[:, 0] - ox) - px, 2 * px), 0, w)
    c1 = np.clip(ceil_div(2 * (b[:, 0] - ox) - px, 2 * px), 0, w)
    counts = np.maximum(c1 - c0, 0)
    total = int(counts.sum())
    if total:
        e_rep = np.repeat(np.arange(len(a), dtype=np.int64), counts)
        cum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(counts)])
        cols = np.arange(total, dtype=np.int64) - cum[e_rep] + c0[e_rep]
        dt = b[e_rep, 0] - a[e_rep, 0]
        # edge y at center x (rational): num / (2*dt) vs center y; the >= makes a
        # center exactly ON an edge count as above it (half-open [y1, y2) on
        # axis-aligned input, matching the x span's [x1, x2))
        num = 2 * a[e_rep, 1] * dt + (b[e_rep, 1] - a[e_rep, 1]) * (cx2[cols] - 2 * a[e_rep, 0])
        above = cy2[None, :] * dt[:, None] >= num[:, None]  # (pairs, h)
        contrib = above * cnt[e_rep][:, None]
        wind_t = np.zeros((w, h), dtype=np.int64)
        np.add.at(wind_t, cols, contrib)
        mask_wind = wind_t.T

    if fill_rule == FillRule.EVEN_ODD:
        return (mask_wind & 1).astype(bool)
    if fill_rule == FillRule.NON_ZERO:
        return mask_wind != 0
    if fill_rule == FillRule.POSITIVE:
        return mask_wind > 0
    return mask_wind < 0


def rasterize_rects(
    rects: np.ndarray,
    origin: tuple[int, int],
    size_px: tuple[int, int],
    px: int,
    fill_rule: FillRule = FillRule.EVEN_ODD,
) -> np.ndarray:
    """Batched axis-aligned-rectangle rasterization, fully vectorized: each CCW
    rect contributes +1 winding on the half-open pixel-center box [x1,x2)x[y1,y2)
    (exactly rasterize()'s math for a rect ring — differential-tested); windings
    accumulate via corner deltas + 2-D cumsum. rects: (n, 4) int64 (x1,y1,x2,y2)."""
    w, h = size_px
    r = np.asarray(rects, dtype=np.int64).reshape(-1, 4)
    ox, oy = origin

    def ceil_div(n_arr, d):
        return -((-n_arr) // d)

    c0 = np.clip(ceil_div(2 * (r[:, 0] - ox) - px, 2 * px), 0, w)
    c1 = np.clip(ceil_div(2 * (r[:, 2] - ox) - px, 2 * px), 0, w)
    r0 = np.clip(ceil_div(2 * (r[:, 1] - oy) - px, 2 * px), 0, h)
    r1 = np.clip(ceil_div(2 * (r[:, 3] - oy) - px, 2 * px), 0, h)
    delta = np.zeros((h + 1, w + 1), dtype=np.int64)
    np.add.at(delta, (r0, c0), 1)
    np.add.at(delta, (r0, c1), -1)
    np.add.at(delta, (r1, c0), -1)
    np.add.at(delta, (r1, c1), 1)
    wind = np.cumsum(np.cumsum(delta, axis=0), axis=1)[:h, :w]
    if fill_rule == FillRule.EVEN_ODD:
        return (wind & 1).astype(bool)
    if fill_rule == FillRule.NON_ZERO:
        return wind != 0
    if fill_rule == FillRule.POSITIVE:
        return wind > 0
    return wind < 0


def vectorize(mask: np.ndarray, origin: tuple[int, int], px: int) -> list[np.ndarray]:
    """Mask -> rectilinear rings (hulls CCW, holes CW), exact. Boundary edges are
    emitted with the filled side on the LEFT, then stitched by the planar face
    walk (_face_walk_min_cw below — moved here from string_ops when slice moved
    to the shared segment pipeline)."""
    m = np.asarray(mask, dtype=bool)
    h, w = m.shape
    ox, oy = origin
    padded = np.zeros((h + 2, w + 2), dtype=bool)
    padded[1:-1, 1:-1] = m
    edges = []
    # horizontal boundaries: between row r-1 and r (pixel grid line y = oy + r*px)
    diff_h = padded[1:, 1:-1] != padded[:-1, 1:-1]  # (h+1, w)
    for r, c in zip(*np.nonzero(diff_h)):
        y = oy + r * px
        x0, x1 = ox + c * px, ox + (c + 1) * px
        if padded[r + 1, c + 1]:  # filled above the line: left side of +x direction
            edges.append(((x0, y), (x1, y)))
        else:  # filled below: walk -x so filled stays left
            edges.append(((x1, y), (x0, y)))
    diff_v = padded[1:-1, 1:] != padded[1:-1, :-1]  # (h, w+1)
    for r, c in zip(*np.nonzero(diff_v)):
        x = ox + c * px
        y0, y1 = oy + r * px, oy + (r + 1) * px
        if padded[r + 1, c + 1]:  # filled right of the line: walk -y ... check below
            # filled east: direction +y has filled on right -> walk (x,y1)->(x,y0)?
            # interior-left convention: going UP (+y) keeps WEST on left; filled is
            # EAST here, so walk DOWN? No: going DOWN (-y) keeps EAST on left.
            edges.append(((x, y1), (x, y0)))
        else:  # filled west: going UP keeps WEST on left
            edges.append(((x, y0), (x, y1)))
    rings = _face_walk_min_cw(edges)
    out = []
    for ring in rings:
        ring = _merge_collinear_rectilinear(ring)
        if len(ring) >= 4:
            out.append(np.array(ring, dtype=np.int64))
    return out


def _merge_collinear_rectilinear(ring: list[tuple[int, int]]) -> list[tuple[int, int]]:
    if len(ring) < 3:
        return []
    out = []
    n = len(ring)
    for i in range(n):
        p0 = ring[i - 1]
        p1 = ring[i]
        p2 = ring[(i + 1) % n]
        if (p1[0] - p0[0]) * (p2[1] - p1[1]) - (p1[1] - p0[1]) * (p2[0] - p1[0]) != 0:
            out.append(p1)
    return out


def _face_walk_min_cw(dir_edges: list[tuple]) -> list[list[tuple[int, int]]]:
    """Planar face traversal via the rotation system: the successor of a directed
    edge is the outgoing edge at its head immediately CLOCKWISE of the reversed
    incoming direction (exact integer angular order, no state) — faces are the
    orbits of that permutation, traced with interior on the left; walls are
    traversed once per side, and a dead-end spur bounces back on its twin."""
    import functools

    m = len(dir_edges)
    if m == 0:
        return []
    out_at: dict[tuple[int, int], list[int]] = {}
    for e, (p, q) in enumerate(dir_edges):
        out_at.setdefault(p, []).append(e)

    def dir_of(e):
        p, q = dir_edges[e]
        return (q[0] - p[0], q[1] - p[1])

    def angle_less(u, v):
        # strict CCW order from angle 0 (positive x axis, inclusive)
        uh = 0 if (u[1] > 0 or (u[1] == 0 and u[0] > 0)) else 1
        vh = 0 if (v[1] > 0 or (v[1] == 0 and v[0] > 0)) else 1
        if uh != vh:
            return uh < vh
        return u[0] * v[1] - u[1] * v[0] > 0

    def cmp(e1, e2):
        d1, d2 = dir_of(e1), dir_of(e2)
        if d1 == d2:
            return 0
        return -1 if angle_less(d1, d2) else 1

    for p in out_at:
        out_at[p].sort(key=functools.cmp_to_key(cmp))

    def successor(e):
        p, q = dir_edges[e]
        cand = out_at.get(q)
        if not cand:
            return None
        rev = (p[0] - q[0], p[1] - q[1])
        # predecessor of rev in the CCW cyclic order = next edge clockwise of rev;
        # an outgoing edge EQUAL to rev (the twin) is excluded from "less", so a
        # spur endpoint wraps around to the twin only when nothing else exists
        best = None
        for f in cand:
            if angle_less(dir_of(f), rev):
                best = f  # list is CCW-sorted: keep the LAST one below rev
        if best is None:
            best = cand[-1]  # cyclic wrap: the largest angle overall
        return best

    used = [False] * m
    rings = []
    order = sorted(range(m), key=lambda e: dir_edges[e][0])
    for e0 in order:
        if used[e0]:
            continue
        ring = [dir_edges[e0][0]]
        used[e0] = True
        e = e0
        guard = 2 * m + 4
        while guard:
            guard -= 1
            nxt = successor(e)
            if nxt is None or nxt == e0:
                break
            if used[nxt]:
                break  # safety: malformed arrangement (should not occur)
            ring.append(dir_edges[nxt][0])
            used[nxt] = True
            e = nxt
        rings.append(ring)
    return rings
