"""Buffering (mesh) operations: path stroking and polygon outline/offset.

Re-derivation of the reference mesh module (iOverlay/src/mesh/stroke/offset.rs:44-160,
outline/offset.rs:47-160, style.rs:8-54): per-edge quads + per-vertex join fans +
end caps are generated vectorized, then resolved by the engine's own self-union
(A17 simplify) — the reference uses the same "generate raw contours, then union"
architecture. Offsets:

  stroke(path, w)        = union of edge quads, vertex fans, caps
  outline outer r        = shape  UNION  stroke(boundary, 2r)   (Minkowski dilation)
  outline inner r        = shape  DIFFERENCE stroke(boundary, 2r) (erosion)

Round joins/caps tessellate an arc; all vertices land on the integer grid
(deterministic rounding), and the union snap-rounds any residual slivers.
"""

from __future__ import annotations

import math

import numpy as np

from ..options import FillRule, OverlayOptions, OverlayRule
from .overlay import overlay, simplify


class LineCap:
    BUTT = "butt"
    SQUARE = "square"
    ROUND = "round"
    # user-supplied cap template (reference LineCap::Custom,
    # iOverlay/src/mesh/style.rs:8-20): points in unit space, +x = outward path
    # direction at the endpoint, +y = left normal, scaled by radius
    CUSTOM = "custom"


class LineJoin:
    BEVEL = "bevel"
    MITER = "miter"
    ROUND = "round"


def _rnd(v: float) -> int:
    return int(math.floor(v + 0.5))


def _arc_fan(cx, cy, r, a0, a1, segments):
    """Points on the arc from angle a0 to a1 (CCW), integer-rounded (vectorized)."""
    if a1 < a0:
        a1 += 2 * math.pi
    n = max(2, int(math.ceil((a1 - a0) / (2 * math.pi) * segments)))
    ang = a0 + (a1 - a0) * np.arange(n + 1) / n
    xs = np.floor(cx + r * np.cos(ang) + 0.5).astype(np.int64)
    ys = np.floor(cy + r * np.sin(ang) + 0.5).astype(np.int64)
    return list(zip(xs.tolist(), ys.tolist()))


def _miter_pieces(c, prev, nxt, r: float, miter_limit: float) -> list[np.ndarray]:
    """True miter join at vertex c (reference MiterJoinBuilder,
    iOverlay/src/mesh/stroke/builder_join.rs:89-210 + miter.rs):

    apex = intersection of the two offset edge lines on the OUTER side of the
    turn; when the corner is sharper than the limit allows, the spike is clamped
    to a trapezoid whose legs extend max_length = r / tan(theta_min / 2) along
    the edge directions (the reference's limited-miter path). `miter_limit` is
    the conventional miter-length / half-width ratio: theta_min =
    2*asin(1/limit). Returns join polygons (CCW)."""
    d0 = (c[0] - prev[0], c[1] - prev[1])
    d1 = (nxt[0] - c[0], nxt[1] - c[1])
    l0 = math.hypot(*d0) or 1.0
    l1 = math.hypot(*d1) or 1.0
    u0 = (d0[0] / l0, d0[1] / l0)
    u1 = (d1[0] / l1, d1[1] / l1)
    cross = u0[0] * u1[1] - u0[1] * u1[0]
    dot = u0[0] * u1[0] + u0[1] * u1[1]
    if abs(cross) < 1e-12:
        return []  # straight (or reversal): no join needed; quads already meet
    sgn = 1.0 if cross < 0 else -1.0  # outer side of the turn
    n0 = (-u0[1] * r * sgn, u0[0] * r * sgn)
    n1 = (-u1[1] * r * sgn, u1[0] * r * sgn)
    a = (c[0] + n0[0], c[1] + n0[1])  # outer corner of incoming quad
    b = (c[0] + n1[0], c[1] + n1[1])  # outer corner of outgoing quad
    # angle between the segments: theta = pi - angle(u0, u1); ratio = 1/sin(theta/2)
    limit = max(float(miter_limit), 1.0)
    theta_min = 2.0 * math.asin(min(1.0, 1.0 / limit))
    # actual theta from dot of u0,u1: cos(angle between directions) = dot;
    # theta (segment angle) = pi - that angle => limited iff dot < -cos(theta_min)
    if dot < -math.cos(theta_min):
        # limited: clamp the spike (trapezoid a -> ac -> bc -> b around c)
        max_len = r / math.tan(theta_min / 2.0)
        ac = (a[0] + max_len * u0[0], a[1] + max_len * u0[1])
        bc = (b[0] - max_len * u1[0], b[1] - max_len * u1[1])
        ring = np.array(
            [
                [_rnd(c[0]), _rnd(c[1])],
                [_rnd(a[0]), _rnd(a[1])],
                [_rnd(ac[0]), _rnd(ac[1])],
                [_rnd(bc[0]), _rnd(bc[1])],
                [_rnd(b[0]), _rnd(b[1])],
            ],
            dtype=np.int64,
        )
    else:
        # sharp apex: intersection of line a + t*u0 with line b - s*u1
        # (reference Miter::peak solves the same two-line meet)
        denom = u0[0] * u1[1] - u0[1] * u1[0]
        t = ((b[0] - a[0]) * u1[1] - (b[1] - a[1]) * u1[0]) / denom
        apex = (a[0] + t * u0[0], a[1] + t * u0[1])
        ring = np.array(
            [
                [_rnd(c[0]), _rnd(c[1])],
                [_rnd(a[0]), _rnd(a[1])],
                [_rnd(apex[0]), _rnd(apex[1])],
                [_rnd(b[0]), _rnd(b[1])],
            ],
            dtype=np.int64,
        )
    if sgn < 0:
        ring = ring[::-1]  # keep CCW (positive area) for the NonZero union
    if len(np.unique(ring, axis=0)) < 3 or abs(_area2(ring)) == 0:
        return []
    return [ring]


def _custom_cap_ring(c, u, r: float, template: np.ndarray) -> np.ndarray | None:
    """Reference LineCap::Custom (iOverlay/src/mesh/style.rs:8-20,
    builder_cap.rs custom_points): template points in unit space (+x = outward
    direction, +y = left normal), scaled by r, appended between the two stroke
    corners. Returns the closed cap polygon (CCW) or None if degenerate."""
    nl = (-u[1], u[0])  # left normal unit
    pts = [(c[0] - r * nl[0], c[1] - r * nl[1])]  # right corner first (CCW)
    for a, b in np.asarray(template, dtype=np.float64).reshape(-1, 2):
        pts.append((c[0] + r * (a * u[0] + b * nl[0]), c[1] + r * (a * u[1] + b * nl[1])))
    pts.append((c[0] + r * nl[0], c[1] + r * nl[1]))
    ring = np.array([[_rnd(x), _rnd(y)] for x, y in pts], dtype=np.int64)
    if len(np.unique(ring, axis=0)) < 3:
        return None
    a2 = _area2(ring)
    if a2 == 0:
        return None
    return ring if a2 > 0 else ring[::-1]


def _stroke_contours(
    path: np.ndarray,
    width: float,
    cap: str,
    join: str,
    is_closed: bool,
    arc_segments: int,
    miter_limit: float,
    custom_cap: np.ndarray | None = None,
) -> list[np.ndarray]:
    pts = np.asarray(path, dtype=np.float64).reshape(-1, 2)
    # drop consecutive duplicates
    keep = [0]
    for i in range(1, len(pts)):
        if not np.array_equal(pts[i], pts[keep[-1]]):
            keep.append(i)
    pts = pts[keep]
    n = len(pts)
    if n < 2:
        return []
    r = width / 2.0
    contours: list[np.ndarray] = []

    m = n if is_closed else n - 1
    for e in range(m):
        p0 = pts[e]
        p1 = pts[(e + 1) % n]
        d = p1 - p0
        ln = math.hypot(d[0], d[1])
        if ln == 0:
            continue
        nx, ny = -d[1] / ln * r, d[0] / ln * r
        quad = np.array(
            [
                [_rnd(p0[0] + nx), _rnd(p0[1] + ny)],
                [_rnd(p1[0] + nx), _rnd(p1[1] + ny)],
                [_rnd(p1[0] - nx), _rnd(p1[1] - ny)],
                [_rnd(p0[0] - nx), _rnd(p0[1] - ny)],
            ],
            dtype=np.int64,
        )[::-1]
        # [::-1] makes the quad CCW (positive area) in math orientation
        contours.append(quad)

    # vertex joins at every interior vertex
    interior = range(n) if is_closed else range(1, n - 1)
    for i in interior:
        c = pts[i]
        if join == LineJoin.MITER:
            contours.extend(_miter_pieces(c, pts[i - 1], pts[(i + 1) % n], r, miter_limit))
        elif join == LineJoin.ROUND:
            fan = _arc_fan(c[0], c[1], r, 0.0, 2 * math.pi - 1e-9, arc_segments)
            ring = np.array(fan[:-1], dtype=np.int64)
            if len(np.unique(ring, axis=0)) >= 3:
                contours.append(ring)
        else:  # bevel: triangle between the two edge corners
            prev = pts[i - 1]
            nxt = pts[(i + 1) % n]
            d0 = c - prev
            d1 = nxt - c
            l0 = math.hypot(*d0) or 1.0
            l1 = math.hypot(*d1) or 1.0
            n0 = (-d0[1] / l0 * r, d0[0] / l0 * r)
            n1 = (-d1[1] / l1 * r, d1[0] / l1 * r)
            cross = d0[0] * d1[1] - d0[1] * d1[0]
            sgn = 1.0 if cross < 0 else -1.0  # outer side of the turn
            tri = np.array(
                [
                    [_rnd(c[0]), _rnd(c[1])],
                    [_rnd(c[0] + sgn * n0[0]), _rnd(c[1] + sgn * n0[1])],
                    [_rnd(c[0] + sgn * n1[0]), _rnd(c[1] + sgn * n1[1])],
                ],
                dtype=np.int64,
            )
            # orient CCW (winding +1) like the miter pieces: a CW triangle
            # carries winding -1 into the NonZero union and cancels the edge
            # quads where rounding makes them overlap, punching slivers that
            # differ under path reversal (found by the reversal differential)
            if _area2(tri) < 0:
                tri = tri[::-1]
            contours.append(tri)

    # caps on open paths
    if not is_closed:
        for c, other in ((pts[0], pts[1]), (pts[-1], pts[-2])):
            d = c - other
            ln = math.hypot(d[0], d[1]) or 1.0
            ux, uy = d[0] / ln, d[1] / ln
            if cap == LineCap.ROUND:
                fan = _arc_fan(c[0], c[1], r, 0.0, 2 * math.pi - 1e-9, arc_segments)
                ring = np.array(fan[:-1], dtype=np.int64)
                if len(np.unique(ring, axis=0)) >= 3:
                    contours.append(ring)
            elif cap == LineCap.SQUARE:
                nx, ny = -uy * r, ux * r
                quad = np.array(
                    [
                        [_rnd(c[0] + nx), _rnd(c[1] + ny)],
                        [_rnd(c[0] + nx + ux * r), _rnd(c[1] + ny + uy * r)],
                        [_rnd(c[0] - nx + ux * r), _rnd(c[1] - ny + uy * r)],
                        [_rnd(c[0] - nx), _rnd(c[1] - ny)],
                    ],
                    dtype=np.int64,
                )
                # orientation: make CCW
                contours.append(quad if _area2(quad) > 0 else quad[::-1])
            elif cap == LineCap.CUSTOM and custom_cap is not None:
                ring = _custom_cap_ring(c, (ux, uy), r, custom_cap)
                if ring is not None:
                    contours.append(ring)
    return contours


def _area2(ring: np.ndarray) -> int:
    x, y = ring[:, 0], ring[:, 1]
    return int(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def stroke(
    path: np.ndarray,
    width: float,
    cap: str = LineCap.BUTT,
    join: str = LineJoin.ROUND,
    is_closed: bool = False,
    arc_segments: int = 16,
    miter_limit: float = 4.0,
    custom_cap: np.ndarray | None = None,
) -> list[list[np.ndarray]]:
    """Widen a polyline into polygon shapes (reference Stroke trait,
    iOverlay/src/mesh/stroke/offset.rs:44-160). Returns shapes (hull+holes)."""
    raw = _stroke_contours(
        path, width, cap, join, is_closed, arc_segments, miter_limit, custom_cap
    )
    if not raw:
        return []
    # all raw contours are CCW positive-wound: NonZero union resolves overlaps
    return simplify(raw, FillRule.NON_ZERO)


def stroke_batch(
    paths: list[np.ndarray],
    widths: list[float],
    cap: str = LineCap.BUTT,
    join: str = LineJoin.ROUND,
    is_closed: bool = False,
    arc_segments: int = 16,
    miter_limit: float = 4.0,
    custom_cap: np.ndarray | None = None,
) -> list[list[list[np.ndarray]]]:
    """Batched stroke: contour generation per job (cheap numpy) + ONE batched
    self-union across all jobs (kernel/batch.py disjoint-x-tile pass) instead of
    a full overlay per job. Bit-identical to per-job stroke() (overlay_batch is
    differential-tested against the scalar kernel). Returns per-job shapes."""
    from .batch import overlay_batch

    jobs = []
    for path, width in zip(paths, widths):
        raw = _stroke_contours(
            path, width, cap, join, is_closed, arc_segments, miter_limit, custom_cap
        )
        jobs.append((raw, []))
    results = overlay_batch(jobs, [OverlayRule.SUBJECT], FillRule.NON_ZERO)
    return [r[OverlayRule.SUBJECT] for r in results]


def outline_batch(
    shapes_list: list[list[np.ndarray]],
    outer_offsets: list[float],
    inner_offsets: list[float],
    join: str = LineJoin.ROUND,
    arc_segments: int = 16,
) -> list[list[list[np.ndarray]]]:
    """Batched outline: each of the scalar outline()'s up-to-3 overlay passes
    (simplify, dilate-union, erode-difference) runs ONCE over the whole batch via
    overlay_batch. Bit-identical to per-job outline()."""
    from .batch import overlay_batch

    nj = len(shapes_list)
    results = overlay_batch(
        [(shapes, []) for shapes in shapes_list], [OverlayRule.SUBJECT], FillRule.NON_ZERO
    )
    cur = [r[OverlayRule.SUBJECT] for r in results]

    def boundary_strokes(result, off):
        strokes = []
        for shape in result:
            for ring in shape:
                strokes.extend(
                    _stroke_contours(
                        ring, 2 * off, LineCap.ROUND, join, True, arc_segments, 4.0
                    )
                )
        return strokes

    # stage 2/3 run only on the jobs that need them (bit-identity with the scalar
    # path, which skips the pass entirely at offset 0)
    ks = [k for k in range(nj) if outer_offsets[k] > 0]
    if ks:
        jobs = []
        for k in ks:
            flat = [ring for shape in cur[k] for ring in shape]
            jobs.append((flat + boundary_strokes(cur[k], outer_offsets[k]), []))
        out = overlay_batch(jobs, [OverlayRule.SUBJECT], FillRule.NON_ZERO)
        for k, r in zip(ks, out):
            cur[k] = r[OverlayRule.SUBJECT]
    ks = [k for k in range(nj) if inner_offsets[k] > 0]
    if ks:
        jobs = []
        for k in ks:
            flat = [ring for shape in cur[k] for ring in shape]
            jobs.append((flat, boundary_strokes(cur[k], inner_offsets[k])))
        out = overlay_batch(jobs, [OverlayRule.DIFFERENCE], FillRule.NON_ZERO)
        for k, r in zip(ks, out):
            cur[k] = r[OverlayRule.DIFFERENCE]
    return cur


def outline(
    shapes: list[np.ndarray],
    outer_offset: float = 0.0,
    inner_offset: float = 0.0,
    join: str = LineJoin.ROUND,
    arc_segments: int = 16,
) -> list[list[np.ndarray]]:
    """Offset a polygon (reference Outline trait, iOverlay/src/mesh/outline/offset.rs:47-160):
    dilate by outer_offset (union with boundary stroke), erode by inner_offset
    (difference with boundary stroke)."""
    result = simplify(shapes, FillRule.NON_ZERO)
    flat = [ring for shape in result for ring in shape]
    if outer_offset > 0:
        strokes = []
        for shape in result:
            for ring in shape:
                strokes.extend(
                    _stroke_contours(
                        ring, 2 * outer_offset, LineCap.ROUND, join, True, arc_segments, 4.0
                    )
                )
        flat = [ring for shape in result for ring in shape]
        result = overlay(flat + strokes, [], OverlayRule.SUBJECT, FillRule.NON_ZERO)
        flat = [ring for shape in result for ring in shape]
    if inner_offset > 0:
        strokes = []
        for shape in result:
            for ring in shape:
                strokes.extend(
                    _stroke_contours(
                        ring, 2 * inner_offset, LineCap.ROUND, join, True, arc_segments, 4.0
                    )
                )
        result = overlay(flat, strokes, OverlayRule.DIFFERENCE, FillRule.NON_ZERO)
    return result
