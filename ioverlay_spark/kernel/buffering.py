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


class LineJoin:
    BEVEL = "bevel"
    MITER = "miter"
    ROUND = "round"


def _rnd(v: float) -> int:
    return int(math.floor(v + 0.5))


def _arc_fan(cx, cy, r, a0, a1, segments):
    """Points on the arc from angle a0 to a1 (CCW), integer-rounded."""
    if a1 < a0:
        a1 += 2 * math.pi
    n = max(2, int(math.ceil((a1 - a0) / (2 * math.pi) * segments)))
    return [
        (_rnd(cx + r * math.cos(a0 + (a1 - a0) * i / n)), _rnd(cy + r * math.sin(a0 + (a1 - a0) * i / n)))
        for i in range(n + 1)
    ]


def _stroke_contours(
    path: np.ndarray,
    width: float,
    cap: str,
    join: str,
    is_closed: bool,
    arc_segments: int,
    miter_limit: float,
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

    # vertex joins: a fan (disk approximation) at every interior vertex
    interior = range(n) if is_closed else range(1, n - 1)
    for i in interior:
        c = pts[i]
        if join == LineJoin.ROUND or join == LineJoin.MITER:
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
) -> list[list[np.ndarray]]:
    """Widen a polyline into polygon shapes (reference Stroke trait,
    iOverlay/src/mesh/stroke/offset.rs:44-160). Returns shapes (hull+holes)."""
    raw = _stroke_contours(path, width, cap, join, is_closed, arc_segments, miter_limit)
    if not raw:
        return []
    # all raw contours are CCW positive-wound: NonZero union resolves overlaps
    return simplify(raw, FillRule.NON_ZERO)


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
