"""Polyline ("string") operations: clip a polyline by a polygon, slice a polygon by
a polyline.

Re-derivation of the reference string module (iOverlay/src/string/clip.rs:16-260,
slice.rs:11-160, rule.rs, segm/string.rs): the polygon contributes winding segments,
the string contributes non-winding edges that get split at every polygon crossing;
each string sub-edge is then classified by polygon membership at its midpoint
(ClipRule{invert, boundary_included}), and kept runs are stitched back into maximal
paths. Slicing feeds the clipped string edges as double-sided walls into the same
face walk the boolean extraction uses.
"""

from __future__ import annotations

import numpy as np

from ..options import ContourDirection, FillRule, OverlayOptions, OverlayRule
from .extract import bind_holes, ring_area2, simplify_ring
from .fill import compute_fills
from .segments import Segments, build_segments, sort_and_merge
from .split import cross_pair, split_segments
from .overlay import build_graph


def _polygon_segments(body: list[np.ndarray], fill_rule: FillRule) -> Segments:
    segs = sort_and_merge(build_segments(body, True))
    return split_segments(segs)


def _winding_below(segs: Segments, X2: int, Y2: int) -> int:
    """Winding of the polygon at the point (X2/2, Y2/2) (doubled coords), by exact
    downward ray cast with the [ax, bx) convention (same math as fill.py)."""
    w = 0
    for i in range(len(segs)):
        ax, ay, bx, by = int(segs.ax[i]), int(segs.ay[i]), int(segs.bx[i]), int(segs.by[i])
        if ax == bx:
            continue
        if not (2 * ax <= X2 < 2 * bx):
            continue
        dt = bx - ax
        num = 2 * ay * dt + (by - ay) * (X2 - 2 * ax)
        if num < Y2 * dt:
            w += int(segs.subj[i])
    return w


def _inside(w: int, fill_rule: FillRule) -> bool:
    if fill_rule == FillRule.EVEN_ODD:
        return (w & 1) != 0
    if fill_rule == FillRule.NON_ZERO:
        return w != 0
    if fill_rule == FillRule.POSITIVE:
        return w > 0
    return w < 0


def _on_polygon_boundary(segs: Segments, ax, ay, bx, by) -> bool:
    """Is the (already split, crossing-free) edge collinear-contained in some polygon
    segment?"""
    for i in range(len(segs)):
        pax, pay, pbx, pby = int(segs.ax[i]), int(segs.ay[i]), int(segs.bx[i]), int(segs.by[i])
        # collinear test for both endpoints
        c1 = (pbx - pax) * (ay - pay) - (pby - pay) * (ax - pax)
        c2 = (pbx - pax) * (by - pay) - (pby - pay) * (bx - pax)
        if c1 != 0 or c2 != 0:
            continue
        lo, hi = (pax, pay), (pbx, pby)
        e1, e2 = sorted([(ax, ay), (bx, by)])
        if lo <= e1 and e2 <= hi:
            return True
    return False


def _split_path_edges(path: np.ndarray, segs: Segments, is_closed: bool) -> list[tuple]:
    """Split a polyline's edges at every crossing with the polygon segments.

    Returns ordered sub-edges [(x0, y0, x1, y1)] along the path direction."""
    pts = np.asarray(path, dtype=np.int64).reshape(-1, 2)
    n = len(pts)
    if n < 2:
        return []
    seg_rows = [
        (int(segs.ax[i]), int(segs.ay[i]), int(segs.bx[i]), int(segs.by[i]))
        for i in range(len(segs))
    ]
    out = []
    count = n if is_closed else n - 1
    for e in range(count):
        p0 = (int(pts[e][0]), int(pts[e][1]))
        p1 = (int(pts[(e + 1) % n][0]), int(pts[(e + 1) % n][1]))
        if p0 == p1:
            continue
        a, b = (p0, p1) if p0 < p1 else (p1, p0)
        marks = set()
        for t in seg_rows:
            pm, _ = cross_pair((a[0], a[1], b[0], b[1]), t, 2)
            for which, x, y in pm:
                if which == 0 and (x, y) != a and (x, y) != b:
                    marks.add((x, y))
        ysign = 1 if b[1] >= a[1] else -1
        chain = sorted(marks, key=lambda q: (q[0], ysign * q[1]))
        run = [a] + chain + [b]
        if p0 != a:
            run = run[::-1]
        for i in range(len(run) - 1):
            if run[i] != run[i + 1]:
                out.append((run[i][0], run[i][1], run[i + 1][0], run[i + 1][1]))
    return out


def clip_path(
    body: list[np.ndarray],
    path: np.ndarray,
    fill_rule: FillRule = FillRule.NON_ZERO,
    invert: bool = False,
    boundary_included: bool = True,
    is_closed_path: bool = False,
) -> list[np.ndarray]:
    """Clip one polyline by a polygon (reference IntClip::clip_line/clip_path_iter,
    iOverlay/src/string/clip.rs:16-260). Returns kept sub-paths in path order."""
    segs = _polygon_segments(body, fill_rule)
    sub = _split_path_edges(path, segs, is_closed_path)
    kept = []
    for x0, y0, x1, y1 in sub:
        a, b = sorted([(x0, y0), (x1, y1)])
        if _on_polygon_boundary(segs, a[0], a[1], b[0], b[1]):
            keep = boundary_included
        else:
            w = _winding_below(segs, x0 + x1, y0 + y1)
            keep = _inside(w, fill_rule) != invert
        kept.append(keep)
    # stitch consecutive kept sub-edges into maximal paths
    paths: list[list[tuple[int, int]]] = []
    cur: list[tuple[int, int]] = []
    for (x0, y0, x1, y1), keep in zip(sub, kept):
        if not keep:
            if len(cur) >= 2:
                paths.append(cur)
            cur = []
            continue
        if cur and cur[-1] == (x0, y0):
            cur.append((x1, y1))
        else:
            if len(cur) >= 2:
                paths.append(cur)
            cur = [(x0, y0), (x1, y1)]
    if len(cur) >= 2:
        paths.append(cur)
    # wrap-around join for closed paths / loops
    if len(paths) >= 2 and paths[0][0] == paths[-1][-1]:
        paths[0] = paths.pop()[:-1] + paths[0]
    return [np.array(p, dtype=np.int64) for p in paths]


def slice_shape(
    body: list[np.ndarray],
    paths: list[np.ndarray],
    fill_rule: FillRule = FillRule.NON_ZERO,
    options: OverlayOptions = OverlayOptions(),
) -> list[list[np.ndarray]]:
    """Slice a polygon by polylines (reference IntSlice::slice_by_paths,
    iOverlay/src/string/slice.rs:11-160): walls = string edges clipped to the
    polygon interior, added double-sided to the region-boundary face walk; the
    min-CW face traversal then yields the sliced sub-regions."""
    from ..options import OverlayRule
    from .extract import boundary_mask

    graph = build_graph(body, [], fill_rule, options)
    segs, fills = graph.segments, graph.fills
    mask = boundary_mask(fills, OverlayRule.SUBJECT)
    idx = np.flatnonzero(mask)

    # region boundary directed edges, interior on left (from fill bits)
    from .fill import SUBJ_TOP

    boundary = []  # (p, q) directed
    for i in idx:
        a = (int(segs.ax[i]), int(segs.ay[i]))
        b = (int(segs.bx[i]), int(segs.by[i]))
        if (int(fills[i]) & SUBJ_TOP) != 0:
            boundary.append((a, b))
        else:
            boundary.append((b, a))

    # walls: clip each path to the interior (boundary excluded)
    walls = []  # undirected (p, q)
    for path in paths:
        for sub in clip_path(body, path, fill_rule, invert=False, boundary_included=False):
            for i in range(len(sub) - 1):
                p = (int(sub[i][0]), int(sub[i][1]))
                q = (int(sub[i + 1][0]), int(sub[i + 1][1]))
                if p != q:
                    walls.append((p, q))

    # split walls at wall-wall crossings / touches (exact)
    walls = _mutual_split(walls)
    # split boundary edges at wall endpoints lying on them (T-junctions), so the
    # face walk has nodes to turn into the walls
    nodes = {p for e in walls for p in e}
    boundary = _split_at_points(boundary, nodes)

    dir_edges = list(boundary)
    for p, q in walls:
        dir_edges.append((p, q))
        dir_edges.append((q, p))

    rings = _face_walk_min_cw(dir_edges)
    hulls, holes = [], []
    for ring in rings:
        ring = simplify_ring(ring)
        if len(ring) < 3:
            continue
        a2 = ring_area2(ring)
        if a2 == 0:
            continue
        (hulls if a2 > 0 else holes).append(ring)
    shapes = bind_holes(hulls, holes)
    if options.output_direction == ContourDirection.CLOCKWISE:
        shapes = [[list(reversed(r)) for r in shape] for shape in shapes]
    return [[np.array(r, dtype=np.int64) for r in shape] for shape in shapes]


def _mutual_split(edges: list[tuple]) -> list[tuple]:
    """Split undirected edges at their pairwise crossings/touches (exact)."""
    out = []
    marks_by_edge: dict[int, set] = {i: set() for i in range(len(edges))}
    norm = []
    for p, q in edges:
        a, b = (p, q) if p < q else (q, p)
        norm.append((a[0], a[1], b[0], b[1]))
    for i in range(len(norm)):
        for j in range(i + 1, len(norm)):
            pm, _ = cross_pair(norm[i], norm[j], 2)
            for which, x, y in pm:
                marks_by_edge[i if which == 0 else j].add((x, y))
    for i, (ax, ay, bx, by) in enumerate(norm):
        a, b = (ax, ay), (bx, by)
        ysign = 1 if by >= ay else -1
        chain = sorted(marks_by_edge[i] - {a, b}, key=lambda q: (q[0], ysign * q[1]))
        run = [a] + chain + [b]
        for t in range(len(run) - 1):
            if run[t] != run[t + 1]:
                out.append((run[t], run[t + 1]))
    return out


def _split_at_points(dir_edges: list[tuple], points: set) -> list[tuple]:
    """Split directed edges at any of `points` strictly interior to them (exact
    collinearity + betweenness)."""
    out = []
    for p, q in dir_edges:
        hits = []
        for r in points:
            if r == p or r == q:
                continue
            if (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0]) != 0:
                continue
            lo, hi = (p, q) if p < q else (q, p)
            if lo < r < hi:
                hits.append(r)
        if not hits:
            out.append((p, q))
            continue
        fwd = p < q
        hits.sort()
        if not fwd:
            hits.reverse()
        run = [p] + hits + [q]
        for t in range(len(run) - 1):
            out.append((run[t], run[t + 1]))
    return out


def _face_walk_min_cw(dir_edges: list[tuple]) -> list[list[tuple[int, int]]]:
    """Planar face traversal: successor = first outgoing edge clockwise from the
    reversed incoming direction (exact integer angular order). Traces faces with
    interior on the left; walls traversed on both sides."""
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

    used = [False] * m

    def successor(e):
        p, q = dir_edges[e]
        cand = out_at.get(q, [])
        rev = (p[0] - q[0], p[1] - q[1])
        best = None
        for f in cand:
            if used[f]:
                continue
            df = dir_of(f)
            if df == rev:
                continue
            if angle_less(df, rev):
                if best is None or angle_less(dir_of(best), df):
                    best = f
        if best is None:
            unused = [f for f in cand if not used[f] and dir_of(f) != rev]
            if unused:
                best = max(unused, key=functools.cmp_to_key(cmp))
            else:
                rev_edges = [f for f in cand if not used[f]]
                best = rev_edges[0] if rev_edges else None
        return best

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
            if nxt is None:
                break
            if nxt == e0:
                break
            ring.append(dir_edges[nxt][0])
            used[nxt] = True
            e = nxt
        rings.append(ring)
    return rings
