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


def _split_path_edges(
    path: np.ndarray,
    segs: Segments,
    is_closed: bool,
    extra_edges: list | None = None,
    body_marks_out: set | None = None,
) -> list[tuple]:
    """Split a polyline's edges at every crossing with the polygon segments (and
    optionally `extra_edges` — other string edges, for the reference's combined
    string overlay where strings also split each other).

    Returns ordered sub-edges [(x0, y0, x1, y1)] along the path direction."""
    pts = np.asarray(path, dtype=np.int64).reshape(-1, 2)
    n = len(pts)
    if n < 2:
        return []
    n_body = len(segs)
    seg_rows = [
        (int(segs.ax[i]), int(segs.ay[i]), int(segs.bx[i]), int(segs.by[i]))
        for i in range(n_body)
    ]
    if extra_edges:
        seg_rows = seg_rows + [t for t in extra_edges]
    out = []
    count = n if is_closed else n - 1
    for e in range(count):
        p0 = (int(pts[e][0]), int(pts[e][1]))
        p1 = (int(pts[(e + 1) % n][0]), int(pts[(e + 1) % n][1]))
        if p0 == p1:
            continue
        a, b = (p0, p1) if p0 < p1 else (p1, p0)
        me = (a[0], a[1], b[0], b[1])
        marks = set()
        for k, t in enumerate(seg_rows):
            if t == me:
                continue  # the edge itself (when extra_edges covers this path)
            pm, _ = cross_pair(me, t, 2)
            for which, x, y in pm:
                if which == 0 and (x, y) != a and (x, y) != b:
                    marks.add((x, y))
                    if body_marks_out is not None and k < n_body:
                        body_marks_out.add((x, y))
                elif which == 1 and body_marks_out is not None and k < n_body:
                    # a mark ON the body segment (e.g. a crossing snap-rounded to
                    # a string endpoint): the reference's shared pipeline splits
                    # the body edge there — record it for boundary bending
                    body_marks_out.add((x, y))

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
            # boundary_included picks which side owns the boundary (see clip_paths)
            keep = boundary_included != invert
        else:
            w = _winding_below(segs, x0 + x1, y0 + y1)
            keep = _inside(w, fill_rule) != invert
        kept.append(keep)
    return _stitch_paths(sub, kept)


def clip_paths(
    body: list[np.ndarray],
    paths: list[np.ndarray],
    fill_rule: FillRule = FillRule.NON_ZERO,
    invert: bool = False,
    boundary_included: bool = True,
    is_closed_paths: bool = False,
    body_marks_out: set | None = None,
) -> list[np.ndarray]:
    """Clip MANY polylines by a polygon in one combined overlay (reference
    IntClip::clip_paths, iOverlay/src/string/clip.rs): string edges split at
    body crossings AND at string-string crossings/touches, exactly as the
    reference's shared segment pipeline does; each sub-edge is then classified
    and stitched per input path. Returns kept sub-paths in path order."""
    segs = _polygon_segments(body, fill_rule)
    # all string edges (a<b normalized) as extra split sources
    str_edges = []
    for path in paths:
        pts = np.asarray(path, dtype=np.int64).reshape(-1, 2)
        n = len(pts)
        cnt = n if is_closed_paths else n - 1
        for e in range(max(cnt, 0)):
            p0 = (int(pts[e][0]), int(pts[e][1]))
            p1 = (int(pts[(e + 1) % n][0]), int(pts[(e + 1) % n][1]))
            if p0 == p1:
                continue
            a, b = (p0, p1) if p0 < p1 else (p1, p0)
            str_edges.append((a[0], a[1], b[0], b[1]))
    out: list[np.ndarray] = []
    for path in paths:
        sub = _split_path_edges(
            path, segs, is_closed_paths, extra_edges=str_edges,
            body_marks_out=body_marks_out,
        )
        kept = []
        for x0, y0, x1, y1 in sub:
            a, b = sorted([(x0, y0), (x1, y1)])
            if _on_polygon_boundary(segs, a[0], a[1], b[0], b[1]):
                # reference semantics (build/string.rs ClipRule filters):
                # boundary_included picks which SIDE owns the boundary, so
                # under invert an EXCLUDED boundary is kept (it is "outside")
                keep = boundary_included != invert
            else:
                w = _winding_below(segs, x0 + x1, y0 + y1)
                keep = _inside(w, fill_rule) != invert
            kept.append(keep)
        out.extend(_stitch_paths(sub, kept))
    return out


def _stitch_paths(sub: list[tuple], kept: list[bool]) -> list[np.ndarray]:
    """Stitch consecutive kept sub-edges into maximal paths (path order)."""
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
    graph = build_graph(body, [], fill_rule, options)
    # combined clip: walls split at body AND string-string crossings, matching
    # the reference's single string overlay; body_marks records which wall
    # endpoints are (rounded) body-edge crossings — the only points that may
    # bend a boundary edge
    body_marks: set = set()
    wall_paths = clip_paths(
        body, paths, fill_rule, invert=False, boundary_included=False,
        body_marks_out=body_marks,
    )
    return _slice_from_parts(
        graph.segments, graph.fills, wall_paths, options, body_marks
    )


def _slice_from_parts(
    segs: Segments,
    fills: np.ndarray,
    wall_paths: list[np.ndarray],
    options: OverlayOptions = OverlayOptions(),
    body_marks: set | None = None,
) -> list[list[np.ndarray]]:
    """Face walk over (region boundary from segs+fills) + (interior wall paths):
    the shared tail of slice_shape and its batched variant."""
    from ..options import OverlayRule
    from .extract import boundary_mask

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

    # walls: the clipped interior sub-paths, as undirected point pairs.
    # COINCIDENT wall segments merge to one (the reference's ShapeCountString
    # merge): an out-and-back string traverses the same wall twice, but the
    # face walk must see a single double-sided wall, not two coincident ones
    # (coincident pairs make every face between them a zero-area sliver).
    seen = set()
    walls = []  # undirected (p, q)
    for sub in wall_paths:
        for i in range(len(sub) - 1):
            p = (int(sub[i][0]), int(sub[i][1]))
            q = (int(sub[i + 1][0]), int(sub[i + 1][1]))
            if p == q:
                continue
            key = (p, q) if p < q else (q, p)
            if key in seen:
                continue
            seen.add(key)
            walls.append((p, q))

    # split walls at wall-wall crossings / touches (exact), then dedupe again:
    # partially-overlapping collinear walls only become exactly coincident
    # pieces after the mutual split
    walls = _mutual_split(walls)
    seen2 = set()
    uniq_walls = []
    for p, q in walls:
        key = (p, q) if p < q else (q, p)
        if key in seen2:
            continue
        seen2.add(key)
        uniq_walls.append((p, q))
    walls = uniq_walls
    # split boundary edges at wall endpoints lying on them (T-junctions), so the
    # face walk has nodes to turn into the walls. Snap-tolerant splitting applies
    # ONLY to rounded body-crossing marks (clip reported them); other wall nodes
    # split the boundary only when EXACTLY on it.
    nodes = {p for e in walls for p in e}
    marks = set(body_marks or ()) & nodes
    boundary = _split_at_points(boundary, marks, tolerant=True)
    boundary = _split_at_points(boundary, nodes - marks, tolerant=False)

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
        # a face whose boundary touches an enclosed island through a wall chain
        # comes back as ONE self-touching figure-8 orbit; split it at repeated
        # vertices (the island piece flips orientation and becomes a hole —
        # matching the reference slice extraction's hull+hole output)
        pieces = [ring]
        if len({p for p in ring}) != len(ring):
            from .decompose import decompose_ring

            pieces = [
                [tuple(map(int, p)) for p in sub]
                for sub in decompose_ring(np.array(ring, dtype=np.int64))
            ]
        for piece in pieces:
            piece = simplify_ring(list(piece))
            if len(piece) < 3:
                continue
            a2 = ring_area2(piece)
            if a2 == 0:
                continue
            (hulls if a2 > 0 else holes).append(piece)
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


def _split_at_points(
    dir_edges: list[tuple], points: set, tolerant: bool = False
) -> list[tuple]:
    """Split directed edges at any of `points` lying interior to them.

    tolerant=True additionally accepts points within the kernel's snap radius
    (dist^2 <= 2) of the edge: clipped wall endpoints at BODY crossings are
    snap-rounded and may sit up to ~1 unit off the edge — the reference's shared
    split fixpoint bends the body edge through the rounded point, and the face
    walk needs the same T-junction node here. Non-mark points must lie exactly
    on the edge (tolerance at small coordinate scales would bend boundaries
    through unrelated nearby points). Points are ordered along the edge by their
    projection parameter."""
    cap = 2 if tolerant else 0
    out = []
    for p, q in dir_edges:
        ab = (q[0] - p[0], q[1] - p[1])
        den = ab[0] * ab[0] + ab[1] * ab[1]
        hits = []
        for r in points:
            if r == p or r == q:
                continue
            ap = (r[0] - p[0], r[1] - p[1])
            cr = ab[0] * ap[1] - ab[1] * ap[0]
            if cr * cr > cap * den:
                continue
            t_num = ab[0] * ap[0] + ab[1] * ap[1]
            if not (0 < t_num < den):
                continue  # projection strictly interior
            hits.append((t_num, r))
        if not hits:
            out.append((p, q))
            continue
        hits.sort()
        run = [p] + [r for _, r in hits] + [q]
        for t in range(len(run) - 1):
            if run[t] != run[t + 1]:
                out.append((run[t], run[t + 1]))
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


# -----------------------------------------------------------------------------------
# batched variants: many (body, path) jobs through one vectorized pass
# (the kernel/batch.py disjoint-x-tile trick applied to the string pipeline)


def clip_paths_batch(
    jobs: list[tuple[list[np.ndarray], np.ndarray]],
    fill_rule: FillRule = FillRule.NON_ZERO,
    invert: bool = False,
    boundary_included: bool = True,
    is_closed_path: bool = False,
) -> list[list[np.ndarray]]:
    """Batched clip_path: each job is translated into its own disjoint x-tile,
    the polygon split fixpoint runs ONCE over all bodies (kernel/batch._split_batch,
    bit-identical per tile), and the per-sub-edge O(edges x segments) python loops
    of the scalar kernel (_split_path_edges / _winding_below / _on_polygon_boundary)
    become windowed vectorized passes. Bit-identical to per-job clip_path
    (differential-tested); falls back to the scalar path on huge coordinates."""
    from .batch import _COORD_CAP, _split_batch

    nj = len(jobs)
    if nj == 0:
        return []

    def scalar():
        return [
            clip_path(b, p, fill_rule, invert, boundary_included, is_closed_path)
            for b, p in jobs
        ]

    if nj == 1:
        return scalar()

    # vectorized body ingest (kernel/batch.py clean-ring path, dirty rings via the
    # reference-exact scalar builder) + bbox per job over body AND path
    from .batch import _EMPTY, vectorized_ring_segments

    ring_pts: list[np.ndarray] = []
    ring_job: list[int] = []
    path_pts = []
    for j, (body, path) in enumerate(jobs):
        for ring in body:
            ring_pts.append(np.asarray(ring, dtype=np.int64).reshape(-1, 2))
            ring_job.append(j)
        pts = np.asarray(path, dtype=np.int64).reshape(-1, 2)
        path_pts.append(pts)
        if len(pts) and int(np.abs(pts).max()) >= _COORD_CAP:
            return scalar()
    t = vectorized_ring_segments(ring_pts, ring_job, [True] * len(ring_pts))
    if t is None:
        return scalar()
    if t == _EMPTY:
        return scalar()  # no body segments anywhere: keep scalar semantics exactly
    sax, say, sbx, sby, ssubj, sclip, sjob = t
    has_body = np.zeros(nj, dtype=bool)
    has_body[sjob] = True

    BIG = np.int64(1 << 62)
    minx = np.full(nj, BIG, dtype=np.int64)
    maxx = np.full(nj, -BIG, dtype=np.int64)
    miny = np.full(nj, BIG, dtype=np.int64)
    maxy = np.full(nj, -BIG, dtype=np.int64)
    np.minimum.at(minx, sjob, sax)
    np.maximum.at(maxx, sjob, sbx)
    np.minimum.at(miny, sjob, np.minimum(say, sby))
    np.maximum.at(maxy, sjob, np.maximum(say, sby))
    for j, pts in enumerate(path_pts):
        if len(pts):
            minx[j] = min(int(minx[j]) if minx[j] != BIG else 1 << 61, int(pts[:, 0].min()))
            maxx[j] = max(int(maxx[j]) if maxx[j] != -BIG else -(1 << 61), int(pts[:, 0].max()))
            miny[j] = min(int(miny[j]) if miny[j] != BIG else 1 << 61, int(pts[:, 1].min()))
            maxy[j] = max(int(maxy[j]) if maxy[j] != -BIG else -(1 << 61), int(pts[:, 1].max()))
    present = maxx >= minx
    minx[~present] = 0
    maxx[~present] = 0
    miny[~present] = 0
    maxy[~present] = 0
    W = int((maxx - minx).max(initial=0)) + 8
    y0 = int(miny.min(initial=0))
    H = int(maxy.max(initial=0)) - y0 + 1
    if W * max(H, 1) >= (1 << 60) or W * nj >= (1 << 62):
        return scalar()
    off = np.arange(nj, dtype=np.int64) * W + 2 - minx

    # tiled body segments -> one split fixpoint over the whole batch
    segs = _split_batch(
        Segments(sax + off[sjob], say - y0, sbx + off[sjob], sby - y0, ssubj, sclip)
    )
    ns = len(segs)
    if ns == 0:
        return scalar()
    tile_starts = np.searchsorted(segs.ax, np.arange(nj + 1, dtype=np.int64) * W)

    # path edges in path order (scalar _split_path_edges enumeration), tiled coords
    e_job: list[int] = []
    e_ax: list[int] = []
    e_ay: list[int] = []
    e_bx: list[int] = []
    e_by: list[int] = []
    e_rev: list[bool] = []
    for j, pts in enumerate(path_pts):
        n = len(pts)
        if n < 2:
            continue
        cnt = n if is_closed_path else n - 1
        oj, yj = int(off[j]), y0
        for e in range(cnt):
            p0 = (int(pts[e][0]) + oj, int(pts[e][1]) - yj)
            p1 = (int(pts[(e + 1) % n][0]) + oj, int(pts[(e + 1) % n][1]) - yj)
            if p0 == p1:
                continue
            a, b = (p0, p1) if p0 < p1 else (p1, p0)
            e_job.append(j)
            e_ax.append(a[0])
            e_ay.append(a[1])
            e_bx.append(b[0])
            e_by.append(b[1])
            e_rev.append(p0 != a)
    ne = len(e_job)
    marks_per_edge: dict[int, set] = {k: set() for k in range(ne)}
    if ne and ns:
        ejob = np.asarray(e_job, dtype=np.int64)
        eax = np.asarray(e_ax, dtype=np.int64)
        eay = np.asarray(e_ay, dtype=np.int64)
        ebx = np.asarray(e_bx, dtype=np.int64)
        eby = np.asarray(e_by, dtype=np.int64)
        lo = tile_starts[ejob]
        hi = np.searchsorted(segs.ax, ebx, side="right")
        counts = np.maximum(hi - lo, 0)
        total = int(counts.sum())
        if total:
            k_rep = np.repeat(np.arange(ne, dtype=np.int64), counts)
            cum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(counts)])
            t = np.arange(total, dtype=np.int64) - cum[k_rep] + lo[k_rep]
            # bbox prefilter (x upper already via searchsorted)
            eymin = np.minimum(eay, eby)
            eymax = np.maximum(eay, eby)
            symin = np.minimum(segs.ay, segs.by)
            symax = np.maximum(segs.ay, segs.by)
            m = (
                (segs.bx[t] >= eax[k_rep])
                & (symin[t] <= eymax[k_rep])
                & (symax[t] >= eymin[k_rep])
            )
            k_rep, t = k_rep[m], t[m]
            # orientation-sign prefilter (kernel/batch.interacting_mask, incl. the
            # collinear strict-overlap refinement)
            from .batch import interacting_mask

            inter = interacting_mask(
                eax[k_rep], eay[k_rep], ebx[k_rep], eby[k_rep],
                segs.ax[t], segs.ay[t], segs.bx[t], segs.by[t],
            )
            k_rep, t = k_rep[inter], t[inter]
            for k, ti in zip(k_rep.tolist(), t.tolist()):
                edge = (int(eax[k]), int(eay[k]), int(ebx[k]), int(eby[k]))
                seg = (
                    int(segs.ax[ti]),
                    int(segs.ay[ti]),
                    int(segs.bx[ti]),
                    int(segs.by[ti]),
                )
                pm, _ = cross_pair(edge, seg, 2)
                a = (edge[0], edge[1])
                b = (edge[2], edge[3])
                for which, x, y in pm:
                    if which == 0 and (x, y) != a and (x, y) != b:
                        marks_per_edge[k].add((x, y))

    # sub-edges in path order (tiled coords)
    sub_job: list[int] = []
    sub: list[tuple[int, int, int, int]] = []
    for k in range(ne):
        a = (e_ax[k], e_ay[k])
        b = (e_bx[k], e_by[k])
        ysign = 1 if b[1] >= a[1] else -1
        chain = sorted(marks_per_edge[k], key=lambda q: (q[0], ysign * q[1]))
        run = [a] + chain + [b]
        if e_rev[k]:
            run = run[::-1]
        for i in range(len(run) - 1):
            if run[i] != run[i + 1]:
                sub.append((run[i][0], run[i][1], run[i + 1][0], run[i + 1][1]))
                sub_job.append(e_job[k])
    nsub = len(sub)
    kept = np.zeros(nsub, dtype=bool)
    if nsub and ns:
        sj = np.asarray(sub_job, dtype=np.int64)
        sx0 = np.array([s[0] for s in sub], dtype=np.int64)
        sy0 = np.array([s[1] for s in sub], dtype=np.int64)
        sx1 = np.array([s[2] for s in sub], dtype=np.int64)
        sy1 = np.array([s[3] for s in sub], dtype=np.int64)
        fwd = (sx0 < sx1) | ((sx0 == sx1) & (sy0 < sy1))
        sax = np.where(fwd, sx0, sx1)
        say = np.where(fwd, sy0, sy1)
        sbx = np.where(fwd, sx1, sx0)
        sby = np.where(fwd, sy1, sy0)

        # boundary containment (vectorized _on_polygon_boundary)
        on_b = np.zeros(nsub, dtype=bool)
        lo = tile_starts[sj]
        hi = np.searchsorted(segs.ax, sax, side="right")
        counts = np.maximum(hi - lo, 0)
        total = int(counts.sum())
        if total:
            k_rep = np.repeat(np.arange(nsub, dtype=np.int64), counts)
            cum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(counts)])
            t = np.arange(total, dtype=np.int64) - cum[k_rep] + lo[k_rep]
            pax, pay = segs.ax[t], segs.ay[t]
            pbx, pby = segs.bx[t], segs.by[t]
            c1 = (pbx - pax) * (say[k_rep] - pay) - (pby - pay) * (sax[k_rep] - pax)
            c2 = (pbx - pax) * (sby[k_rep] - pay) - (pby - pay) * (sbx[k_rep] - pax)
            lex_lo = (pax < sax[k_rep]) | ((pax == sax[k_rep]) & (pay <= say[k_rep]))
            lex_hi = (sbx[k_rep] < pbx) | ((sbx[k_rep] == pbx) & (sby[k_rep] <= pby))
            ok = (c1 == 0) & (c2 == 0) & lex_lo & lex_hi
            np.logical_or.at(on_b, k_rep, ok)

        # winding at midpoints (vectorized _winding_below)
        X2 = sx0 + sx1
        Y2 = sy0 + sy1
        wind = np.zeros(nsub, dtype=np.int64)
        hi = np.searchsorted(2 * segs.ax, X2, side="right")
        counts = np.maximum(hi - lo, 0)
        total = int(counts.sum())
        if total:
            k_rep = np.repeat(np.arange(nsub, dtype=np.int64), counts)
            cum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(counts)])
            t = np.arange(total, dtype=np.int64) - cum[k_rep] + lo[k_rep]
            dt = segs.bx[t] - segs.ax[t]
            m = (dt > 0) & (X2[k_rep] < 2 * segs.bx[t])
            if m.any():
                k_rep, t, dt = k_rep[m], t[m], dt[m]
                num = 2 * segs.ay[t] * dt + (segs.by[t] - segs.ay[t]) * (
                    X2[k_rep] - 2 * segs.ax[t]
                )
                below = num < Y2[k_rep] * dt
                if below.any():
                    np.add.at(wind, k_rep[below], segs.subj[t[below]])
        inside = _inside_vec(wind, fill_rule) != invert
        # boundary_included picks which side owns the boundary (see clip_paths)
        kept = np.where(on_b, boundary_included != invert, inside)

    # stitch per job (scalar tail, path order preserved) + un-offset
    out: list[list[np.ndarray]] = []
    pos = 0
    by_job: dict[int, tuple[list, list]] = {j: ([], []) for j in range(nj)}
    for i, s in enumerate(sub):
        by_job[sub_job[i]][0].append(s)
        by_job[sub_job[i]][1].append(bool(kept[i]) if nsub else False)
    for j in range(nj):
        if not has_body[j]:
            # empty body: scalar semantics (e.g. invert=True keeps everything)
            out.append(
                clip_path(
                    jobs[j][0], jobs[j][1], fill_rule, invert, boundary_included,
                    is_closed_path,
                )
            )
            continue
        subs_j, kept_j = by_job[j]
        paths = _stitch_paths(subs_j, kept_j)
        oj = int(off[j])
        out.append([p - np.array([oj, -y0], dtype=np.int64) for p in paths])
    return out


def _inside_vec(w: np.ndarray, fill_rule: FillRule) -> np.ndarray:
    if fill_rule == FillRule.EVEN_ODD:
        return (w & 1) != 0
    if fill_rule == FillRule.NON_ZERO:
        return w != 0
    if fill_rule == FillRule.POSITIVE:
        return w > 0
    return w < 0


def slice_batch(
    jobs: list[tuple[list[np.ndarray], list[np.ndarray]]],
    fill_rule: FillRule = FillRule.NON_ZERO,
    options: OverlayOptions = OverlayOptions(),
) -> list[list[list[np.ndarray]]]:
    """Batched slice_shape: body split+fill via kernel/batch.graph_batch (one
    tiled pass), walls via clip_paths_batch, then the per-job face walk (already
    per-job-sized work). Bit-identical to per-job slice_shape."""
    from .batch import graph_batch

    nj = len(jobs)
    if nj == 0:
        return []
    graphs = graph_batch([(body, []) for body, _ in jobs], fill_rule, options)
    if graphs is None:
        return [slice_shape(b, ps, fill_rule, options) for b, ps in jobs]
    # flatten (job, path) into clip jobs
    clip_jobs = []
    owner = []
    for j, (body, paths) in enumerate(jobs):
        for path in paths:
            clip_jobs.append((body, path))
            owner.append(j)
    clipped = clip_paths_batch(
        clip_jobs, fill_rule, invert=False, boundary_included=False
    )
    walls_by_job: dict[int, list[np.ndarray]] = {j: [] for j in range(nj)}
    for j, sub_paths in zip(owner, clipped):
        walls_by_job[j].extend(sub_paths)
    # body-crossing marks per job = wall points that are not original path
    # vertices (the batched clip has no string-string splits, so every inserted
    # point is a body crossing)
    out = []
    for j in range(nj):
        orig = {
            (int(p[0]), int(p[1]))
            for path in jobs[j][1]
            for p in np.asarray(path, dtype=np.int64).reshape(-1, 2)
        }
        marks = {
            (int(p[0]), int(p[1]))
            for w in walls_by_job[j]
            for p in w
        } - orig
        out.append(
            _slice_from_parts(graphs[j][0], graphs[j][1], walls_by_job[j], options, marks)
        )
    return out
