"""Contour extraction: filter boundary segments by overlay rule, walk the link graph
exactly as the reference does, bind holes to hulls.

Faithful re-derivation of the reference's extraction semantics:
- inclusion filter per rule on the 4-bit SegmentFill (iOverlay/src/build/boolean.rs:156-285)
  expressed as "TOP-side membership != BOTTOM-side membership";
- contour walk (iOverlay/src/core/extract.rs:64-230): start at the first unvisited link
  in (a,b) order, refine to the left-top link at its a-node
  (iOverlay/src/core/extract.rs:400-470), classify hole vs hull via is_fill_top
  (iOverlay/src/core/overlay_rule.rs:24-39), then walk with nearest-vector turns whose
  rotation depends on hole/hull and output direction
  (iOverlay/src/core/extract.rs:479-583, iOverlay/src/core/nearest_vector.rs) — this is
  what merges region boundaries into self-touching contours at pinch nodes, matching the
  golden fixtures;
- hole binding via the left-bottom anchor and the nearest segment strictly below
  (iOverlay/src/bind/solver.rs:25-236), resolved transitively with an exact PIP fallback.
"""

from __future__ import annotations

import numpy as np

from ..options import ContourDirection, OverlayOptions, OverlayRule
from .fill import CLIP_BOTTOM, CLIP_TOP, SUBJ_BOTTOM, SUBJ_TOP
from .segments import Segments


def rule_inside(subj_in: np.ndarray, clip_in: np.ndarray, rule: OverlayRule) -> np.ndarray:
    """Region membership of the boolean result given per-operand membership."""
    if rule == OverlayRule.SUBJECT:
        return subj_in
    if rule == OverlayRule.CLIP:
        return clip_in
    if rule == OverlayRule.INTERSECT:
        return subj_in & clip_in
    if rule == OverlayRule.UNION:
        return subj_in | clip_in
    if rule == OverlayRule.DIFFERENCE:
        return subj_in & ~clip_in
    if rule == OverlayRule.INVERSE_DIFFERENCE:
        return clip_in & ~subj_in
    if rule == OverlayRule.XOR:
        return subj_in ^ clip_in
    raise ValueError(rule)


def boundary_mask(fills: np.ndarray, rule: OverlayRule) -> np.ndarray:
    """A segment is a result boundary iff the result membership differs between its
    TOP and BOTTOM sides — equivalent to the reference's per-rule inclusion filters."""
    s_top = (fills & SUBJ_TOP) != 0
    s_bot = (fills & SUBJ_BOTTOM) != 0
    c_top = (fills & CLIP_TOP) != 0
    c_bot = (fills & CLIP_BOTTOM) != 0
    return rule_inside(s_top, c_top, rule) != rule_inside(s_bot, c_bot, rule)


def is_fill_top(fill: int, rule: OverlayRule) -> bool:
    """Is the region on the TOP side of this segment inside the result
    (iOverlay/src/core/overlay_rule.rs:24-39)?"""
    s_top = (fill & SUBJ_TOP) != 0
    c_top = (fill & CLIP_TOP) != 0
    return bool(rule_inside(np.bool_(s_top), np.bool_(c_top), rule))


def _cross(ux, uy, vx, vy):
    return ux * vy - uy * vx


def _nearest_link(c, va, cands, clockwise: bool):
    """NearestVector (iOverlay/src/core/nearest_vector.rs): among candidate links at
    node c, the nearest to vector va by the given rotation. cands: [(ox, oy, link_id)]
    with (ox, oy) = the candidate's other endpoint."""
    rf = 1 if clockwise else -1
    ox, oy, best = cands[0]
    vbx, vby = ox - c[0], oy - c[1]
    ab180 = _cross(va[0], va[1], vbx, vby) * rf >= 0
    for ox, oy, lid in cands[1:]:
        vpx, vpy = ox - c[0], oy - c[1]
        ap180 = _cross(va[0], va[1], vpx, vpy) * rf >= 0
        if ab180 == ap180:
            if _cross(vpx, vpy, vbx, vby) * rf < 0:
                vbx, vby, best = vpx, vpy, lid
        elif ab180:
            ab180 = False
            vbx, vby, best = vpx, vpy, lid
    return best


class _LinkGraph:
    """Boundary links + node incidence, mirroring OverlayGraph (nodes/links)."""

    def __init__(self, pts_a, pts_b, fills):
        self.a = pts_a  # list[(x, y)]
        self.b = pts_b
        self.fill = fills
        m = self.m = len(pts_a)
        if m < 256:
            # tiny graph (the batched-kernel common case): dict insertion beats
            # the np.unique/argsort constant costs by a wide margin.
            # a_node/b_node/visited stay PLAIN PYTHON lists throughout the walk:
            # every read in the walk loop is a scalar access from Python, where
            # numpy scalar indexing costs ~10x a list index
            node_ids: dict[tuple[int, int], int] = {}
            incid: list[list[int]] = []
            node_pt: list[tuple[int, int]] = []
            self.a_node = [0] * m
            self.b_node = [0] * m
            for e in range(m):
                for end, arr in ((pts_a[e], self.a_node), (pts_b[e], self.b_node)):
                    nid = node_ids.get(end)
                    if nid is None:
                        nid = len(node_ids)
                        node_ids[end] = nid
                        incid.append([])
                        node_pt.append(end)
                    arr[e] = nid
                    incid[nid].append(e)
            self.incid = incid
            self.node_pt = node_pt
            return
        # large graph: vectorized node building — first-occurrence-ordered unique
        # endpoint ids (identical to the dict loop: endpoints scanned in
        # (a0, b0, a1, b1, ...) order)
        ends = np.empty((2 * m, 2), dtype=np.int64)
        ends[0::2] = np.asarray(pts_a, dtype=np.int64).reshape(m, 2)
        ends[1::2] = np.asarray(pts_b, dtype=np.int64).reshape(m, 2)
        v = ends.view([("x", np.int64), ("y", np.int64)]).ravel()
        uniq, first, inv = np.unique(v, return_index=True, return_inverse=True)
        order = np.argsort(first, kind="stable")
        rank = np.empty_like(order)
        rank[order] = np.arange(len(order))
        node = rank[inv]
        self.a_node = node[0::2].tolist()
        self.b_node = node[1::2].tolist()
        n_nodes = len(uniq)
        link_of = np.repeat(np.arange(m, dtype=np.int64), 2)
        grp = np.argsort(node, kind="stable")
        counts = np.bincount(node, minlength=n_nodes)
        # slice a plain python list per node — np.split would allocate one
        # numpy array per node, ~10x the cost at mega-graph scale
        sl = link_of[grp].tolist()
        offs = np.concatenate(([0], np.cumsum(counts))).tolist()
        self.incid = [sl[offs[i]:offs[i + 1]] for i in range(n_nodes)]
        pts_first = ends[first[order]]
        self.node_pt = list(map(tuple, pts_first.tolist()))

    def other(self, link: int, node: int) -> int:
        return int(self.b_node[link]) if self.a_node[link] == node else int(self.a_node[link])

    def other_pt(self, link: int, node: int):
        return self.b[link] if self.a_node[link] == node else self.a[link]

    def next_link(self, link: int, node: int, clockwise: bool, visited) -> int:
        """Reference next_link (iOverlay/src/core/extract.rs:479-583)."""
        inc = self.incid[node]
        if len(inc) == 2:
            # degree-2 node (the overwhelming case): the incoming link is
            # already visited, so at most one candidate remains
            i0, i1 = inc
            if visited[i0]:
                return -1 if visited[i1] else i1
            if visited[i1]:
                return i0
            cands = inc
        else:
            cands = [i for i in inc if not visited[i]]
        if not cands:
            return -1
        if len(cands) == 1:
            return cands[0]
        c = self.node_pt[node]
        # va = back along the incoming link
        if self.a_node[link] == node:
            apt = self.b[link]
        else:
            apt = self.a[link]
        va = (apt[0] - c[0], apt[1] - c[1])
        cl = [(self.other_pt(i, node)[0], self.other_pt(i, node)[1], i) for i in cands]
        return _nearest_link(c, va, cl, clockwise)

    def left_top_link(self, link: int, visited) -> int:
        """Reference find_left_top_link (iOverlay/src/core/extract.rs:400-470): at the
        start link's a-node, the unvisited link with the topmost direction."""
        node = int(self.a_node[link])
        top = link
        ta = self.a[top]
        tb = self.b[top]
        for i in self.incid[node]:
            if i == top:
                continue
            cb = self.b[i]
            # skip if cb is clockwise of (ta -> tb)
            if _cross(tb[0] - ta[0], tb[1] - ta[1], cb[0] - ta[0], cb[1] - ta[1]) < 0:
                continue
            if visited[i]:
                continue
            top = i
            ta = self.a[top]
            tb = self.b[top]
        return top


def walk_contours(
    segs: Segments,
    fills: np.ndarray,
    rule: OverlayRule,
    clockwise_output: bool,
    boundary: np.ndarray | None = None,
    graph: "_LinkGraph | None" = None,
) -> list[tuple[list[tuple[int, int]], bool]]:
    """Extract all contours for a rule. Returns [(ring_points, is_hole)].

    boundary: optional precomputed boundary_mask(fills, rule) — the batch kernel
    computes it once per rule over a whole batch and slices per tile.

    graph: optional prebuilt _LinkGraph over ALL of segs' links (the batch
    kernel builds ONE per tile and reuses it for every rule): non-boundary
    links start pre-visited, which yields identical walks — candidate lists
    are filtered by `visited`, and the relative order of the surviving links
    matches the boundary-subset graph exactly."""
    mask = boundary_mask(fills, rule) if boundary is None else boundary
    if graph is not None:
        if not mask.any():
            return []
        g = graph
        visited = np.logical_not(mask).tolist()
    else:
        idx = np.flatnonzero(mask)
        if len(idx) == 0:
            return []
        pts_a = list(zip(segs.ax[idx].tolist(), segs.ay[idx].tolist()))
        pts_b = list(zip(segs.bx[idx].tolist(), segs.by[idx].tolist()))
        bfills = fills[idx].tolist()
        g = _LinkGraph(pts_a, pts_b, bfills)
        visited = [False] * g.m
    out: list[tuple[list[tuple[int, int]], bool]] = []

    for start in range(g.m):
        if visited[start]:
            continue
        top = g.left_top_link(start, visited)
        hole = is_fill_top(g.fill[top], rule)
        d = hole == clockwise_output

        if d:
            ring = [g.b[top]]
            node = int(g.a_node[top])
            last_node = int(g.b_node[top])
        else:
            ring = [g.a[top]]
            node = int(g.b_node[top])
            last_node = int(g.a_node[top])
        visited[top] = True

        last_link = g.next_link(top, last_node, not d, visited)
        link = top
        if last_link < 0:
            # isolated degenerate pair; nothing to close
            out.append((ring, hole))
            continue
        guard = 4 * g.m + 8
        # hot loop: degree-2 advance inlined (the incoming link is visited, so
        # exactly one candidate remains) — falls back to next_link for true
        # junction nodes
        incid, a_node, b_node, node_pt = g.incid, g.a_node, g.b_node, g.node_pt
        while link != last_link and guard > 0:
            guard -= 1
            inc = incid[node]
            if len(inc) == 2:
                i0, i1 = inc
                if visited[i0]:
                    nxt = -1 if visited[i1] else i1
                elif visited[i1]:
                    nxt = i0
                else:
                    nxt = g.next_link(link, node, d, visited)
            else:
                nxt = g.next_link(link, node, d, visited)
            if nxt < 0:
                break
            link = nxt
            ring.append(node_pt[node])
            node = b_node[link] if a_node[link] == node else a_node[link]
            visited[link] = True
        out.append((ring, hole))
    return out


def ring_area2(pts) -> int:
    """Signed shoelace *2 in exact Python ints (CCW positive)."""
    n = len(pts)
    s = 0
    for i in range(n):
        x0, y0 = int(pts[i][0]), int(pts[i][1])
        x1, y1 = int(pts[(i + 1) % n][0]), int(pts[(i + 1) % n][1])
        s += x0 * y1 - x1 * y0
    return s


def _ring_scan(pts) -> tuple[int, bool]:
    """One fused pass: (shoelace*2, no-degenerate-vertices). Duplicate and
    collinear drops never change the shoelace sum, so when the ring is clean
    (the common case) this replaces a simplify_ring pass AND ring_area2; when
    it is not, the area still stands for the simplified ring."""
    n = len(pts)
    s = 0
    clean = True
    p0 = pts[n - 2]
    p1 = pts[n - 1]
    for i in range(n):
        p2 = pts[i]
        s += p1[0] * p2[1] - p2[0] * p1[1]
        if clean and (
            p1 == p0
            or (p1[0] - p0[0]) * (p2[1] - p1[1])
            == (p1[1] - p0[1]) * (p2[0] - p1[0])
        ):
            clean = False
        p0 = p1
        p1 = p2
    return s, clean


def _ring_scan_np(arr: np.ndarray) -> tuple[int, bool]:
    """Vectorized _ring_scan for long ndarray rings — exact: shoelace terms are
    int64 (|term| <= 2*mx^2 < 2^61 under the coordinate guard) and the running
    sum, which CAN overflow int64 at 400k terms, is split into hi/lo 32-bit
    halves summed separately (each bounded by n*2^32) and recombined as python
    ints. Same vertex checks as the scalar scan (dup + collinear cross)."""
    x = arr[:, 0]
    y = arr[:, 1]
    mx = int(np.abs(arr).max(initial=0))
    if 4 * mx * mx >= (1 << 62):
        return _ring_scan([tuple(p) for p in arr.tolist()])
    x1 = np.roll(x, -1)
    y1 = np.roll(y, -1)
    terms = x * y1 - x1 * y
    hi = terms >> 32
    lo = terms - (hi << 32)
    s = (int(hi.sum()) << 32) + int(lo.sum())
    x0 = np.roll(x, 1)
    y0 = np.roll(y, 1)
    if ((x == x0) & (y == y0)).any():
        return s, False
    cr = (x - x0) * (y1 - y) - (y - y0) * (x1 - x)
    return s, not bool((cr == 0).any())


def simplify_ring(pts: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Drop repeated and collinear vertices (reference contour validation,
    iOverlay/src/core/extract.rs:312-333)."""
    changed = True
    while changed:
        changed = False
        n = len(pts)
        if n < 3:
            return []
        keep = []
        for i in range(n):
            p0 = pts[i - 1]
            p1 = pts[i]
            p2 = pts[(i + 1) % n]
            if p1 == p0:
                changed = True
                continue
            if _cross(p1[0] - p0[0], p1[1] - p0[1], p2[0] - p1[0], p2[1] - p1[1]) == 0:
                # collinear (straight-through or spike) vertices are dropped
                changed = True
                continue
            keep.append(p1)
        pts = keep
    return pts


def _point_in_ring(x: int, y: int, ring) -> bool:
    """Exact even-odd ray cast (downward ray, [ax, bx) convention)."""
    inside = False
    n = len(ring)
    for i in range(n):
        ax, ay = int(ring[i][0]), int(ring[i][1])
        bx, by = int(ring[(i + 1) % n][0]), int(ring[(i + 1) % n][1])
        if ax > bx:
            ax, ay, bx, by = bx, by, ax, ay
        if ax <= x < bx:
            if (by - ay) * (x - ax) < (y - ay) * (bx - ax):
                inside = not inside
    return inside


def bind_holes(hulls: list, holes: list) -> list[list]:
    """Assign each hole to its parent ring via the nearest segment strictly below the
    hole's left-bottom anchor (reference ShapeBinder, iOverlay/src/bind/solver.rs:25-236),
    resolving hole->hole transitively; PIP fallback."""
    shapes = [[h] for h in hulls]
    if not holes:
        return shapes

    # scanning copies: ndarray rings (the long-ring fast path) degrade python
    # per-element indexing ~20x — normalize to lists for the binder's loops
    # while `shapes` keeps the original objects for output
    hulls = [r.tolist() if isinstance(r, np.ndarray) else r for r in hulls]
    holes_scan = [r.tolist() if isinstance(r, np.ndarray) else r for r in holes]

    seg_rows = []  # (ax, ay, bx, by, kind, ridx)
    for kind, rings in ((0, hulls), (1, holes_scan)):
        for ridx, ring in enumerate(rings):
            n = len(ring)
            ccw = ring_area2(ring) > 0
            for i in range(n):
                ax, ay = int(ring[i][0]), int(ring[i][1])
                bx, by = int(ring[(i + 1) % n][0]), int(ring[(i + 1) % n][1])
                if ax == bx:
                    continue
                if kind == 0:
                    # the hull's INTERIOR must lie above the segment for it to be
                    # a valid "first below the anchor" parent witness (reference
                    # ShapeBinder reads the same from is_fill_top): a CCW ring
                    # has interior above exactly its +x-traversed edges. Shared
                    # face boundaries appear once per adjacent face with opposite
                    # directions — this filter picks the face that contains the
                    # anchor instead of an arbitrary one.
                    if (ax < bx) != ccw:
                        continue
                if ax > bx:
                    ax, ay, bx, by = bx, by, ax, ay
                seg_rows.append((ax, ay, bx, by, kind, ridx))

    anchors = []
    for hidx, ring in enumerate(holes_scan):
        k = min(range(len(ring)), key=lambda i: (int(ring[i][0]), int(ring[i][1])))
        anchors.append((int(ring[k][0]), int(ring[k][1]), hidx))

    parent_of_hole: dict[int, tuple[int, int]] = {}
    for x, y, hidx in anchors:
        best = None
        for ax, ay, bx, by, kind, ridx in seg_rows:
            if kind == 1 and ridx == hidx:
                continue
            if not (ax <= x < bx):
                continue
            den = bx - ax
            num = ay * den + (by - ay) * (x - ax)
            if num >= y * den:
                continue
            if best is None or num * best[1] > best[0] * den:
                best = (num, den, kind, ridx)
        if best is not None:
            parent_of_hole[hidx] = (best[2], best[3])

    def hull_of(hidx, depth=0):
        if depth > len(holes) + 1:
            return None
        p = parent_of_hole.get(hidx)
        if p is None:
            return None
        kind, ridx = p
        if kind == 0:
            return ridx
        return hull_of(ridx, depth + 1)

    for x, y, hidx in anchors:
        hull_idx = hull_of(hidx)
        if hull_idx is None:
            containing = [i for i, h in enumerate(hulls) if _point_in_ring(x, y, h)]
            if not containing:
                continue
            hull_idx = min(containing, key=lambda i: abs(ring_area2(hulls[i])))
        shapes[hull_idx].append(holes[hidx])
    return shapes


def extract_shapes(
    segs: Segments,
    fills: np.ndarray,
    rule: OverlayRule,
    options: OverlayOptions,
    boundary: np.ndarray | None = None,
    contours: list | None = None,
    graph: "_LinkGraph | None" = None,
    with_areas: bool = False,
) -> list[list[np.ndarray]]:
    """Full extraction: boundary filter -> reference walk -> validate -> hole binding.

    Returns shapes: list of [hull, hole, hole, ...] rings as (n,2) int64 arrays
    (with with_areas=True, a (shapes, areas) pair — see finalize_contours).
    `contours` may carry precomputed [(ring_points, is_hole)] (the batch kernel's
    vectorized degree-2 walk) — must equal walk_contours' output exactly."""
    clockwise_output = options.output_direction == ContourDirection.CLOCKWISE
    if contours is None and graph is None and len(segs) >= 4096:
        # big single-job graphs (e.g. a spiral's 400k-link ring): try the
        # vectorized degree-2 walk before the per-link python loop; pinch
        # nodes / degenerate incidences return None and fall through
        contours = _fast_walk_contours(segs, fills, rule, clockwise_output, boundary)
    if contours is None:
        contours = walk_contours(segs, fills, rule, clockwise_output, boundary, graph)
    return finalize_contours(contours, options, with_areas=with_areas)


def _fast_walk_contours(segs, fills, rule, clockwise_output, boundary):
    """walk_contours-identical [(ring, hole)] via the batch kernel's vectorized
    degree-2 walk over ONE whole segment set (single slot, unbounded ring
    length — long rings take its list-ranking branch), or None when the graph
    has nodes the fast walk cannot serve (the caller then runs the scalar
    walk)."""
    from .batch import _fast_contours_batch

    mask = boundary_mask(fills, rule) if boundary is None else boundary
    if not mask.any():
        return []
    starts = np.array([0, len(segs)], dtype=np.int64)
    tile_fast, ring_data = _fast_contours_batch(
        segs, mask, fills, starts, rule, clockwise_output,
        np.zeros(1, dtype=np.int64), 0, max_ring=1 << 62,
    )
    if not tile_fast[0]:
        return None
    if ring_data is None:
        return []
    out = []
    for i in range(len(ring_data["slot"])):
        L = int(ring_data["len"][i])
        if L >= 4096:
            # long rings stay numpy end-to-end: finalize_contours scans them
            # vectorized (_ring_scan_np) and emits the array without a copy —
            # the list-of-tuples round trip cost ~0.3 s on a 400k-point ring
            arr = np.empty((L, 2), dtype=np.int64)
            arr[0, 0] = ring_data["first_x"][i]
            arr[0, 1] = ring_data["first_y"][i]
            arr[1:, 0] = ring_data["buf_x"][i, : L - 1]
            arr[1:, 1] = ring_data["buf_y"][i, : L - 1]
            out.append((arr, bool(ring_data["hole"][i])))
            continue
        ring = [(int(ring_data["first_x"][i]), int(ring_data["first_y"][i]))]
        ring.extend(
            zip(
                ring_data["buf_x"][i, : L - 1].tolist(),
                ring_data["buf_y"][i, : L - 1].tolist(),
            )
        )
        out.append((ring, bool(ring_data["hole"][i])))
    return out


def finalize_contours(
    contours: list, options: OverlayOptions, with_areas: bool = False
) -> list[list[np.ndarray]]:
    """Validate walked contours (dedupe/collinear, min-area) and bind holes —
    the back half of extract_shapes, callable directly when the caller already
    ran the walk (the batch kernel walks with a shared per-tile graph).

    with_areas=True additionally returns the per-ring signed shoelace area2
    aligned with the shapes structure — the validation scan computes it anyway
    (dup/collinear drops never change the shoelace sum), so consumers that
    emit area columns should take it here instead of re-walking every ring."""
    hulls: list[list[tuple[int, int]]] = []
    holes: list[list[tuple[int, int]]] = []
    min_area2 = 2 * options.min_output_area
    amap: dict[int, int] = {}
    for ring, hole in contours:
        if len(ring) < 3:
            continue
        is_np = isinstance(ring, np.ndarray)
        if not options.preserve_output_collinear:
            a2, ring_clean = _ring_scan_np(ring) if is_np else _ring_scan(ring)
            if not ring_clean:
                ring = simplify_ring(
                    [tuple(p) for p in ring.tolist()] if is_np else list(ring)
                )
                if len(ring) < 3:
                    continue
        elif is_np:
            a2 = _ring_scan_np(ring)[0]
        else:
            a2 = ring_area2(ring)
        if a2 == 0 or (min_area2 > 0 and abs(a2) < min_area2):
            continue
        if with_areas:
            amap[id(ring)] = int(a2)
        if hole:
            holes.append(ring)
        else:
            hulls.append(ring)

    shapes = bind_holes(hulls, holes)
    out = [
        [
            ring if isinstance(ring, np.ndarray) else np.array(ring, dtype=np.int64)
            for ring in shape
        ]
        for shape in shapes
    ]
    if not with_areas:
        return out
    areas = [[amap[id(ring)] for ring in shape] for shape in shapes]
    return out, areas


class _StartPath:
    """StartPathData (iOverlay/src/core/extract.rs:279-300)."""

    __slots__ = ("begin", "node_id", "link_id", "last_node_id")

    def __init__(self, g: "_LinkGraph", direction: bool, link_id: int):
        self.link_id = link_id
        if direction:
            self.begin = g.b[link_id]
            self.node_id = int(g.a_node[link_id])
            self.last_node_id = int(g.b_node[link_id])
        else:
            self.begin = g.a[link_id]
            self.node_id = int(g.b_node[link_id])
            self.last_node_id = int(g.a_node[link_id])


def _find_contour(g: "_LinkGraph", start: _StartPath, clockwise: bool,
                  state: int, visited: np.ndarray) -> list[tuple[int, int]]:
    """find_contour over a VisitState array (0 = unvisited, anything else =
    visited); marks walked links with `state`
    (iOverlay/src/core/extract.rs:189-221)."""
    link = start.link_id
    node = start.node_id
    visited[link] = state
    ring = [start.begin]
    last_link = g.next_link(link, start.last_node_id, not clockwise, visited)
    guard = 4 * g.m + 8
    while link != last_link and guard > 0:
        guard -= 1
        link = g.next_link(link, node, clockwise, visited)
        if link < 0:
            break
        ring.append(g.node_pt[node])
        node = g.other(link, node)
        visited[link] = state
    return ring


def _validate_ring(ring, options: OverlayOptions):
    if not options.preserve_output_collinear:
        ring = simplify_ring(list(map(tuple, ring)))
    if len(ring) < 3:
        return None
    a2 = ring_area2(ring)
    if a2 == 0 or (options.min_output_area > 0 and abs(a2) < 2 * options.min_output_area):
        return None
    return ring


# VisitState codes (extract_ogc.rs VisitState)
_UNVISITED, _SKIPPED, _HULL_V, _HOLE_V = 0, 1, 2, 3


def _skip_contour(g, start: _StartPath, clockwise: bool, state: int, visited) -> None:
    # (iOverlay/src/core/extract_ogc.rs:176-211)
    link = start.link_id
    node = start.node_id
    visited[link] = state
    last_link = g.next_link(link, start.last_node_id, not clockwise, visited)
    guard = 4 * g.m + 8
    while link != last_link and guard > 0:
        guard -= 1
        link = g.next_link(link, node, clockwise, visited)
        if link < 0:
            break
        node = g.other(link, node)
        visited[link] = state


def _collect_shape(g, start: _StartPath, clockwise: bool, visited,
                   options: OverlayOptions):
    """collect_shape (iOverlay/src/core/extract_ogc.rs:213-349): walk the full
    tour, then re-walk it in REVERSE rotation restricted to the tour's own edge
    set — self-touching sub-loops escape the reverse walk and become this
    shape's holes."""
    link = start.link_id
    node = start.node_id
    contour_visited = np.full(g.m, _SKIPPED, dtype=np.int8)
    visited[link] = _HULL_V
    contour_visited[link] = _UNVISITED
    end_link = link
    original_len = 1
    last_link = g.next_link(link, start.last_node_id, not clockwise, visited)
    guard = 4 * g.m + 8
    while link != last_link and guard > 0:
        guard -= 1
        link = g.next_link(link, node, clockwise, visited)
        if link < 0:
            break
        node = g.other(link, node)
        end_link = max(end_link, link)
        contour_visited[link] = _UNVISITED
        visited[link] = _HULL_V
        original_len += 1

    ring = _find_contour(g, start, not clockwise, _HULL_V, contour_visited)
    outer = _validate_ring(ring, options)
    shape = [outer] if outer is not None else None

    if len(ring) < original_len:
        # the tour self-touches: leftover edges are holes of this shape
        li = start.link_id
        while li <= end_link:
            if contour_visited[li]:
                li += 1
                continue
            top = g.left_top_link(li, contour_visited)
            hstart = _StartPath(g, clockwise, top)
            hring = _find_contour(g, hstart, clockwise, _HOLE_V, contour_visited)
            if shape is not None:
                hr = _validate_ring(hring, options)
                if hr is None:
                    li += 1
                    continue
                shape.append(hr)
    return shape


def extract_shapes_ogc(
    segs: Segments,
    fills: np.ndarray,
    rule: OverlayRule,
    options: OverlayOptions,
) -> list[list[np.ndarray]]:
    """S7 OGC-valid extraction (ISO 19125-1 connected interiors): hulls collect
    in a first pass with the main-direction-opposed traversal (pinch-point
    shapes split; self-touch loops become per-shape holes), hole contours walk
    in a second pass where touching holes MERGE through pinch vertices, then
    bind to hulls (reference extract_ogc, iOverlay/src/core/extract_ogc.rs:19-174)."""
    is_cw = options.output_direction == ContourDirection.CLOCKWISE
    mask = boundary_mask(fills, rule)
    idx = np.flatnonzero(mask)
    if len(idx) == 0:
        return []
    pts_a = list(zip(segs.ax[idx].tolist(), segs.ay[idx].tolist()))
    pts_b = list(zip(segs.bx[idx].tolist(), segs.by[idx].tolist()))
    g = _LinkGraph(pts_a, pts_b, fills[idx].tolist())

    visited = np.zeros(g.m, dtype=np.int8)
    shapes: list[list] = []
    any_holes = False
    trav = not is_cw
    li = 0
    while li < g.m:
        if visited[li]:
            li += 1
            continue
        top = g.left_top_link(li, visited)
        hole = is_fill_top(g.fill[top], rule)
        direction = hole == is_cw
        start = _StartPath(g, direction, top)
        if hole:
            _skip_contour(g, start, trav, _HOLE_V, visited)
            any_holes = True
            continue
        shape = _collect_shape(g, start, trav, visited, options)
        if shape is not None:
            shapes.append(shape)
        else:
            li += 1

    holes: list[list] = []
    if any_holes:
        visited = np.where(visited == _HOLE_V, _UNVISITED, _SKIPPED).astype(np.int8)
        li = 0
        while li < g.m:
            if visited[li]:
                li += 1
                continue
            top = g.left_top_link(li, visited)
            start = _StartPath(g, is_cw, top)
            ring = _find_contour(g, start, is_cw, _HULL_V, visited)
            vr = _validate_ring(ring, options)
            if vr is None:
                li += 1
                continue
            holes.append(vr)

    if holes:
        bound = bind_holes([s[0] for s in shapes], holes)
        shapes = [shapes[i] + bound[i][1:] for i in range(len(shapes))]
    return [[np.array(r, dtype=np.int64) for r in shape] for shape in shapes]


def walk_vectors(
    segs: Segments,
    fills: np.ndarray,
    rule: OverlayRule,
    clockwise_output: bool = False,
) -> list[tuple[list[tuple[int, int, int, int, int]], bool]]:
    """S8 edge-level walk: like walk_contours, but each traversed link emits a
    DIRECTED edge (ax, ay, bx, by, fill) carrying its 4-bit SegmentFill
    (reference build_shape_vectors, iOverlay/src/core/overlay.rs:260-298 +
    vector/extract.rs). Edge k of a ring spans ring[k] -> ring[k+1] via the
    k-th link selected by the walk; the fill is the link's SideFill
    (iOverlay/src/vector/edge.rs:13-31): the raw SegmentFill when the edge is
    traversed in the stored a<b direction (TOP = left), with left/right bits
    swapped when traversed reversed. Returns [(edges, is_hole)]."""

    def side(fill: int, forward: bool) -> int:
        if forward:
            return fill
        return (((fill & 1) << 1) | ((fill & 2) >> 1)
                | ((fill & 4) << 1) | ((fill & 8) >> 1))
    mask = boundary_mask(fills, rule)
    idx = np.flatnonzero(mask)
    if len(idx) == 0:
        return []
    pts_a = list(zip(segs.ax[idx].tolist(), segs.ay[idx].tolist()))
    pts_b = list(zip(segs.bx[idx].tolist(), segs.by[idx].tolist()))
    bfills = fills[idx].tolist()
    g = _LinkGraph(pts_a, pts_b, bfills)

    visited = [False] * g.m
    out = []
    for start in range(g.m):
        if visited[start]:
            continue
        top = g.left_top_link(start, visited)
        hole = is_fill_top(g.fill[top], rule)
        d = hole == clockwise_output
        if d:
            pts = [g.b[top]]
            node = int(g.a_node[top])
            last_node = int(g.b_node[top])
        else:
            pts = [g.a[top]]
            node = int(g.b_node[top])
            last_node = int(g.a_node[top])
        visited[top] = True
        lfills = [side(int(g.fill[top]), not d)]
        last_link = g.next_link(top, last_node, not d, visited)
        link = top
        if last_link < 0:
            out.append(([], hole))
            continue
        guard = 4 * g.m + 8
        while link != last_link and guard > 0:
            guard -= 1
            link = g.next_link(link, node, d, visited)
            if link < 0:
                break
            pts.append(g.node_pt[node])
            lfills.append(side(int(g.fill[link]), int(g.a_node[link]) == node))
            node = g.other(link, node)
            visited[link] = True
        n = len(pts)
        edges = [
            (pts[k][0], pts[k][1], pts[(k + 1) % n][0], pts[(k + 1) % n][1], lfills[k])
            for k in range(n)
        ]
        out.append((edges, hole))
    return out


def build_shape_vectors(
    subj: list,
    clip: list,
    fill_rule,
    rule: OverlayRule,
    options: OverlayOptions | None = None,
) -> list[list[list[tuple[int, int, int, int, int]]]]:
    """One-shot S8 vector output: shapes -> contours -> directed (a, b, fill)
    edges (reference Overlay::build_shape_vectors). Holes bind to hulls by the
    same anchor rules as shape extraction."""
    from .overlay import build_graph

    options = options or OverlayOptions()
    g = build_graph(subj, clip, fill_rule, options)
    walked = walk_vectors(g.segments, g.fills, rule,
                          options.output_direction == ContourDirection.CLOCKWISE)
    hulls, holes = [], []
    for edges, hole in walked:
        if len(edges) < 3:
            continue
        ring = [(e[0], e[1]) for e in edges]
        if ring_area2(ring) == 0:
            continue
        (holes if hole else hulls).append(edges)
    shapes = [[h] for h in hulls]
    if holes:
        bound = bind_holes([[(e[0], e[1]) for e in h] for h in hulls],
                           [[(e[0], e[1]) for e in h] for h in holes])
        ring_to_hole = { }
        for hi, h in enumerate(holes):
            key = tuple((e[0], e[1]) for e in h)
            ring_to_hole[key] = hi
        for si, sh in enumerate(bound):
            for extra in sh[1:]:
                hi = ring_to_hole.get(tuple(extra))
                if hi is not None:
                    shapes[si].append(holes[hi])
    return shapes
