"""Self-intersection resolution: snap-rounded segment splitting to a fixpoint.

Semantics match the reference split stage:
- pair classification & exact integer intersection with round-half-away-from-zero
  (iOverlay/src/split/cross_solver.rs:76-311),
- snap-to-near-endpoint within a growing radius 2^(start + k*step), capped at 2^60
  (iOverlay/src/split/snap_radius.rs:5-27),
- mark application: sort marks along the segment, dedupe, split into sub-segments,
  re-sort + re-merge (iOverlay/src/split/solver.rs:158-302),
- repeat rounds while any intersection required rounding
  (iOverlay/src/split/solver_list.rs:27-64).

Candidate-pair generation is vectorized (x-sweep + bbox masks). Exact math runs
through the vectorized int64 solver (cross_vec.cross_pairs_batch) whenever every
coordinate is under 2^30; beyond that it falls back to the python-int scalar
`cross_pair` per candidate pair. At Spark scale this same kernel runs per grid
cell inside applyInPandas (SURVEY.md A6).
"""

from __future__ import annotations

import os

import numpy as np

from .segments import Segments, sort_and_merge


def _orient(ax, ay, bx, by, cx, cy) -> int:
    """sign of cross(b-a, c-a); +1 = c is left (CCW) of a->b."""
    v = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    return (v > 0) - (v < 0)


def _cross_point(t, o):
    """Exact integer intersection of two properly-crossing segments, reference rounding
    (iOverlay/src/split/cross_solver.rs:218-311): translate by t.a, axis-aligned special
    cases use truncating division, general case rounds half away from zero on magnitudes.
    Returns (x, y, exact: bool)."""
    tax, tay, tbx, tby = t
    oax, oay, obx, oby = o
    a1x = tbx - tax
    b0x = oax - tax
    b1x = obx - tax
    a1y = tby - tay
    b0y = oay - tay
    b1y = oby - tay

    dy_b = b0y - b1y
    dx_b = b0x - b1x
    xy_b = b0x * b1y - b0y * b1x

    if a1x == 0:
        x0 = 0
        n, d = xy_b, dx_b
        q = abs(n) // abs(d)
        y0 = q if (n >= 0) == (d >= 0) else -q
        exact = (abs(n) % abs(d)) == 0
    elif a1y == 0:
        y0 = 0
        n, d = -xy_b, dy_b
        q = abs(n) // abs(d)
        x0 = q if (n >= 0) == (d >= 0) else -q
        exact = (abs(n) % abs(d)) == 0
    else:
        div = a1y * dx_b - a1x * dy_b
        s = (1 if div > 0 else -1) * (1 if xy_b > 0 else (-1 if xy_b < 0 else 0))
        sx = (1 if a1x > 0 else -1) * s
        sy = (1 if a1y > 0 else -1) * s
        uxy_b = abs(xy_b)
        udiv = abs(div)
        kx = abs(a1x) * uxy_b
        ky = abs(a1y) * uxy_b
        # divide with rounding (round half up on magnitudes)
        ux = (kx + (udiv >> 1)) // udiv
        uy = (ky + (udiv >> 1)) // udiv
        x0 = sx * ux
        y0 = sy * uy
        exact = (kx % udiv) == 0 and (ky % udiv) == 0
    return x0 + tax, y0 + tay, exact


def _on_line(ax, ay, bx, by, px, py) -> bool:
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax) == 0


def _sqr_dist(ax, ay, bx, by) -> int:
    return (ax - bx) ** 2 + (ay - by) ** 2


def cross_pair(ti, tj, radius):
    """Classify a candidate pair. Returns (marks, is_round) where marks is a list of
    (which, x, y) with which in {0 (target/i), 1 (other/j)}.

    Mirrors CrossSolver::cross + SplitSolver::cross mark routing
    (iOverlay/src/split/cross_solver.rs:76-216, iOverlay/src/split/solver.rs:85-158)."""
    tax, tay, tbx, tby = ti
    oax, oay, obx, oby = tj
    o1 = _orient(tax, tay, tbx, tby, oax, oay)  # a0b0a1
    o2 = _orient(tax, tay, tbx, tby, obx, oby)  # a0b0b1
    o3 = _orient(oax, oay, obx, oby, tax, tay)  # a1b1a0
    o4 = _orient(oax, oay, obx, oby, tbx, tby)  # a1b1b0
    s = (o1 == 0) + (o2 == 0) + (o3 == 0) + (o4 == 0)

    if s == 4:
        # collinear overlay: mark each segment at the other's strictly-interior endpoints
        marks = []
        # endpoint strictly inside test via lexicographic betweenness (segments a<b lex)
        def inside(px, py, ax, ay, bx, by):
            lo = (ax, ay) < (px, py)
            hi = (px, py) < (bx, by)
            return lo and hi

        if inside(tax, tay, oax, oay, obx, oby):
            marks.append((1, tax, tay))
        if inside(tbx, tby, oax, oay, obx, oby):
            marks.append((1, tbx, tby))
        if inside(oax, oay, tax, tay, tbx, tby):
            marks.append((0, oax, oay))
        if inside(obx, oby, tax, tay, tbx, tby):
            marks.append((0, obx, oby))
        return marks, False

    if s > 1 or o1 == o2 or o3 == o4:
        return [], False

    if s == 1:
        # T-junction: one endpoint lies on the other segment's interior
        if o1 == 0:
            return [(0, oax, oay)], False
        if o2 == 0:
            return [(0, obx, oby)], False
        if o3 == 0:
            return [(1, tax, tay)], False
        return [(1, tbx, tby)], False

    # proper middle cross
    px, py, exact = _cross_point(ti, tj)
    if exact and _on_line(tax, tay, tbx, tby, px, py) and _on_line(oax, oay, obx, oby, px, py):
        return [(0, px, py), (1, px, py)], False

    # rounded: snap to nearest endpoint within radius (r >= 2 covers 1^2+1^2)
    ra0 = _sqr_dist(tax, tay, px, py)
    rb0 = _sqr_dist(tbx, tby, px, py)
    ra1 = _sqr_dist(oax, oay, px, py)
    rb1 = _sqr_dist(obx, oby, px, py)
    if min(ra0, rb0, ra1, rb1) <= radius:
        r0 = min(ra0, rb0)
        r1 = min(ra1, rb1)
        if r0 <= r1:
            qx, qy = (tax, tay) if ra0 < rb0 else (tbx, tby)
            if not _on_line(oax, oay, obx, oby, qx, qy):
                return [(1, qx, qy)], True
        else:
            qx, qy = (oax, oay) if ra1 < rb1 else (obx, oby)
            if not _on_line(tax, tay, tbx, tby, qx, qy):
                return [(0, qx, qy)], True
    return [(0, px, py), (1, px, py)], True


def _candidate_pairs_grid(
    segs: Segments, ymin: np.ndarray, ymax: np.ndarray, est_x: int,
    threads: int | None = None,
) -> np.ndarray | None:
    """Exact bbox-overlap candidate pairs via grid-cover co-cell pairing.

    Two overlapping bboxes share every cell containing a point of their
    intersection, so co-cell pairs are a SUPERSET of bbox-overlap pairs; the
    final mask makes the result exact. The cell size is grown until the cover
    fits a row budget (long segments cover many cells at small sizes). Returns
    None when the within-cell pair total would not beat the x-window estimate
    — the caller falls back."""
    n = len(segs)
    ax, bx = segs.ax, segs.bx
    w = np.maximum(bx - ax, ymax - ymin)
    # start at the median bbox dimension, grow until cover rows fit the budget
    shift = max(int(np.median(w)), 1).bit_length()
    budget = 8 * n
    for _ in range(40):
        wx = (bx >> shift) - (ax >> shift) + 1
        wy = (ymax >> shift) - (ymin >> shift) + 1
        c = wx * wy
        total = int(c.sum())
        if total <= budget:
            break
        shift += 1
    else:
        return None
    # then SHRINK to the finest grid still inside the budget: when bbox sizes
    # span decades (nested/concentric rings) the median start leaves a handful
    # of giant cells holding ~everything, and within-cell enumeration goes
    # quadratic no matter the window order — finer cells cut the crowding at
    # the same cover-row cost (measured 11x on the nested_squares scenario)
    while shift > 1:
        wx2 = (bx >> (shift - 1)) - (ax >> (shift - 1)) + 1
        wy2 = (ymax >> (shift - 1)) - (ymin >> (shift - 1)) + 1
        c2 = wx2 * wy2
        t2 = int(c2.sum())
        if t2 > budget:
            break
        shift -= 1
        wx, wy, c, total = wx2, wy2, c2, t2
    cum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(c)])
    rep = np.repeat(np.arange(n, dtype=np.int64), c)
    k = np.arange(total, dtype=np.int64) - cum[rep]
    gx = (ax[rep] >> shift) + k // wy[rep]
    gy = (ymin[rep] >> shift) + k % wy[rep]
    key = (gx - gx.min()) * (int(gy.max() - gy.min()) + 1) + (gy - gy.min())
    # cell-id sort: pack key|index into one uint64 and direct-sort when the bit
    # budget fits (~7x an indirect stable argsort — measured; index in the low
    # bits keeps it stable, so the output order is identical)
    bits_idx = max(total - 1, 1).bit_length()
    if total and int(key.max()).bit_length() + bits_idx <= 64:
        packed = (key.astype(np.uint64) << np.uint64(bits_idx)) | np.arange(
            total, dtype=np.uint64
        )
        packed.sort()
        order = (packed & np.uint64((1 << bits_idx) - 1)).astype(np.int64)
        key = (packed >> np.uint64(bits_idx)).astype(np.int64)
    else:
        order = np.argsort(key, kind="stable")
        key = key[order]
    member = rep[order]
    gx = gx[order]
    gy = gy[order]
    first = np.concatenate([[True], key[1:] != key[:-1]])
    starts = np.flatnonzero(first)
    bounds = np.concatenate([starts, [total]])
    grp_of = np.cumsum(first) - 1  # O(total), replaces a searchsorted per row
    # Within-cell Y-WINDOW enumeration (not all-pairs): sort each cell's
    # members by ymin, then row r only pairs with the later rows whose
    # ymin <= ymax_r — for j > r in ymin order, y-overlap holds iff
    # ymin_j <= ymax_r, so the window is exactly the y-overlapping superset
    # and stays CONTIGUOUS after r. Nested/concentric inputs (every segment
    # sharing a coarse cell, y-disjoint bboxes) collapse from quadratic
    # within-cell pairing to near-linear. Implemented as ONE global
    # searchsorted over a group-lifted composite (each group's ymin block
    # lifted by grp_of * OFFSET keeps the array globally sorted).
    y0 = int(ymin.min())
    yrange = int(ymax.max()) - y0 + 2
    n_grp = int(grp_of[-1]) + 1 if total else 0
    if total and n_grp * yrange < (1 << 62):
        lift = grp_of * yrange
        ysort = np.argsort(lift + (ymin[member] - y0), kind="stable")
        member = member[ysort]
        gx = gx[ysort]
        gy = gy[ysort]
        ylift = lift + (ymin[member] - y0)
        hi = np.searchsorted(ylift, lift + (ymax[member] - y0), side="right")
        pc = hi - np.arange(total, dtype=np.int64) - 1
    else:
        # wide-coordinate fallback: full triangular within-cell pairing
        pc = bounds[grp_of + 1] - np.arange(total, dtype=np.int64) - 1
    ptot = int(pc.sum())
    if ptot >= est_x:
        return None
    pcum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(pc)])
    # chunk budget: small enough that a big job yields ~3 chunks per worker
    # thread (the mask work releases the GIL, see below) while keeping each
    # chunk's materialized index arrays bounded (~2M rows max either way)
    env_k = int(os.environ.get("SPARK_GRAFT_FILL_THREADS", "0"))
    if threads is not None and threads > 0:
        k = threads  # caller already runs inside a pool (strip-parallel path)
    elif env_k > 0:
        k = env_k
    elif ptot >= 600_000:
        k = min(8, os.cpu_count() or 1)
    else:
        k = 1
    pair_budget = 2_000_000 if k <= 1 else max(250_000, ptot // (3 * k) + 1)
    bnds = [0]
    while bnds[-1] < total:
        start = bnds[-1]
        stop = int(np.searchsorted(pcum, pcum[start] + pair_budget, side="left"))
        bnds.append(min(max(stop, start + 1), total))

    def _pairs_chunk(se: tuple[int, int]) -> np.ndarray | None:
        start, stop = se
        cc = pc[start:stop]
        tt = int(cc.sum())
        if not tt:
            return None
        prow = np.repeat(np.arange(start, stop, dtype=np.int64), cc)
        qrow = np.arange(tt, dtype=np.int64) - (pcum[prow] - pcum[start]) + prow + 1
        pi = member[prow]
        pj = member[qrow]
        # emit-once rule (replaces sort-based dedup): a bbox-overlapping
        # pair is kept only in the cell containing the min corner of its
        # bbox INTERSECTION — that corner lies in both bboxes, so exactly
        # one co-cell of the pair satisfies this; the exact-overlap mask
        # below drops co-cell pairs whose bboxes do not overlap at all
        mix = np.maximum(ax[pi], ax[pj]) >> shift
        miy = np.maximum(ymin[pi], ymin[pj]) >> shift
        m = (
            (mix == gx[prow])
            & (miy == gy[prow])
            & (ax[pj] <= bx[pi])
            & (ax[pi] <= bx[pj])
            & (ymin[pj] <= ymax[pi])
            & (ymax[pj] >= ymin[pi])
        )
        pi, pj = pi[m], pj[m]
        if not len(pi):
            return None
        return np.stack([np.minimum(pi, pj), np.maximum(pi, pj)], axis=1)

    spans = list(zip(bnds[:-1], bnds[1:]))
    # the mask work is gather/bandwidth-bound numpy (GIL released): thread the
    # chunks on the big scalar/one-task jobs (k sized with the budget above)
    k = min(k, len(spans))
    if k > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(k) as ex:
            chunks = [c for c in ex.map(_pairs_chunk, spans) if c is not None]
    else:
        chunks = [c for c in map(_pairs_chunk, spans) if c is not None]
    if not chunks:
        return np.empty((0, 2), dtype=np.int64)
    return np.concatenate(chunks, axis=0)


def _candidate_pairs(segs: Segments) -> np.ndarray:
    """All index pairs (i<j) with overlapping bounding boxes.

    Dispatcher: big jobs run x-strip-parallel (k independent enumerations on
    threads, emit-once across strips via the bbox-intersection min-corner rule
    — same idea as the within-grid emit-once below); everything else runs the
    single-threaded core."""
    n = len(segs)
    if n >= 48_000:
        k = int(os.environ.get("SPARK_GRAFT_FILL_THREADS", "0")) or min(
            8, os.cpu_count() or 1
        )
        if k > 1:
            out = _candidate_pairs_strips(segs, k)
            if out is not None:
                return out
    return _candidate_pairs_core(segs)


def _candidate_pairs_strips(segs: Segments, k: int) -> np.ndarray | None:
    """Strip-parallel bbox-overlap pair enumeration.

    Segments are assigned to every x-strip their bbox x-range overlaps
    (borrowed members), each strip enumerates bbox-overlap pairs of its subset
    with the single-threaded core, and a pair is KEPT only by the strip
    containing max(ax_i, ax_j) — the x of its bbox-intersection min corner,
    which lies in both bboxes, so exactly one strip keeps it and no pair is
    missed (both members overlap that strip). Returns None (caller falls back)
    when long segments would make Σ|subset| > 2.5 n. Pair SET identical to the
    core's (order differs; callers treat pairs as a set — the grid path already
    returns cell order)."""
    n = len(segs)
    ax, bx = segs.ax, segs.bx
    qs = np.sort(ax)
    edges = np.unique(qs[np.arange(1, k) * n // k])
    if len(edges) == 0:
        return None
    lo_e = np.concatenate([[np.iinfo(np.int64).min], edges])
    hi_e = np.concatenate([edges, [np.iinfo(np.int64).max]])
    sa = qs
    sb = np.sort(bx)
    n_over = np.searchsorted(sa, hi_e, side="left") - np.searchsorted(
        sb, lo_e, side="left"
    )
    if int(np.maximum(n_over, 0).sum()) > int(2.5 * n):
        return None

    def work(s: int) -> np.ndarray | None:
        # bbox-x overlap with [lo, hi): ax < hi and bx >= lo
        sub = np.flatnonzero((ax < hi_e[s]) & (bx >= lo_e[s]))
        if len(sub) < 2:
            return None
        pr = _candidate_pairs_core(segs.take(sub), threads=1)
        if not len(pr):
            return None
        gi = sub[pr[:, 0]]
        gj = sub[pr[:, 1]]
        mx = np.maximum(ax[gi], ax[gj])
        keep = (mx >= lo_e[s]) & (mx < hi_e[s])
        if not keep.any():
            return None
        return np.stack([gi[keep], gj[keep]], axis=1)

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(min(k, len(edges) + 1)) as ex:
        chunks = [c for c in ex.map(work, range(len(edges) + 1)) if c is not None]
    if not chunks:
        return np.empty((0, 2), dtype=np.int64)
    return np.concatenate(chunks, axis=0)


def _candidate_pairs_core(segs: Segments, threads: int | None = None) -> np.ndarray:
    """All index pairs (i<j) with overlapping bounding boxes.

    x-sweep pruning mirrors the reference list-split break on xj.a.x > xi.b.x
    (iOverlay/src/split/solver_list.rs:36-44); y-range masks vectorized.
    Precondition: segs sorted by (a, b)."""
    n = len(segs)
    if n < 2:
        return np.empty((0, 2), dtype=np.int64)
    ax, bx = segs.ax, segs.bx
    ymin = np.minimum(segs.ay, segs.by)
    ymax = np.maximum(segs.ay, segs.by)
    if n <= 96:
        # small case: one dense triangular mask beats the per-i loop
        i, j = np.triu_indices(n, k=1)
        m = (
            (ax[j] <= bx[i])
            & (ymin[j] <= ymax[i])
            & (ymax[j] >= ymin[i])
        )
        return np.stack([i[m], j[m]], axis=1)
    # vectorized enumeration of the per-i x-window [i+1, his[i]), chunked under a
    # pair budget so skewed x-overlap (many segments sharing x-range) can't
    # materialize multi-GB index arrays before the y-filter prunes
    his = np.searchsorted(ax, bx, side="right")
    i0 = np.arange(n, dtype=np.int64)
    counts = np.maximum(his - i0 - 1, 0)
    cum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(counts)])
    if cum[-1] == 0:
        return np.empty((0, 2), dtype=np.int64)
    if cum[-1] > 32 * n:
        # x-overlap alone overshoots badly (long diagonal chords: x-spans
        # overlap while bboxes don't) — try grid-cover co-cell pairing, the
        # scalar analogue of the reference's fragmentation
        # (iOverlay/src/core/solver.rs is_fragmentation_required) and of the
        # distributed cell cover; it returns an exact bbox-overlap pair set or
        # None when the grid would not beat the x-window
        g = _candidate_pairs_grid(segs, ymin, ymax, int(cum[-1]), threads=threads)
        if g is not None:
            return g
    out = []
    budget = 4_000_000
    start = 0
    while start < n:
        stop = int(np.searchsorted(cum, cum[start] + budget, side="left"))
        stop = min(max(stop, start + 1), n)
        c = counts[start:stop]
        tot = int(c.sum())
        if tot:
            i_rep = np.repeat(np.arange(start, stop, dtype=np.int64), c)
            j = np.arange(tot, dtype=np.int64) - (cum[i_rep] - cum[start]) + i_rep + 1
            m = (ymin[j] <= ymax[i_rep]) & (ymax[j] >= ymin[i_rep])
            if m.any():
                out.append(np.stack([i_rep[m], j[m]], axis=1))
        start = stop
    if not out:
        return np.empty((0, 2), dtype=np.int64)
    return np.concatenate(out, axis=0)


def _apply_marks(segs: Segments, marks: list[tuple[int, int, int]]) -> Segments:
    """Split segments at their marks; sub-marks ordered along the segment
    (iOverlay/src/split/solver.rs:158-302): x ascending, y toward b at equal x.
    Degenerate sub-segments (marks equal to an endpoint, duplicates) dropped.
    Vectorized: dedupe + per-segment ordering via one lexsort, chains assembled
    as one flat (a, marks..., b) point array, consecutive pairs by slicing —
    the per-mark python walk this replaces (kept as _apply_marks_ref, the
    differential ground truth) dominated heavy split rounds.

    marks is either a list of (seg_idx, x, y) tuples (scalar path) or a
    (seg_idx, x, y) triple of int64 arrays (the vectorized solver's native
    output — no per-mark python round-trip)."""
    if isinstance(marks, tuple):
        mi, mx, my = (np.asarray(a, dtype=np.int64) for a in marks)
        if len(mi) == 0:
            return segs
    else:
        if not len(marks):
            return segs
        m = np.asarray(marks, dtype=np.int64).reshape(-1, 3)
        mi, mx, my = m[:, 0], m[:, 1], m[:, 2]
    # drop marks at the segment's own endpoints
    at_end = ((mx == segs.ax[mi]) & (my == segs.ay[mi])) | (
        (mx == segs.bx[mi]) & (my == segs.by[mi])
    )
    keep_mask = np.ones(len(segs), dtype=bool)
    keep_mask[mi] = False  # any marked segment is rebuilt (even endpoint-only
    # marks: the scalar walk also dropped and re-emitted it unchanged — but it
    # re-emitted the SAME segment, so keep those instead
    endpoint_only = np.setdiff1d(mi[at_end], mi[~at_end])
    keep_mask[endpoint_only] = True
    mi, mx, my = mi[~at_end], mx[~at_end], my[~at_end]
    if len(mi) == 0:
        return segs
    # order along the segment, then dedupe identical (seg, point) triples
    ysign = np.where(segs.by[mi] >= segs.ay[mi], 1, -1)
    order = np.lexsort((ysign * my, mx, mi))
    mi, mx, my = mi[order], mx[order], my[order]
    dup = np.concatenate(
        [[False], (mi[1:] == mi[:-1]) & (mx[1:] == mx[:-1]) & (my[1:] == my[:-1])]
    )
    mi, mx, my = mi[~dup], mx[~dup], my[~dup]
    # flat chains: for each marked segment (ascending index, matching the
    # sorted mi runs): a, its marks in order, b
    seg_ids, counts = np.unique(mi, return_counts=True)
    k = len(seg_ids)
    tot = int(counts.sum()) + 2 * k
    px = np.empty(tot, dtype=np.int64)
    py = np.empty(tot, dtype=np.int64)
    bounds = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(counts + 2)])
    px[bounds[:-1]] = segs.ax[seg_ids]
    py[bounds[:-1]] = segs.ay[seg_ids]
    px[bounds[1:] - 1] = segs.bx[seg_ids]
    py[bounds[1:] - 1] = segs.by[seg_ids]
    mark_pos = np.arange(len(mi), dtype=np.int64)
    run_start = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(counts)])[:-1]
    owner = np.searchsorted(run_start, mark_pos, side="right") - 1
    px[bounds[owner] + 1 + (mark_pos - run_start[owner])] = mx
    py[bounds[owner] + 1 + (mark_pos - run_start[owner])] = my
    # consecutive pairs within each chain (drop the seam between chains)
    idx = np.arange(tot - 1, dtype=np.int64)
    chain = np.searchsorted(bounds, idx, side="right") - 1
    inner = idx != bounds[chain + 1] - 1
    ax0, ay0 = px[:-1][inner], py[:-1][inner]
    bx0, by0 = px[1:][inner], py[1:][inner]
    so = segs.subj[seg_ids[chain[inner]]]
    co = segs.clip[seg_ids[chain[inner]]]
    # re-normalize: original direction a->b is "forward"; a sub-segment keeps
    # the original count if still forward after a<b normalization, else negates
    fwd = (ax0 < bx0) | ((ax0 == bx0) & (ay0 < by0))
    nax = np.where(fwd, ax0, bx0)
    nay = np.where(fwd, ay0, by0)
    nbx = np.where(fwd, bx0, ax0)
    nby = np.where(fwd, by0, ay0)
    nz = (nax != nbx) | (nay != nby)
    base = segs.take(np.flatnonzero(keep_mask))
    extra = Segments(
        nax[nz],
        nay[nz],
        nbx[nz],
        nby[nz],
        np.where(fwd, so, -so)[nz],
        np.where(fwd, co, -co)[nz],
    )
    return Segments.concat([base, extra])


def _apply_marks_ref(segs: Segments, marks: list[tuple[int, int, int]]) -> Segments:
    """Scalar reference implementation of _apply_marks (differential tests)."""
    by_seg: dict[int, set[tuple[int, int]]] = {}
    for idx, x, y in marks:
        by_seg.setdefault(idx, set()).add((x, y))

    keep_mask = np.ones(len(segs), dtype=bool)
    new_rows = []  # (ax, ay, bx, by, subj, clip)
    for idx, pts in by_seg.items():
        keep_mask[idx] = False
        a = (int(segs.ax[idx]), int(segs.ay[idx]))
        b = (int(segs.bx[idx]), int(segs.by[idx]))
        subj = int(segs.subj[idx])
        clip = int(segs.clip[idx])
        # order along the segment: x ascending, y toward b at equal x
        ysign = 1 if b[1] >= a[1] else -1
        chain = sorted(pts - {a, b}, key=lambda p: (p[0], ysign * p[1]))
        prev = a
        for p in chain + [b]:
            if p == prev:
                continue
            pa, pb = (prev, p) if prev < p else (p, prev)
            cnt_fwd = prev < p
            # re-normalize: original direction a->b is "forward"; sub-segment prev->p
            # keeps the original count if still forward after a<b normalization,
            # else count negates (same rule as ingest normalization).
            if cnt_fwd:
                new_rows.append((pa[0], pa[1], pb[0], pb[1], subj, clip))
            else:
                new_rows.append((pa[0], pa[1], pb[0], pb[1], -subj, -clip))
            prev = p

    base = segs.take(np.flatnonzero(keep_mask))
    if not new_rows:
        return base
    arr = np.array(new_rows, dtype=np.int64)
    extra = Segments(arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], arr[:, 4], arr[:, 5])
    return Segments.concat([base, extra])


def split_segments(segs: Segments, start: int = 0, step: int = 1, max_rounds: int = 64) -> Segments:
    """Run the snap-radius fixpoint loop to an intersection-free merged segment set.

    Radius progression 2^(start + k*step) capped at 2^60, matching Precision::HIGH
    defaults (iOverlay/src/core/solver.rs:47-51, iOverlay/src/split/snap_radius.rs)."""
    segs = sort_and_merge(segs)
    # vectorized exact solver (cross_vec) needs every diff product to fit int64;
    # splitting only creates points inside existing bboxes, so check the cap once
    cap = 1 << 30
    vec_ok = len(segs) == 0 or (
        max(
            int(np.abs(segs.ax).max()),
            int(np.abs(segs.ay).max()),
            int(np.abs(segs.bx).max()),
            int(np.abs(segs.by).max()),
        )
        < cap
    )
    exp = start
    for _ in range(max_rounds):
        if len(segs) < 2:
            return segs
        radius = 1 << exp
        pairs = _candidate_pairs(segs)
        marks: list[tuple[int, int, int]] | tuple = []
        n_marks = 0
        need_fix = False
        if len(pairs) and vec_ok:
            from .cross_vec import cross_pairs_batch

            ci, cj = pairs[:, 0], pairs[:, 1]
            pid, which, mx, my, rnd = cross_pairs_batch(
                segs.ax[ci], segs.ay[ci], segs.bx[ci], segs.by[ci],
                segs.ax[cj], segs.ay[cj], segs.bx[cj], segs.by[cj],
                radius,
            )
            need_fix = bool(rnd.any())
            seg_idx = np.where(which == 0, ci[pid], cj[pid])
            # array triple straight into _apply_marks — no per-mark python
            marks = (seg_idx, mx, my)
            n_marks = len(seg_idx)
        else:
            seg_rows = np.stack([segs.ax, segs.ay, segs.bx, segs.by], axis=1)
            for i, j in pairs:
                pm, rnd = cross_pair(
                    tuple(int(v) for v in seg_rows[i]),
                    tuple(int(v) for v in seg_rows[j]),
                    radius,
                )
                need_fix = need_fix or rnd
                for which, x, y in pm:
                    marks.append((int(i) if which == 0 else int(j), x, y))
            n_marks = len(marks)
        if not n_marks:
            return segs
        segs = sort_and_merge(_apply_marks(segs, marks))
        exp = min(60, exp + step)
        if not need_fix:
            return segs
    return segs
