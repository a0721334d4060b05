"""Winding classification ("fill") of an intersection-free segment set.

Produces the reference's 4-bit SegmentFill per segment
(iOverlay/src/segm/segment.rs:10-24): SUBJ_TOP/SUBJ_BOTTOM/CLIP_TOP/CLIP_BOTTOM =
"is the region on the TOP/BOTTOM side of this segment inside subject/clip" under the
fill rule. TOP/BOTTOM follow the reference sweep convention
(iOverlay/src/build/sweep.rs:33-90, iOverlay/src/build/boolean.rs:96-154):
for a non-vertical segment TOP is the region above; for a vertical segment
(a.y < b.y) TOP is the region to the WEST (the sweep's clock-ordered start-point
group puts the vertical segment last, so its "top" accumulator is the west side).

Instead of a sequential sweep, each segment's bottom winding is evaluated directly by
an exact integer ray-cast at the segment midpoint (valid because after splitting the
winding is constant along every segment interior). This is embarrassingly parallel —
the same formula the distributed x-strip pipeline uses (SURVEY.md A10).
"""

from __future__ import annotations

import os

import numpy as np

from ..options import FillRule
from .segments import Segments

SUBJ_TOP = 1
SUBJ_BOTTOM = 2
CLIP_TOP = 4
CLIP_BOTTOM = 8
SUBJ_BOTH = SUBJ_TOP | SUBJ_BOTTOM
CLIP_BOTH = CLIP_TOP | CLIP_BOTTOM
BOTH_TOP = SUBJ_TOP | CLIP_TOP
BOTH_BOTTOM = SUBJ_BOTTOM | CLIP_BOTTOM


def _windings_below(segs: Segments) -> tuple[np.ndarray, np.ndarray]:
    """For each segment i: sum of winding counts of segments crossed by a downward ray
    from just below the segment midpoint (non-vertical i), or just east of the segment
    (vertical i). Exact integer math; falls back to Python-int (object) arrays when the
    coordinate extent could overflow int64 products."""
    n = len(segs)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy()
    ax, ay, bx, by = segs.ax, segs.ay, segs.bx, segs.by
    # translate to local origin to bound products
    x0 = min(ax.min(), bx.min())
    y0 = min(ay.min(), by.min())
    tax, tay, tbx, tby = ax - x0, ay - y0, bx - x0, by - y0
    extent = max(int(tbx.max()), int(tby.max()), int(tay.max()), 1)
    use_object = 4 * extent * extent >= (1 << 62)
    if use_object:
        tax = tax.astype(object)
        tay = tay.astype(object)
        tbx = tbx.astype(object)
        tby = tby.astype(object)

    nonvert = tbx > tax
    dt = tbx - tax  # valid only where nonvert
    dy = tby - tay
    Xi = tax + tbx  # doubled midpoint x; for vertical segments == 2*ax
    Yi = tay + tby  # doubled midpoint y

    subj = segs.subj
    clip = segs.clip
    wind_s = np.zeros(n, dtype=object if use_object else np.int64)
    wind_c = np.zeros(n, dtype=object if use_object else np.int64)

    # consider only non-vertical t as ray-crossing candidates
    tidx = np.flatnonzero(nonvert)
    if len(tidx) == 0:
        return wind_s.astype(np.int64), wind_c.astype(np.int64)
    t_ax = tax[tidx]
    t_ay = tay[tidx]
    t_bx = tbx[tidx]
    t_dt = dt[tidx]
    t_dy = dy[tidx]
    t_subj = subj[tidx]
    t_clip = clip[tidx]

    chunk = max(1, int(4_000_000 // max(1, len(tidx))))
    for lo in range(0, n, chunk):
        hi = min(n, lo + chunk)
        Xc = Xi[lo:hi, None]
        Yc = Yi[lo:hi, None]
        span = (2 * t_ax[None, :] <= Xc) & (Xc < 2 * t_bx[None, :])
        # y_t(x*) < y*  <=>  2*ay_t*dt + dy_t*(X - 2*ax_t) < Y*dt   (dt > 0)
        num = 2 * t_ay[None, :] * t_dt[None, :] + t_dy[None, :] * (Xc - 2 * t_ax[None, :])
        below = num < Yc * t_dt[None, :]
        m = span & below
        wind_s[lo:hi] = (m * t_subj[None, :]).sum(axis=1)
        wind_c[lo:hi] = (m * t_clip[None, :]).sum(axis=1)
    return wind_s.astype(np.int64), wind_c.astype(np.int64)


def _is_inside(w: np.ndarray, rule: FillRule) -> np.ndarray:
    if rule == FillRule.EVEN_ODD:
        return (w & 1) != 0
    if rule == FillRule.NON_ZERO:
        return w != 0
    if rule == FillRule.POSITIVE:
        return w > 0
    return w < 0


def compute_fills(segs: Segments, fill_rule: FillRule) -> np.ndarray:
    """4-bit SegmentFill per segment (uint8)."""
    bot_s, bot_c = _windings_below(segs)
    top_s = bot_s + segs.subj
    top_c = bot_c + segs.clip
    fill = (
        _is_inside(top_s, fill_rule).astype(np.uint8) * SUBJ_TOP
        | _is_inside(bot_s, fill_rule).astype(np.uint8) * SUBJ_BOTTOM
        | _is_inside(top_c, fill_rule).astype(np.uint8) * CLIP_TOP
        | _is_inside(bot_c, fill_rule).astype(np.uint8) * CLIP_BOTTOM
    )
    return fill


def _windings_sweep(segs: Segments) -> tuple[np.ndarray, np.ndarray]:
    """O(n log n) sweep-line windings (the reference's scan-list shape,
    iOverlay/src/build/sweep.rs, re-derived for the ray-at-midpoint
    formulation). Only valid on POST-SPLIT sets (every compute_fills* caller):
    no two segments cross or touch another's interior, so

      * the face immediately below a segment is CONSTANT along its open
        interior (an arrangement vertex there would be a T-junction), and
      * the bottom winding of a segment equals the bottom winding of its
        below-neighbor at insertion plus that neighbor's directed weight —
        winding propagates along a forest instead of being re-summed per ray.

    The active list holds non-vertical segments in y-order (non-crossing ⇒
    order is invariant while active), as a plain Python list with manual
    binary search: every comparison is integer point-vs-segment
    (num < T*dt — one side is always an integer event point, never
    rational-vs-rational), exact in Python ints at ANY coordinate scale, which
    is why this also replaces the object-int dense path for >2^31 extents.
    Events at doubled-x: removals, then insertions (batch ordered by start-y
    then slope for shared nodes), then vertical-segment midpoint queries."""
    n = len(segs)
    zs = np.zeros(n, dtype=np.int64)
    if n == 0:
        return zs, zs.copy()
    ax = segs.ax.tolist()
    ay = segs.ay.tolist()
    bx = segs.bx.tolist()
    by = segs.by.tolist()
    ws = segs.subj.tolist()
    wc = segs.clip.tolist()
    # event key (X, kind, start-y): winding propagation requires same-X
    # insertions to run BOTTOM-UP (a segment reads its below-neighbor's value,
    # which must already be set); same-(X, y) runs share a start node and are
    # slope-ordered below. Removal/query order within a batch is irrelevant.
    events: list[tuple[int, int, int, int]] = []
    for i in range(n):
        if bx[i] > ax[i]:
            events.append((2 * ax[i], 1, 2 * ay[i], i))
            events.append((2 * bx[i], 0, 0, i))
        else:
            events.append((2 * ax[i], 2, 0, i))
    events.sort()
    # slope-sort shared-start insertion runs (rare, tiny): ascending dy/dt
    k = 0
    m = len(events)
    while k < m:
        if events[k][1] != 1:
            k += 1
            continue
        e = k + 1
        while e < m and events[e][:3] == events[k][:3]:
            e += 1
        if e - k > 1:
            import functools

            def _cmp(ea, eb):
                i1, i2 = ea[3], eb[3]
                lhs = (by[i1] - ay[i1]) * (bx[i2] - ax[i2])
                rhs = (by[i2] - ay[i2]) * (bx[i1] - ax[i1])
                return -1 if lhs < rhs else (1 if lhs > rhs else 0)

            events[k:e] = sorted(events[k:e], key=functools.cmp_to_key(_cmp))
        k = e
    wind_s = [0] * n
    wind_c = [0] * n
    active: list[int] = []  # non-vertical indices, ascending y at current X

    # comparisons inline: doubled-y of u at doubled-x X is
    # (2*ay*dt + dy*(X-2*ax)) / dt; u is strictly below the integer doubled-y
    # T iff num < T*dt (dt > 0) — one side is always an integer event point
    for X, kind, _y0, i in events:
        if kind == 0:
            # remove i: locate by its END point (exact integer y), then scan the
            # equal-y run (other segments ending at the same node) for identity
            T = 2 * by[i]
            lo, hi = 0, len(active)
            while lo < hi:
                mid = (lo + hi) // 2
                u = active[mid]
                axu = ax[u]
                ayu = ay[u]
                dt = bx[u] - axu
                if 2 * ayu * dt + (by[u] - ayu) * (X - 2 * axu) < T * dt:
                    lo = mid + 1
                else:
                    hi = mid
            j = lo
            while active[j] != i:
                j += 1
            del active[j]
        elif kind == 1:
            # insert i at its START point; tiebreak shared starts by slope so
            # the list is ordered just right of X
            T = 2 * ay[i]
            dti = bx[i] - ax[i]
            dyi = by[i] - ay[i]
            lo, hi = 0, len(active)
            while lo < hi:
                mid = (lo + hi) // 2
                u = active[mid]
                axu = ax[u]
                dt = bx[u] - axu
                num = 2 * ay[u] * dt + (by[u] - ay[u]) * (X - 2 * axu)
                rhs = T * dt
                if num < rhs or (num == rhs and (by[u] - ay[u]) * dti < dyi * dt):
                    lo = mid + 1
                else:
                    hi = mid
            if lo:
                u = active[lo - 1]
                wind_s[i] = wind_s[u] + ws[u]
                wind_c[i] = wind_c[u] + wc[u]
            active.insert(lo, i)
        else:
            # vertical segment: ray at X = 2*ax, strictly-below count at the
            # doubled midpoint height (no ties possible post-split)
            T = ay[i] + by[i]
            lo, hi = 0, len(active)
            while lo < hi:
                mid = (lo + hi) // 2
                u = active[mid]
                axu = ax[u]
                ayu = ay[u]
                dt = bx[u] - axu
                if 2 * ayu * dt + (by[u] - ayu) * (X - 2 * axu) < T * dt:
                    lo = mid + 1
                else:
                    hi = mid
            if lo:
                u = active[lo - 1]
                wind_s[i] = wind_s[u] + ws[u]
                wind_c[i] = wind_c[u] + wc[u]
    return np.array(wind_s, dtype=np.int64), np.array(wind_c, dtype=np.int64)


def _resolve_fill_threads(threads: int | None, n_pairs: int) -> int:
    """Thread count for the segtree's bisection loop. None = auto: engage only
    for large jobs (the loop is gather-LATENCY-bound and numpy releases the
    GIL, so threads scale ~6-9x on it — measured; small jobs would pay pool
    overhead). Callers running inside an already-parallel executor (the
    distributed strip fill) pass threads=1 explicitly."""
    if threads is not None and threads > 0:
        return threads
    env = int(os.environ.get("SPARK_GRAFT_FILL_THREADS", "0"))
    if env > 0:
        return env
    if n_pairs < 1_500_000:
        return 1
    return min(8, os.cpu_count() or 1)


def _windings_segtree(
    segs: Segments, threads: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized O((n+q) log^2 n) midpoint-ray windings via a segment tree over
    x-intervals (the numpy replacement for the per-event python loop in
    _windings_sweep, VERDICT r03 #2).

    Each non-vertical segment covers the elementary x-intervals between its
    doubled endpoints; the canonical decomposition assigns it to <=2 tree nodes
    per level (the classic iterative l+=n/r+=n walk, vectorized across all
    segments at once). Within a node every member spans the node's whole
    x-interval and no two members cross or touch there (post-split invariant),
    so members are TOTALLY y-ordered throughout the interval: they are sorted
    once by their exact rational y at the node midpoint (int64 floor + remainder
    key, float tiebreak, exact adjacent verification with a python re-sort of
    the rare float-ambiguous nodes). A downward ray at doubled-x Xi then crosses,
    within each node on Xi's root-to-leaf path, exactly a PREFIX of that node's
    members (order is monotone at every x in the node), found by vectorized
    binary search with the same exact integer point-vs-segment predicate as
    _windings_below; per-node prefix weight sums finish the count.

    Unlike the sweep this is ray-at-midpoint semantics (identical to
    _windings_below), hence valid on strip SUBSETS too — the distributed
    x-strip kernel can use it where the sweep is gated off (BENCH.md round-3
    subset trap). int64-only: callers must have applied the 4*extent^2 < 2^62
    gate (all products here are bounded by 8*extent^2 < 2^63 given that gate).
    """
    n = len(segs)
    wind_s = np.zeros(n, dtype=np.int64)
    wind_c = np.zeros(n, dtype=np.int64)
    if n == 0:
        return wind_s, wind_c
    ax, ay, bx, by = segs.ax, segs.ay, segs.bx, segs.by
    x0 = min(int(ax.min()), int(bx.min()))
    y0 = min(int(ay.min()), int(by.min()))
    tax = ax - x0
    tay = ay - y0
    tbx = bx - x0
    tby = by - y0
    mem = np.flatnonzero(tbx > tax)
    if len(mem) == 0:
        return wind_s, wind_c
    B = np.unique(np.concatenate([2 * tax[mem], 2 * tbx[mem]]))
    nL = len(B) - 1
    nP = 1 << max(0, int(nL - 1).bit_length())
    lo_leaf = np.searchsorted(B, 2 * tax[mem])
    hi_leaf = np.searchsorted(B, 2 * tbx[mem])

    # canonical decomposition, all segments in lockstep (<=2 nodes/level each)
    left = lo_leaf + nP
    right = hi_leaf + nP
    nodes_parts: list[np.ndarray] = []
    segs_parts: list[np.ndarray] = []
    while True:
        act = left < right
        if not act.any():
            break
        ml = act & ((left & 1) == 1)
        if ml.any():
            nodes_parts.append(left[ml].copy())
            segs_parts.append(mem[ml])
        left = left + ml
        mr = act & ((right & 1) == 1)
        right = right - mr
        if mr.any():
            nodes_parts.append(right[mr].copy())
            segs_parts.append(mem[mr])
        left = left >> 1
        right = right >> 1
    node = np.concatenate(nodes_parts)
    sid = np.concatenate(segs_parts)

    # node x-interval midpoint (exact rational NUM/DEN, local coords); 2-key
    # sort (node, float y) — exact adjacent verification below repairs the
    # rare float-ambiguous nodes
    depth = np.frexp(node.astype(np.float64))[1] - 1  # floor(log2 node), exact
    szlog = (int(nP).bit_length() - 1) - depth
    nlo = (node << szlog) - nP
    nhi = np.minimum(nlo + (np.int64(1) << szlog), nL)
    # NUM = 4*tay[sid]*edt + edy*(m_num - 4*tax[sid]), built in place: the
    # expression form allocates ~8 M-sized temporaries (page-fault bound on
    # one-shots); this form touches 3. Products identical (int64 throughout).
    edt = (tbx - tax)[sid]
    edy = (tby - tay)[sid]
    NUM = B[nlo]
    NUM += B[nhi]  # m_num
    tmp = tax[sid]
    tmp <<= 2  # 4*tax[sid] (local coords are >= 0)
    NUM -= tmp
    NUM *= edy
    np.take(tay, sid, out=tmp)
    tmp <<= 2
    tmp *= edt
    NUM += tmp
    del tmp
    DEN = 2 * edt
    # (node, y) sort. Fast path: pack node | y-fraction | index into ONE uint64
    # and np.sort it — a direct sort of packed keys is ~7x an indirect float
    # argsort (measured). Node bits lead, so node grouping is exact by
    # construction; y ties inside the fraction's resolution land in arbitrary
    # order and are repaired by the exact adjacent verification below (which
    # runs either way). Falls back to the composite-float argsort when the bit
    # budget doesn't fit (huge node ids or pair counts).
    yf = NUM / DEN
    ylo = float(yf.min())
    yspan = float(yf.max()) - ylo
    M = len(node)
    bits_node = int(2 * nP).bit_length()
    bits_idx = max(M - 1, 1).bit_length()
    bits_frac = 64 - bits_node - bits_idx
    if bits_frac >= 12:
        # fused (yf-ylo)*(fscale/denom) — one temporary instead of four; the
        # low-bit rounding difference vs the two-step form lands inside the
        # fraction's resolution and is repaired by the exact verification
        fscale = float(1 << bits_frac) / (yspan * (1.0 + 1e-6) + 1e-300)
        sc = yf - ylo
        sc *= fscale
        fint = sc.astype(np.uint64)
        del sc
        np.minimum(fint, np.uint64((1 << bits_frac) - 1), out=fint)
        key = node.astype(np.uint64)
        key <<= np.uint64(bits_frac + bits_idx)
        fint <<= np.uint64(bits_idx)
        key |= fint
        del fint
        key |= np.arange(M, dtype=np.uint64)
        key.sort()
        order = (key & np.uint64((1 << bits_idx) - 1)).astype(np.int64)
    else:
        frac = (yf - ylo) / (yspan * (1.0 + 1e-6) + 1e-300)
        order = np.argsort(node + frac, kind="stable")
        if not np.all(np.diff(node[order]) >= 0):
            order = np.lexsort((yf, node))
    node = node[order]
    sid = sid[order]
    NUM = NUM[order]
    DEN = DEN[order]
    # exact adjacent verification of the float order (transitivity makes
    # adjacent checks sufficient): y_i <= y_j  <=>  (q, r*DEN-cross) ordered
    qk = NUM // DEN
    rk = NUM - qk * DEN
    same = node[1:] == node[:-1]
    inv = same & (
        (qk[1:] < qk[:-1])
        | ((qk[1:] == qk[:-1]) & (rk[:-1] * DEN[1:] > rk[1:] * DEN[:-1]))
    )
    if inv.any():
        # vectorized repair: gather ALL rows of the offending nodes (contiguous
        # ranges — node is sorted) and lexsort them by (node, qk, rk/DEN). qk
        # is the exact floor; the float fraction rk/DEN in [0,1) resolves ties
        # to 2^-52, far past the packed key's resolution that caused the
        # inversion. Exactness is re-verified below; any residual inversion
        # (denominator products straddling float precision) falls back to a
        # python comparison sort per remaining node — not observed in practice.
        bad_nodes = np.unique(node[:-1][inv])
        s_all = np.searchsorted(node, bad_nodes, side="left")
        e_all = np.searchsorted(node, bad_nodes, side="right")
        lens = e_all - s_all
        sub = np.repeat(s_all, lens) + (
            np.arange(int(lens.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(lens) - lens, lens)
        )
        order_sub = np.lexsort(
            (rk[sub].astype(np.float64) / DEN[sub], qk[sub], node[sub])
        )
        sub_sorted = sub[order_sub]
        sid[sub] = sid[sub_sorted]
        qk[sub] = qk[sub_sorted]
        rk[sub] = rk[sub_sorted]
        DEN[sub] = DEN[sub_sorted]
        inv2 = (node[1:] == node[:-1]) & (
            (qk[1:] < qk[:-1])
            | ((qk[1:] == qk[:-1]) & (rk[:-1] * DEN[1:] > rk[1:] * DEN[:-1]))
        )
        if inv2.any():
            import functools

            for v in np.unique(node[:-1][inv2]).tolist():
                s = int(np.searchsorted(node, v, side="left"))
                e = int(np.searchsorted(node, v, side="right"))

                def _less(i, j):
                    if qk[i] != qk[j]:
                        return -1 if qk[i] < qk[j] else 1
                    lhs = int(rk[i]) * int(DEN[j])
                    rhs = int(rk[j]) * int(DEN[i])
                    return -1 if lhs < rhs else (1 if lhs > rhs else 0)

                idx = sorted(range(s, e), key=functools.cmp_to_key(_less))
                sid[s:e] = sid[idx]
                qk[s:e] = qk[idx]
                rk[s:e] = rk[idx]
                DEN[s:e] = DEN[idx]

    # CSR over node-id space; predicate operands as four 1-D arrays (numpy's
    # 1-D integer gather is ~2x a 2-D row gather — measured) with pairs sorted
    # by node below so the gathers are quasi-sequential
    n_nodes = 2 * nP
    cnt = np.bincount(node, minlength=n_nodes)
    start = np.zeros(n_nodes + 1, dtype=np.int64)
    np.cumsum(cnt, out=start[1:])
    edt = (tbx - tax)[sid]
    enum0 = 2 * tay[sid] * edt
    edy = (tby - tay)[sid]
    eax2 = 2 * tax[sid]
    # bisection gathers are the fill's hot loop and memory-latency-bound: when
    # doubled local coordinates fit int32 (always under the 2^30 grid; the
    # wide-coordinate path keeps int64) narrow the three coordinate-scale
    # operand arrays — numpy upcasts int32*int64 -> int64 inside the predicate,
    # so every product is computed in int64 exactly as before (bit-identical;
    # pinned by the fill differentials). enum0 is a coordinate PRODUCT and
    # stays int64 unconditionally.
    cmax2 = 2 * max(
        (int(a.max()) for a in (tax, tay, tbx, tby) if len(a)), default=0
    )
    if 0 < cmax2 < 2**31:
        edt = edt.astype(np.int32)
        edy = edy.astype(np.int32)
        eax2 = eax2.astype(np.int32)
    # zero-weight sides (self-union: clip empty) skip their prefix sums and
    # accumulation entirely
    has_subj = bool(np.any(segs.subj))
    has_clip = bool(np.any(segs.clip))
    cs = (
        np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(segs.subj[sid])])
        if has_subj
        else None
    )
    cc = (
        np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(segs.clip[sid])])
        if has_clip
        else None
    )

    # queries: every segment's doubled midpoint; the root-to-leaf path is one
    # broadcast shift matrix (all leaves share the tree depth), filtered to
    # nonempty nodes. Queries are pre-sorted by LEAF (one small argsort), which
    # makes PV monotone within every level block of the level-major reshape —
    # the same gather locality the previous global 4M-element node argsort
    # bought, at 1/10 the cost (nothing downstream needs a global order:
    # start/cnt lookups are random-access and the accumulate is a bincount).
    Xi = tax + tbx
    Ti = tay + tby
    p = np.searchsorted(B, Xi, side="right") - 1
    qs = np.flatnonzero((p >= 0) & (p < nL))
    if len(qs) == 0:
        return wind_s, wind_c
    qs = qs[np.argsort(p[qs], kind="stable")]
    levels = int(nP).bit_length()  # leaf v in [nP, 2nP) -> levels shifts to 1
    leaf = p[qs] + nP
    pq_parts: list[np.ndarray] = []
    pv_parts: list[np.ndarray] = []
    for lvl in range(levels):  # filter per level: ~half the node visits are
        v = leaf >> lvl  # empty, and this skips the 2-D broadcast copies
        m = cnt[v] > 0
        if m.any():
            pq_parts.append(qs[m])
            pv_parts.append(v[m])
    if not pq_parts:
        return wind_s, wind_c
    PQ = np.concatenate(pq_parts)
    PV = np.concatenate(pv_parts)
    def _bisect(sl: slice) -> np.ndarray:
        # vectorized binary search over each query's node-member prefix; the
        # mid-indexed gathers dominate (latency-bound), so callers may run
        # several slices on threads — numpy releases the GIL here
        PVs = PV[sl]
        plo = start[PVs].copy()
        phi = plo + cnt[PVs]
        Xq = Xi[PQ[sl]]
        Tq = Ti[PQ[sl]]
        act = np.flatnonzero(plo < phi)
        lo_a = plo[act]
        hi_a = phi[act]
        Xa = Xq[act]
        Ta = Tq[act]
        while len(act):
            mid = (lo_a + hi_a) >> 1
            pred = enum0[mid] + edy[mid] * (Xa - eax2[mid]) < Ta * edt[mid]
            lo_a[pred] = mid[pred] + 1
            np.putmask(hi_a, ~pred, mid)
            live = lo_a < hi_a
            if not live.all():
                plo[act] = lo_a
                act = act[live]
                lo_a = lo_a[live]
                hi_a = hi_a[live]
                Xa = Xa[live]
                Ta = Ta[live]
        return plo

    k = _resolve_fill_threads(threads, len(PQ))
    if k <= 1:
        plo = _bisect(slice(0, len(PQ)))
    else:
        from concurrent.futures import ThreadPoolExecutor

        M = len(PQ)
        slices = [slice(i * M // k, (i + 1) * M // k) for i in range(k)]
        plo = np.empty(M, dtype=np.int64)
        with ThreadPoolExecutor(k) as ex:
            for sl, part in zip(slices, ex.map(_bisect, slices)):
                plo[sl] = part
    base = start[PV]
    if has_subj:
        wind_s += np.bincount(PQ, weights=(cs[plo] - cs[base]).astype(np.float64), minlength=n).astype(np.int64)
    if has_clip:
        wind_c += np.bincount(PQ, weights=(cc[plo] - cc[base]).astype(np.float64), minlength=n).astype(np.int64)
    return wind_s, wind_c


def _windings_segtree_strips(
    segs: Segments, k: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """Strip-parallel _windings_segtree: k independent segment trees over
    x-strips, run on threads.

    Correctness rests on the same subset-safety the distributed x-strip fill
    uses: a downward ray at doubled-x Xi crosses segment t iff
    2*ax[t] <= Xi < 2*bx[t], so the EXACT winding of every query whose Xi lies
    in strip [lo, hi) is determined by the subset of segments whose doubled
    x-interval intersects that strip (2*bx > lo and 2*ax < hi) — each strip's
    tree answers its own queries with no cross-strip information needed.
    Borrowed members (x-interval overlaps the strip, midpoint outside) get
    queried too; their answers are DISCARDED — their own strip computes them
    against the full relevant subset. Strips split at query-midpoint quantiles
    (balanced query load); the duplication guard returns None (caller falls
    back to the single tree) when long segments would make Σ|subset| > 2.5 n —
    per-strip trees are smaller AND everything (sort, decomposition, bisection)
    runs in parallel, vs the single tree that threads only its bisection loop.
    Bit-identical to the single tree (same predicate; differential-tested)."""
    n = len(segs)
    ax2 = 2 * segs.ax
    bx2 = 2 * segs.bx
    Xi = segs.ax + segs.bx
    qsort = np.sort(Xi)
    edges = np.unique(qsort[np.arange(1, k) * n // k])
    if len(edges) == 0:
        return None
    sid = np.searchsorted(edges, Xi, side="right")
    n_strips = len(edges) + 1
    # duplication guard: subset size per strip via sorted-endpoint counting
    sa = np.sort(ax2)
    sb = np.sort(bx2)
    lo_e = np.concatenate([[np.iinfo(np.int64).min], edges])
    hi_e = np.concatenate([edges, [np.iinfo(np.int64).max]])
    n_over = (
        np.searchsorted(sa, hi_e, side="left")  # ax2 < hi
        - np.searchsorted(sb, lo_e, side="right")  # minus bx2 <= lo
    )
    if int(np.maximum(n_over, 0).sum()) > int(2.5 * n):
        return None
    wind_s = np.zeros(n, dtype=np.int64)
    wind_c = np.zeros(n, dtype=np.int64)

    def work(s: int):
        sub = np.flatnonzero(
            ((bx2 > lo_e[s]) & (ax2 < hi_e[s])) | (sid == s)
        )
        if not len(sub):
            return None
        ws, wc = _windings_segtree(segs.take(sub), threads=1)
        keep = sid[sub] == s
        return sub[keep], ws[keep], wc[keep]

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(min(k, n_strips)) as ex:
        for part in ex.map(work, range(n_strips)):
            if part is None:
                continue
            idx, ws, wc = part
            wind_s[idx] = ws
            wind_c[idx] = wc
    return wind_s, wind_c


def compute_fills_segtree(
    segs: Segments, fill_rule: FillRule, threads: int | None = None
) -> np.ndarray:
    """Segment-tree fill (see _windings_segtree): vectorized, subset-safe."""
    # one-shot scalar path (threads unset/≥2): strip-parallel trees when the
    # job is big enough to amortize the pool (the Spark strip fill passes
    # threads=1 and keeps the single tree — each task owns one core there)
    k = threads if threads and threads > 0 else (
        int(os.environ.get("SPARK_GRAFT_FILL_THREADS", "0"))
        or (min(8, os.cpu_count() or 1) if len(segs) >= 48_000 else 1)
    )
    if k > 1 and len(segs) >= 48_000:
        res = _windings_segtree_strips(segs, k)
        if res is not None:
            return _fill_bits(segs, res[0], res[1], fill_rule)
    wind_s, wind_c = _windings_segtree(segs, threads=threads)
    return _fill_bits(segs, wind_s, wind_c, fill_rule)


def _fill_bits(segs: Segments, wind_s, wind_c, fill_rule: FillRule) -> np.ndarray:
    top_s = wind_s + segs.subj
    top_c = wind_c + segs.clip
    return (
        _is_inside(top_s, fill_rule).astype(np.uint8) * SUBJ_TOP
        | _is_inside(wind_s, fill_rule).astype(np.uint8) * SUBJ_BOTTOM
        | _is_inside(top_c, fill_rule).astype(np.uint8) * CLIP_TOP
        | _is_inside(wind_c, fill_rule).astype(np.uint8) * CLIP_BOTTOM
    )


def compute_fills_sweep(segs: Segments, fill_rule: FillRule) -> np.ndarray:
    """Sweep-line fill (see _windings_sweep): exact at any coordinate scale."""
    wind_s, wind_c = _windings_sweep(segs)
    return _fill_bits(segs, wind_s, wind_c, fill_rule)


def _windings_grouped(
    tax: np.ndarray,
    tay: np.ndarray,
    tbx: np.ndarray,
    tby: np.ndarray,
    subj: np.ndarray,
    clip: np.ndarray,
    uxi: np.ndarray,
    inv: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Bottom windings when rays share few distinct x positions (uxi = unique
    doubled-midpoint Xi, inv = per-segment index into uxi).

    For a fixed ray x = Xi/2, a non-vertical candidate t (x-span containing Xi)
    is below a ray at doubled-y Y exactly when num_t < Y * dt_t (dt > 0), i.e.
    Y >= floor(num_t / dt_t) + 1 — an exact INTEGER activation threshold
    (floor-div rounds toward -inf, so negative numerators are handled). Sorting
    thresholds once per unique Xi turns every ray's winding into prefix-sum +
    searchsorted: O(U*n + P log P) total instead of the dense O(n*m) pair
    matrix, a ~100x kernel cut on grid-like strips where U is tiny (lines_net,
    rect/tile workloads — BENCH.md). Exact: same integer predicate as
    _windings_below, differential-tested."""
    n = len(tax)
    wind_s = np.zeros(n, dtype=np.int64)
    wind_c = np.zeros(n, dtype=np.int64)
    nonvert = tbx > tax
    t_ax2 = 2 * tax[nonvert]
    t_bx2 = 2 * tbx[nonvert]
    t_ay = tay[nonvert]
    t_dt = (tbx - tax)[nonvert]
    t_dy = (tby - tay)[nonvert]
    t_subj = subj[nonvert]
    t_clip = clip[nonvert]
    Y = tay + tby
    # group rays by unique Xi via one argsort (not U passes of inv == k)
    ray_order = np.argsort(inv, kind="stable")
    grp = np.searchsorted(inv[ray_order], np.arange(len(uxi) + 1))
    for k, xi in enumerate(uxi.tolist()):
        rays = ray_order[grp[k] : grp[k + 1]]
        cand = np.flatnonzero((t_ax2 <= xi) & (xi < t_bx2))
        if len(cand) == 0 or len(rays) == 0:
            continue
        num = 2 * t_ay[cand] * t_dt[cand] + t_dy[cand] * (xi - t_ax2[cand])
        thr = num // t_dt[cand] + 1
        order = np.argsort(thr, kind="stable")
        thr = thr[order]
        ps = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(t_subj[cand][order])])
        pc = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(t_clip[cand][order])])
        pos = np.searchsorted(thr, Y[rays], side="right")
        wind_s[rays] = ps[pos]
        wind_c[rays] = pc[pos]
    return wind_s, wind_c


def compute_fills_windowed(
    segs: Segments,
    fill_rule: FillRule,
    allow_sweep: bool = True,
    threads: int | None = None,
) -> np.ndarray:
    """compute_fills with an x-window candidate bound: the downward ray at a
    segment's doubled midpoint Xi only crosses segments t with
    2*ax[t] <= Xi < 2*bx[t], and since bx[t] <= ax[t] + maxlen within a
    length class, every candidate satisfies 2*ax[t] > Xi - 2*maxlen. Sorting
    each power-of-8 length class by ax turns its candidate set into a
    contiguous window — O(n * local density) instead of the dense O(n * m)
    chunks of _windings_below, and within ~1.5x of the true active-pair floor
    on mixed-length inputs (spiral audit, BENCH.md). EXACT same output
    (differential-tested); this is what makes the x-strip fill survive
    crossing-dense inputs where splitting leaves millions of short segments
    (lines_net, BENCH.md)."""
    n = len(segs)
    if n == 0:
        return np.zeros(0, dtype=np.uint8)
    ax, ay, bx, by = segs.ax, segs.ay, segs.bx, segs.by
    x0 = min(ax.min(), bx.min())
    y0 = min(ay.min(), by.min())
    extent = max(
        int(bx.max() - x0), int(by.max() - y0), int(ay.max() - y0), 1
    )
    if 4 * extent * extent >= (1 << 62):
        if allow_sweep:
            # python-int sweep: exact at any scale and O(n log n), vs the
            # dense object-int matrix the windowed path would otherwise need
            return compute_fills_sweep(segs, fill_rule)
        return compute_fills(segs, fill_rule)  # object-int path
    # grouped-by-ray-x path: when rays share few distinct midpoints (grid-like
    # data — exactly the shape that lands in narrow x-strips of the distributed
    # fill), per-unique-Xi sorted activation thresholds beat both the dense
    # matrix and the window; the U*8 <= n gate bounds its O(U*n) candidate scans
    tax_all, tay_all = ax - x0, ay - y0
    tbx_all, tby_all = bx - x0, by - y0
    uxi, inv = np.unique(tax_all + tbx_all, return_inverse=True)
    if len(uxi) * 8 <= n:
        wind_s, wind_c = _windings_grouped(
            tax_all, tay_all, tbx_all, tby_all, segs.subj, segs.clip, uxi, inv
        )
        top_s = wind_s + segs.subj
        top_c = wind_c + segs.clip
        return (
            _is_inside(top_s, fill_rule).astype(np.uint8) * SUBJ_TOP
            | _is_inside(wind_s, fill_rule).astype(np.uint8) * SUBJ_BOTTOM
            | _is_inside(top_c, fill_rule).astype(np.uint8) * CLIP_TOP
            | _is_inside(wind_c, fill_rule).astype(np.uint8) * CLIP_BOTTOM
        )
    # length-class windows: ONE global-maxlen window overshoots badly when span
    # lengths are mixed (spiral: median chord 24x shorter than the longest), so
    # non-vertical segments are bucketed into power-of-8 x-length classes, each
    # searched with its own window. Candidate totals are measured up front and
    # the dense kernel kept when it is genuinely cheaper (e.g. inside one
    # x-strip of the distributed fill, where the strip IS the window).
    tax, tay = tax_all, tay_all
    tbx, tby = tbx_all, tby_all
    Xi = tax + tbx
    Yi = tay + tby
    wind_s = np.zeros(n, dtype=np.int64)
    wind_c = np.zeros(n, dtype=np.int64)
    nv = np.flatnonzero(tbx > tax)
    if len(nv):
        L = (tbx - tax)[nv]
        cls = (np.frexp(L.astype(np.float64))[1] - 1) // 3  # floor(log2 L) // 3
        # dispatch estimate on a strided ray SAMPLE: est only chooses among
        # exact paths, and the full searchsorted over every ray was the single
        # biggest line of the spiral's fill (0.17 s of a 1.06 s fill — BENCH.md
        # round 5). The window path below re-runs the search over all rays for
        # the classes it actually scans.
        stride = 16 if n >= 200_000 else 1
        Xi_s = Xi[::stride]
        sorted_classes = []
        est = 0
        for cval in np.unique(cls):
            idx = nv[cls == cval]
            idx = idx[np.argsort(tax[idx], kind="stable")]
            sax2 = 2 * tax[idx]
            wlen = 2 * int((tbx[idx] - tax[idx]).max())
            lo_s = np.searchsorted(sax2, Xi_s - wlen, side="left")
            hi_s = np.searchsorted(sax2, Xi_s, side="right")
            est += int(np.maximum(hi_s - lo_s, 0).sum()) * stride
            sorted_classes.append((idx, sax2, wlen, lo_s, hi_s))
        if 2 * est >= n * len(nv):
            return compute_fills(segs, fill_rule)
        if est > 32 * n:
            # dense active sets (spiral-like bands): the vectorized segment
            # tree (O((n+q) log^2 n), _windings_segtree) beats the O(est)
            # candidate scan; unlike the python sweep it is ray-at-midpoint
            # semantics, so it is valid on strip SUBSETS too (the
            # allow_sweep=False callers) — the r03 sweep-subset trap does not
            # apply. Crossover estimate: the windowed scan costs ~est
            # gather-heavy pair evals while the segtree costs ~(n+q)·log²n
            # lighter ones; at the measured constants (spiral audit: segtree
            # 2.9 s at 393k segs vs windowed 15.2 s at est/n≈156) the
            # break-even sits near est/n ≈ 32.
            return compute_fills_segtree(segs, fill_rule, threads=threads)
        block = 4_000_000
        for idx, sax2, wlen, lo_s, hi_s in sorted_classes:
            if stride == 1:
                lo, hi = lo_s, hi_s
            else:
                lo = np.searchsorted(sax2, Xi - wlen, side="left")
                hi = np.searchsorted(sax2, Xi, side="right")
            counts = np.maximum(hi - lo, 0)
            cum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(counts)])
            start = 0
            while start < n:
                stop = int(np.searchsorted(cum, cum[start] + block, side="left"))
                stop = min(max(stop, start + 1), n)
                c = counts[start:stop]
                total = int(c.sum())
                base = cum[start]
                qlo = start
                start = stop
                if total == 0:
                    continue
                q = np.repeat(np.arange(qlo, stop, dtype=np.int64), c)
                t = idx[np.arange(total, dtype=np.int64) - (cum[q] - base) + lo[q]]
                m = Xi[q] < 2 * tbx[t]
                q, t = q[m], t[m]
                if len(q) == 0:
                    continue
                dtt = tbx[t] - tax[t]
                num = 2 * tay[t] * dtt + (tby[t] - tay[t]) * (Xi[q] - 2 * tax[t])
                below = num < Yi[q] * dtt
                q, t = q[below], t[below]
                if len(q) == 0:
                    continue
                # bincount beats np.add.at ~10x (buffered C loop); winding sums
                # are far below 2^53 so the float64 accumulation is exact
                qr = q - qlo
                span = stop - qlo
                wind_s[qlo:stop] += np.bincount(
                    qr, weights=segs.subj[t], minlength=span
                ).astype(np.int64)
                wind_c[qlo:stop] += np.bincount(
                    qr, weights=segs.clip[t], minlength=span
                ).astype(np.int64)

    top_s = wind_s + segs.subj
    top_c = wind_c + segs.clip
    return (
        _is_inside(top_s, fill_rule).astype(np.uint8) * SUBJ_TOP
        | _is_inside(wind_s, fill_rule).astype(np.uint8) * SUBJ_BOTTOM
        | _is_inside(top_c, fill_rule).astype(np.uint8) * CLIP_TOP
        | _is_inside(wind_c, fill_rule).astype(np.uint8) * CLIP_BOTTOM
    )
