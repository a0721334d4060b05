"""Batched multi-pair overlay: run MANY small boolean jobs through ONE vectorized
pipeline pass.

The per-pair kernel costs ~600us/pair in numpy-call overhead when jobs are tiny
(10-segment polygons). This module amortizes it: every job of a batch is translated
into its own disjoint x-tile (slot * W), all segments are concatenated, and
sort/merge/split/fill run ONCE over the whole batch — the x-sweep candidate pruning
and the x-span winding test never pair segments from different tiles, so results are
bit-identical to running each job alone (differential-tested in
tests/test_batch_kernel.py).

This is the engine's List-solver analog of the reference's job-level parallelism
(rayon over jobs), re-expressed as data-level batching inside one Arrow batch:
the Spark operator hands a bucket of pairs to one applyInPandas call, which lands
here (operators/overlay_df.py).

Stage map (same semantics as the scalar kernel, SURVEY.md §2.2):
  ingest/clean  — vectorized dirty-ring detection; only dirty rings take the scalar
                  dedup/collinear path (iOverlay/src/segm/build.rs:35-127)
  sort+merge    — existing vectorized sort_and_merge over the whole batch
  split (A4-A9) — vectorized candidate generation (repeat/cumsum sweep windows) +
                  vectorized orientation-sign prefilter; the exact python-int cross
                  solver (split.cross_pair) runs only on truly interacting pairs
  fill (A10)    — per-tile compute_fills over contiguous slices
  extract       — per-tile scalar walk (already per-job work)
"""

from __future__ import annotations

import numpy as np

from ..options import DEFAULT_OPTIONS, FillRule, OverlayOptions, OverlayRule
from .extract import extract_shapes
from .fill import compute_fills
from .overlay import build_graph
from .segments import Segments, build_segments, sort_and_merge
from .split import _apply_marks, cross_pair

Shapes = list[list[np.ndarray]]

_COORD_CAP = 1 << 30  # beyond this, scalar path (object-int math) is required


def _scalar_batch(jobs, rules, fill_rule, options) -> list[dict]:
    out = []
    for subj, clip in jobs:
        g = build_graph(subj, clip, fill_rule, options)
        out.append({rule: g.extract(rule) for rule in rules})
    return out


def _candidates_vec(segs: Segments) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized bbox-overlap candidate pairs (i < j). Precondition: sorted by a."""
    n = len(segs)
    if n < 2:
        z = np.empty(0, dtype=np.int64)
        return z, z
    ax, bx = segs.ax, segs.bx
    his = np.searchsorted(ax, bx, side="right")
    i0 = np.arange(n, dtype=np.int64)
    counts = np.maximum(his - i0 - 1, 0)
    total = int(counts.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    i_rep = np.repeat(i0, counts)
    cum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(counts)])
    j = np.arange(total, dtype=np.int64) - cum[i_rep] + i_rep + 1
    ymin = np.minimum(segs.ay, segs.by)
    ymax = np.maximum(segs.ay, segs.by)
    m = (ymin[j] <= ymax[i_rep]) & (ymax[j] >= ymin[i_rep])
    return i_rep[m], j[m]


def interacting_mask(ax, ay, bx, by, cx, cy, dx_, dy_) -> np.ndarray:
    """Vectorized orientation-sign prefilter over PAIRED endpoint arrays
    (first segment (ax,ay)-(bx,by), second (cx,cy)-(dx_,dy_); both a<b
    normalized): True exactly when cross_pair can emit marks — mirrors the
    early-outs of CrossSolver (iOverlay/src/split/cross_solver.rs:76-130).

    The fully-collinear case (all four orientations zero) additionally requires
    the spans to overlap STRICTLY (lexicographically) — same-line chains that
    merely share an endpoint produce no marks, and flagging them turns
    collinear stacks (e.g. split strip edges) into millions of no-op exact-solver
    calls."""
    d1x, d1y = bx - ax, by - ay
    d2x, d2y = dx_ - cx, dy_ - cy
    o1 = np.sign(d1x * (cy - ay) - d1y * (cx - ax))
    o2 = np.sign(d1x * (dy_ - ay) - d1y * (dx_ - ax))
    o3 = np.sign(d2x * (ay - cy) - d2y * (ax - cx))
    o4 = np.sign(d2x * (by - cy) - d2y * (bx - cx))
    s = (o1 == 0).astype(np.int8) + (o2 == 0) + (o3 == 0) + (o4 == 0)

    def lex_lt(px, py, qx, qy):
        return (px < qx) | ((px == qx) & (py < qy))

    # strict lexicographic overlap of collinear spans: max(a, c) < min(b, d)
    a_ge_c = ~lex_lt(ax, ay, cx, cy)
    mx = np.where(a_ge_c, ax, cx)
    my = np.where(a_ge_c, ay, cy)
    b_le_d = ~lex_lt(dx_, dy_, bx, by)
    nx = np.where(b_le_d, bx, dx_)
    ny = np.where(b_le_d, by, dy_)
    collinear_overlap = lex_lt(mx, my, nx, ny)
    return ((s == 4) & collinear_overlap) | ((s <= 1) & (o1 != o2) & (o3 != o4))


def _interacting(segs: Segments, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    ax, ay, bx, by = segs.ax, segs.ay, segs.bx, segs.by
    return interacting_mask(
        ax[i], ay[i], bx[i], by[i], ax[j], ay[j], bx[j], by[j]
    )


def _split_batch(segs: Segments, max_rounds: int = 64) -> Segments:
    """Snap-radius fixpoint with vectorized candidate + prefilter stages; the exact
    cross solver runs per interacting pair only. Same radius schedule as
    split.split_segments (start=0, step=1, cap 2^60)."""
    segs = sort_and_merge(segs)
    exp = 0
    for _ in range(max_rounds):
        if len(segs) < 2:
            return segs
        radius = 1 << exp
        ci, cj = _candidates_vec(segs)
        if len(ci):
            keep = _interacting(segs, ci, cj)
            ci, cj = ci[keep], cj[keep]
        marks: list[tuple[int, int, int]] = []
        need_fix = False
        if len(ci):
            iax = segs.ax
            iay = segs.ay
            ibx = segs.bx
            iby = segs.by
            for i, j in zip(ci.tolist(), cj.tolist()):
                pm, rnd = cross_pair(
                    (int(iax[i]), int(iay[i]), int(ibx[i]), int(iby[i])),
                    (int(iax[j]), int(iay[j]), int(ibx[j]), int(iby[j])),
                    radius,
                )
                need_fix = need_fix or rnd
                for which, x, y in pm:
                    marks.append((i if which == 0 else j, x, y))
        if not marks:
            return segs
        segs = sort_and_merge(_apply_marks(segs, marks))
        exp = min(60, exp + 1)
        if not need_fix:
            return segs
    return segs


def _fills_batch(segs: Segments, fill_rule: FillRule, tile_lo: np.ndarray) -> np.ndarray:
    """Vectorized winding classification for the whole batch: each segment's downward
    ray at its doubled midpoint x is summed against same-tile segments whose x-span
    contains it (exactly fill._windings_below's math, windowed by tile). tile_lo[i] =
    first segment index of segment i's tile (segments sorted by ax)."""
    from .fill import CLIP_BOTTOM, CLIP_TOP, SUBJ_BOTTOM, SUBJ_TOP, _is_inside

    n = len(segs)
    ax, ay, bx, by = segs.ax, segs.ay, segs.bx, segs.by
    Xi = ax + bx
    Yi = ay + by
    # candidate window: same-tile segments with 2*ax <= Xi (ax sorted)
    hi = np.searchsorted(2 * ax, Xi, side="right")
    counts = np.maximum(hi - tile_lo, 0)
    total = int(counts.sum())
    wind_s = np.zeros(n, dtype=np.int64)
    wind_c = np.zeros(n, dtype=np.int64)
    if total:
        q = np.repeat(np.arange(n, dtype=np.int64), counts)
        cum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(counts)])
        t = np.arange(total, dtype=np.int64) - cum[q] + tile_lo[q]
        dt = bx[t] - ax[t]
        m = (dt > 0) & (Xi[q] < 2 * bx[t])  # non-vertical t, span upper bound
        if m.any():
            q, t, dt = q[m], t[m], dt[m]
            num = 2 * ay[t] * dt + (by[t] - ay[t]) * (Xi[q] - 2 * ax[t])
            below = num < Yi[q] * dt
            if below.any():
                q, t = q[below], t[below]
                np.add.at(wind_s, q, segs.subj[t])
                np.add.at(wind_c, q, segs.clip[t])
    top_s = wind_s + segs.subj
    top_c = wind_c + segs.clip
    return (
        _is_inside(top_s, fill_rule).astype(np.uint8) * SUBJ_TOP
        | _is_inside(wind_s, fill_rule).astype(np.uint8) * SUBJ_BOTTOM
        | _is_inside(top_c, fill_rule).astype(np.uint8) * CLIP_TOP
        | _is_inside(wind_c, fill_rule).astype(np.uint8) * CLIP_BOTTOM
    )


_EMPTY = "empty"


def vectorized_ring_segments(ring_pts, ring_job, ring_subj, options=DEFAULT_OPTIONS):
    """Vectorized ingest of many rings at once: normalized directed segments with
    winding counts and per-segment job ids. Clean rings build entirely in numpy;
    dirty rings (dup/collinear vertices) take the reference-exact scalar cleanup.

    Returns (ax, ay, bx, by, subj, clip, ejob), _EMPTY, or None (coords too large
    for int64-safe batch math — caller must use the scalar path)."""
    nr = len(ring_pts)
    if nr == 0:
        return _EMPTY
    counts = np.array([len(p) for p in ring_pts], dtype=np.int64)
    P = np.concatenate(ring_pts, axis=0) if nr else np.zeros((0, 2), np.int64)
    if len(P) == 0:
        return _EMPTY
    if int(np.abs(P).max(initial=0)) >= _COORD_CAP:
        return None
    S = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(counts)])
    ring_of = np.repeat(np.arange(nr, dtype=np.int64), counts)
    idx = np.arange(len(P), dtype=np.int64)
    start = S[ring_of]
    end = S[ring_of + 1]
    nxt = np.where(idx + 1 == end, start, idx + 1)

    # dirty ring = any consecutive duplicate or (unless preserved) collinear vertex
    dirty = np.zeros(nr, dtype=bool)
    dirty[counts < 3] = True
    dup = np.all(P == P[nxt], axis=1)
    dirty[ring_of[dup]] = True
    if not options.preserve_input_collinear:
        prv = np.where(idx == start, end - 1, idx - 1)
        a = P - P[prv]
        b = P - P[nxt]
        cr = a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]
        dirty[ring_of[cr == 0]] = True

    # clean rings: vectorized edge build (one edge per point)
    cm = ~dirty[ring_of]
    p0 = P[cm]
    p1 = P[nxt[cm]]
    e_job = np.asarray(ring_job, dtype=np.int64)[ring_of[cm]]
    e_subj = np.asarray(ring_subj, dtype=bool)[ring_of[cm]]
    fwd = (p0[:, 0] < p1[:, 0]) | ((p0[:, 0] == p1[:, 0]) & (p0[:, 1] < p1[:, 1]))
    eax = np.where(fwd, p0[:, 0], p1[:, 0])
    eay = np.where(fwd, p0[:, 1], p1[:, 1])
    ebx = np.where(fwd, p1[:, 0], p0[:, 0])
    eby = np.where(fwd, p1[:, 1], p0[:, 1])
    cnt = np.where(fwd, 1, -1).astype(np.int64)
    esubj = np.where(e_subj, cnt, 0)
    eclip = np.where(e_subj, 0, cnt)

    # dirty rings: scalar path (reference-exact cleanup), appended
    parts_ax = [eax]
    parts_ay = [eay]
    parts_bx = [ebx]
    parts_by = [eby]
    parts_s = [esubj]
    parts_c = [eclip]
    parts_j = [e_job]
    for r in np.flatnonzero(dirty):
        sg = build_segments([ring_pts[r]], ring_subj[r], options.preserve_input_collinear)
        if len(sg) == 0:
            continue
        parts_ax.append(sg.ax)
        parts_ay.append(sg.ay)
        parts_bx.append(sg.bx)
        parts_by.append(sg.by)
        parts_s.append(sg.subj)
        parts_c.append(sg.clip)
        parts_j.append(np.full(len(sg), ring_job[r], dtype=np.int64))
    ax = np.concatenate(parts_ax)
    if len(ax) == 0:
        return _EMPTY
    return (
        ax,
        np.concatenate(parts_ay),
        np.concatenate(parts_bx),
        np.concatenate(parts_by),
        np.concatenate(parts_s),
        np.concatenate(parts_c),
        np.concatenate(parts_j),
    )


def _batch_tiled_segments(jobs, options):
    """Shared ingest + tile placement: jobs' rings -> one raw normalized Segments
    set with each job translated into its own disjoint x-tile.

    Returns (Segments, off, y0, W), the string _EMPTY (no segments at all), or
    None (huge coords / overflow risk: caller must take the scalar path)."""
    nj = len(jobs)
    # ---- ingest + clean -----------------------------------------------------
    ring_pts: list[np.ndarray] = []
    ring_job: list[int] = []
    ring_subj: list[bool] = []
    for jid, (subj, clip) in enumerate(jobs):
        for r in subj:
            ring_pts.append(np.asarray(r, dtype=np.int64).reshape(-1, 2))
            ring_job.append(jid)
            ring_subj.append(True)
        for r in clip:
            ring_pts.append(np.asarray(r, dtype=np.int64).reshape(-1, 2))
            ring_job.append(jid)
            ring_subj.append(False)
    nr = len(ring_pts)
    if nr == 0:
        return _EMPTY
    t = vectorized_ring_segments(ring_pts, ring_job, ring_subj, options)
    if t is None:
        return None
    if t == _EMPTY:
        return _EMPTY
    ax, ay, bx, by, subj, clip, ejob = t

    # ---- tile placement -----------------------------------------------------
    BIG = np.int64(1 << 62)
    minx = np.full(nj, BIG, dtype=np.int64)
    maxx = np.full(nj, -BIG, dtype=np.int64)
    np.minimum.at(minx, ejob, ax)  # a<b lexicographic => ax is the segment min x
    np.maximum.at(maxx, ejob, bx)
    present = maxx >= minx
    minx[~present] = 0
    maxx[~present] = 0
    W = int((maxx - minx).max(initial=0)) + 8
    y0 = int(min(ay.min(), by.min()))
    H = int(max(ay.max(), by.max())) - y0 + 1
    if W * max(H, 1) >= (1 << 60) or W * nj >= (1 << 62):
        return None
    off = np.arange(nj, dtype=np.int64) * W + 2 - minx
    ax = ax + off[ejob]
    bx = bx + off[ejob]
    ay = ay - y0
    by = by - y0
    return Segments(ax, ay, bx, by, subj, clip), off, y0, W


def _graph_batch_parts(jobs, fill_rule, options):
    """One tiled split+fill pass over a whole batch. Returns
    (segs, all_fills, starts, off, y0) in TILED coordinates, _EMPTY, or None."""
    t = _batch_tiled_segments(jobs, options)
    if t is None or t == _EMPTY:
        return t
    raw, off, y0, W = t
    segs = _split_batch(raw)
    n = len(segs)
    if n == 0:
        return _EMPTY
    nj = len(jobs)
    starts = np.searchsorted(segs.ax, np.arange(nj + 1, dtype=np.int64) * W)
    seg_tile = np.searchsorted(starts, np.arange(n, dtype=np.int64), side="right") - 1
    all_fills = _fills_batch(segs, fill_rule, starts[seg_tile])
    return segs, all_fills, starts, off, y0


def graph_batch(
    jobs: list[tuple[list[np.ndarray], list[np.ndarray]]],
    fill_rule: FillRule = FillRule.EVEN_ODD,
    options: OverlayOptions = DEFAULT_OPTIONS,
):
    """Batched split+fill: per-job (Segments, fills) in ORIGINAL coordinates, via
    one tiled _split_batch + _fills_batch pass. Returns None when the batch needs
    the scalar path (caller falls back to per-job build_graph)."""
    nj = len(jobs)
    t = _graph_batch_parts(jobs, fill_rule, options)
    if t is None:
        return None
    empty = Segments(*[np.empty(0, dtype=np.int64)] * 6)
    if t == _EMPTY:
        return [(empty, np.empty(0, dtype=np.uint8)) for _ in range(nj)]
    segs, all_fills, starts, off, y0 = t
    out = []
    for slot in range(nj):
        lo, hi = int(starts[slot]), int(starts[slot + 1])
        if lo == hi:
            out.append((empty, np.empty(0, dtype=np.uint8)))
            continue
        sub = Segments(
            segs.ax[lo:hi] - int(off[slot]),
            segs.ay[lo:hi] + y0,
            segs.bx[lo:hi] - int(off[slot]),
            segs.by[lo:hi] + y0,
            segs.subj[lo:hi],
            segs.clip[lo:hi],
        )
        out.append((sub, all_fills[lo:hi]))
    return out


def overlay_batch(
    jobs: list[tuple[list[np.ndarray], list[np.ndarray]]],
    rules: list[OverlayRule],
    fill_rule: FillRule = FillRule.EVEN_ODD,
    options: OverlayOptions = DEFAULT_OPTIONS,
) -> list[dict[OverlayRule, Shapes]]:
    """Run a batch of (subj_rings, clip_rings) jobs; returns per-job {rule: shapes}.

    Bit-identical to per-job kernel runs (tiles are disjoint in x, so no stage ever
    pairs segments across jobs). Falls back to the scalar path when coordinates are
    large enough to need python-int math batch-wide."""
    rules = [OverlayRule(r) for r in rules]
    nj = len(jobs)
    if nj == 0:
        return []
    if nj == 1:
        return _scalar_batch(jobs, rules, fill_rule, options)
    t = _graph_batch_parts(jobs, fill_rule, options)
    if t is None:
        return _scalar_batch(jobs, rules, fill_rule, options)
    results: list[dict[OverlayRule, Shapes]] = [
        {rule: [] for rule in rules} for _ in range(nj)
    ]
    if t == _EMPTY:
        return results
    segs, all_fills, starts, off, y0 = t
    # boundary masks per rule, computed ONCE over the whole batch and sliced per tile
    from .extract import boundary_mask

    rule_masks = {rule: boundary_mask(all_fills, rule) for rule in rules}
    for slot in range(nj):
        lo, hi = int(starts[slot]), int(starts[slot + 1])
        if lo == hi:
            continue
        sub = Segments(
            segs.ax[lo:hi] - int(off[slot]),
            segs.ay[lo:hi] + y0,
            segs.bx[lo:hi] - int(off[slot]),
            segs.by[lo:hi] + y0,
            segs.subj[lo:hi],
            segs.clip[lo:hi],
        )
        fills = all_fills[lo:hi]
        for rule in rules:
            results[slot][rule] = extract_shapes(
                sub, fills, rule, options, boundary=rule_masks[rule][lo:hi]
            )
    return results
