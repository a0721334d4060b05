"""Single-pair overlay orchestration: the numpy kernel the Spark operators wrap.

Pipeline per reference lifecycle (SURVEY.md §3.1 / iOverlay/src/core/overlay.rs:354-372):
ingest -> sort+merge -> snap-rounded split fixpoint -> winding fill -> per-rule
boundary filter + face extraction + hole binding.

`OverlayGraph` mirrors `build_graph_view` (iOverlay/src/core/overlay.rs:303-313):
split + fill computed once, N cheap extracts reuse them.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..options import DEFAULT_OPTIONS, FillRule, OverlayOptions, OverlayRule
from .extract import extract_shapes
from .fill import compute_fills_windowed
from .segments import Segments, build_segments, sort_and_merge
from .split import split_segments

Shapes = list[list[np.ndarray]]  # shapes -> rings (hull first) -> (n,2) int64


@dataclass
class OverlayGraph:
    segments: Segments
    fills: np.ndarray
    options: OverlayOptions

    def extract(self, rule: OverlayRule) -> Shapes:
        return extract_shapes(self.segments, self.fills, rule, self.options)


from .gcpause import gc_paused_fn


@gc_paused_fn
def build_graph(
    subj: list[np.ndarray],
    clip: list[np.ndarray],
    fill_rule: FillRule = FillRule.EVEN_ODD,
    options: OverlayOptions = DEFAULT_OPTIONS,
) -> OverlayGraph:
    rings = [np.asarray(r, dtype=np.int64).reshape(-1, 2) for r in subj] + [
        np.asarray(r, dtype=np.int64).reshape(-1, 2) for r in clip
    ]
    t = None
    if rings:
        # batched ingest (one numpy pass over all rings; dirty rings take the
        # reference-exact scalar cleanup inside) — the per-ring python loop in
        # build_segments was ~20% of large monolithic one-shots. Falls back to
        # the scalar path only for coords beyond the int64-safe batch cap.
        from .batch import _EMPTY, vectorized_ring_segments

        t = vectorized_ring_segments(
            rings,
            np.zeros(len(rings), dtype=np.int64),
            [True] * len(subj) + [False] * len(clip),
            options,
        )
    if t is None:
        segs = Segments.concat(
            [
                build_segments(subj, True, options.preserve_input_collinear),
                build_segments(clip, False, options.preserve_input_collinear),
            ]
        )
    elif isinstance(t, str):  # _EMPTY
        segs = Segments.empty()
    else:
        ax, ay, bx, by, s, c, _ = t
        segs = Segments(ax, ay, bx, by, s, c)
    segs = split_segments(segs)  # sorts + merges first (A1/A2), then splits
    fills = compute_fills_windowed(segs, fill_rule)
    return OverlayGraph(segs, fills, options)


# one-shot jobs with at least this many rings try spatial cluster
# decomposition (kernel/cluster.py) before the monolithic pipeline.
CLUSTER_MIN_RINGS = 256


@gc_paused_fn
def overlay(
    subj: list[np.ndarray],
    clip: list[np.ndarray],
    rule: OverlayRule,
    fill_rule: FillRule = FillRule.EVEN_ODD,
    options: OverlayOptions = DEFAULT_OPTIONS,
) -> Shapes:
    """One-shot boolean overlay of two multipolygons (integer coordinates).

    Large separable jobs (many contours whose bbox-overlap graph splits into
    independent components — disjoint islands) are decomposed and routed
    through the batched tile kernel, which is exactly equivalent (see
    kernel/cluster.py for the proof sketch) and orders of magnitude faster
    than one monolithic fixpoint over the union of all islands.

    Output SHAPE ORDER is not stable across code paths: the clustered route
    groups shapes by cluster first-appearance while the monolithic route emits
    extraction order. The set of shapes is identical either way; this matches
    the reference contract (its own fixture comparator is order-canonical,
    iOverlay/tests/util.rs) — consumers must not index output positionally."""
    if len(subj) + len(clip) >= CLUSTER_MIN_RINGS:
        from .cluster import cluster_labels

        # flat end-to-end: one concatenate + per-ring bboxes, labels as the
        # ring->job map, the batch kernel's flat ingest/emit — no per-ring
        # python job lists anywhere (they were ~30% of large one-shots and made
        # every GC pass O(rings))
        rings = [np.asarray(r, dtype=np.int64).reshape(-1, 2) for r in subj] + [
            np.asarray(r, dtype=np.int64).reshape(-1, 2) for r in clip
        ]
        nr = len(rings)
        counts = np.fromiter((len(r) for r in rings), dtype=np.int64, count=nr)
        P = np.concatenate(rings) if nr else np.empty((0, 2), dtype=np.int64)
        starts = np.zeros(nr, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        ok = counts > 0
        red = starts[ok]
        minx = np.minimum.reduceat(P[:, 0], red) if ok.any() else np.empty(0, np.int64)
        if ok.all() and nr >= 2:
            maxx = np.maximum.reduceat(P[:, 0], red)
            miny = np.minimum.reduceat(P[:, 1], red)
            maxy = np.maximum.reduceat(P[:, 1], red)
            labels = cluster_labels(minx, miny, maxx, maxy)
            if labels is not None:
                from .batch import overlay_batch_flat_out

                ring_subj = np.zeros(nr, dtype=bool)
                ring_subj[: len(subj)] = True
                flat = overlay_batch_flat_out(
                    P, counts, labels, ring_subj, int(labels.max()) + 1,
                    [rule], fill_rule, options,
                )[rule]
                return _flat_to_shapes(flat)
    return build_graph(subj, clip, fill_rule, options).extract(rule)


def _flat_to_shapes(flat) -> Shapes:
    """(job, sid, cidx, lens, pts, a2) -> the Shapes list API (rings are views
    of one contiguous buffer; shape boundaries at contour_idx == 0)."""
    _, _, cidx, lens, pts, _ = flat
    if len(lens) == 0:
        return []
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    # direct slicing, not np.split: array_split creates each sub-array through
    # a python _wrapfunc/swapaxes pair — ~2.5x slower per ring at 100k+ rings
    # (profiled on the windows scenario, 30% of the one-shot wall)
    ob = offs.tolist()
    out: Shapes = []
    last = None
    for i, first in enumerate((cidx == 0).tolist()):
        r = pts[ob[i]:ob[i + 1]]
        if first:
            last = [r]
            out.append(last)
        else:
            last.append(r)
    return out


def simplify(
    shapes: list[np.ndarray],
    fill_rule: FillRule = FillRule.NON_ZERO,
    options: OverlayOptions = DEFAULT_OPTIONS,
) -> Shapes:
    """Self-union: resolve self-intersections of one multipolygon
    (reference Simplify, iOverlay/src/core/simplify.rs:23-426)."""
    return overlay(shapes, [], OverlayRule.SUBJECT, fill_rule, options)
