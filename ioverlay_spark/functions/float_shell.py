"""Float sugar over the integer string/mesh kernels (reference float API breadth:
iOverlay/src/float/{single.rs, string_overlay.rs, clip.rs, slice.rs} and the
float Stroke/Outline traits).

Same architecture as the reference: floats snap onto an integer grid via an
adapter (fitted from the union bounding box, or user-fixed scale), the robust
integer kernel does the work, outputs map back int -> float. The adapter rounds
half away from zero (Rust f64::round), matching functions/adapter.FloatAdapter's
Column expressions — these numpy helpers are the kernel-side twins used inside
pandas UDFs.
"""

from __future__ import annotations

import math

import numpy as np

from ..options import FillRule, OverlayOptions
from .adapter import TARGET_BITS, _ceil_log2


class NumpyFloatAdapter:
    """Kernel-side adapter: offset + power-of-two scale, half-away-from-zero."""

    def __init__(self, offset_x: float, offset_y: float, scale: float):
        self.offset_x = offset_x
        self.offset_y = offset_y
        self.scale = scale

    @classmethod
    def fixed_scale(cls, grid_size: float) -> "NumpyFloatAdapter":
        return cls(0.0, 0.0, 1.0 / grid_size)

    @classmethod
    def fit(cls, arrays: list[np.ndarray]) -> "NumpyFloatAdapter":
        """Union-bbox fit (FloatPointAdapter::with_iter): power-of-two scale sized
        so the integer extent is ~2^29."""
        pts = [np.asarray(a, dtype=np.float64).reshape(-1, 2) for a in arrays if len(a)]
        if not pts:
            return cls(0.0, 0.0, 1.0)
        allp = np.concatenate(pts, axis=0)
        min_x, min_y = float(allp[:, 0].min()), float(allp[:, 1].min())
        extent = max(
            float(allp[:, 0].max()) - min_x, float(allp[:, 1].max()) - min_y, 1e-12
        )
        k = TARGET_BITS - _ceil_log2(extent)
        return cls(min_x, min_y, float(math.ldexp(1.0, k)))

    def quantize(self, arr: np.ndarray) -> np.ndarray:
        p = np.asarray(arr, dtype=np.float64).reshape(-1, 2)
        v = (p - np.array([self.offset_x, self.offset_y])) * self.scale
        q = np.where(v >= 0, np.floor(v + 0.5), -np.floor(-v + 0.5))
        return q.astype(np.int64)

    def dequantize(self, arr: np.ndarray) -> np.ndarray:
        p = np.asarray(arr, dtype=np.float64).reshape(-1, 2)
        return p / self.scale + np.array([self.offset_x, self.offset_y])


def float_clip_path(
    body: list[np.ndarray],
    path: np.ndarray,
    fill_rule: FillRule = FillRule.NON_ZERO,
    invert: bool = False,
    boundary_included: bool = True,
    is_closed_path: bool = False,
    adapter: NumpyFloatAdapter | None = None,
) -> list[np.ndarray]:
    """Reference FloatClip::clip_line (iOverlay/src/float/clip.rs:31-47): float
    polyline clipped by a float polygon. Returns float sub-paths."""
    from ..kernel.string_ops import clip_path

    a = adapter or NumpyFloatAdapter.fit(list(body) + [path])
    parts = clip_path(
        [a.quantize(r) for r in body],
        a.quantize(path),
        fill_rule,
        invert,
        boundary_included,
        is_closed_path,
    )
    return [a.dequantize(p) for p in parts]


def float_slice_shape(
    body: list[np.ndarray],
    paths: list[np.ndarray],
    fill_rule: FillRule = FillRule.NON_ZERO,
    options: OverlayOptions = OverlayOptions(),
    adapter: NumpyFloatAdapter | None = None,
) -> list[list[np.ndarray]]:
    """Reference FloatSlice::slice_by_paths (iOverlay/src/float/slice.rs over
    string/slice.rs): slice a float polygon by float polylines."""
    from ..kernel.string_ops import slice_shape

    a = adapter or NumpyFloatAdapter.fit(list(body) + list(paths))
    shapes = slice_shape(
        [a.quantize(r) for r in body],
        [a.quantize(p) for p in paths],
        fill_rule,
        options,
    )
    return [[a.dequantize(r) for r in shape] for shape in shapes]


def float_stroke(
    path: np.ndarray,
    width: float,
    cap: str = "butt",
    join: str = "round",
    is_closed: bool = False,
    arc_segments: int = 16,
    miter_limit: float = 4.0,
    custom_cap: np.ndarray | None = None,
    adapter: NumpyFloatAdapter | None = None,
) -> list[list[np.ndarray]]:
    """Float stroke sugar (reference Stroke trait over the float shell): the
    path is quantized, the stroke runs on the integer grid with the width scaled
    accordingly, shapes map back to floats."""
    from ..kernel.buffering import stroke

    pts = np.asarray(path, dtype=np.float64).reshape(-1, 2)
    # the stroke extends ~width/2 beyond the path bbox; a custom cap template
    # (unit-space points scaled by r = width/2) may reach further, so pad by
    # the template's max |coordinate| too (ADVICE r02 float_shell.py:130 —
    # otherwise cap geometry can quantize outside the fitted extent)
    pad = width
    if custom_cap is not None and len(custom_cap):
        tpl = np.asarray(custom_cap, dtype=np.float64).reshape(-1, 2)
        pad = width * max(1.0, float(np.abs(tpl).max()))
    a = adapter or NumpyFloatAdapter.fit(
        [pts + (pad, pad), pts - (pad, pad)]
    )
    shapes = stroke(
        a.quantize(pts),
        width * a.scale,
        cap=cap,
        join=join,
        is_closed=is_closed,
        arc_segments=arc_segments,
        miter_limit=miter_limit,
        custom_cap=custom_cap,
    )
    return [[a.dequantize(r) for r in shape] for shape in shapes]


def _clean_contour(pts: np.ndarray) -> np.ndarray | None:
    """Reference clean_result pass (FloatOverlay::overlay,
    iOverlay/src/float/overlay.rs:352-366): after mapping back to float,
    distinct grid points can collapse onto one float value (especially f32) —
    drop duplicate and collinear-spike points in FLOAT space, and drop the
    contour entirely if fewer than 3 survive."""
    p = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    changed = True
    while changed and len(p) >= 3:
        changed = False
        keep = np.ones(len(p), dtype=bool)
        prv = np.roll(p, 1, axis=0)
        nxt = np.roll(p, -1, axis=0)
        dup = np.all(p == prv, axis=1)
        cross = (p[:, 0] - prv[:, 0]) * (nxt[:, 1] - prv[:, 1]) - (
            p[:, 1] - prv[:, 1]
        ) * (nxt[:, 0] - prv[:, 0])
        degen = dup | (cross == 0.0)
        if degen.any():
            keep[np.flatnonzero(degen)[0]] = False
            p = p[keep]
            changed = True
    return p if len(p) >= 3 else None


def _map_many(fn, rings: list[np.ndarray]) -> list[np.ndarray]:
    """Apply a pointwise (N,2)->(N,2) map to many rings via ONE flat call;
    outputs are views of the shared buffer (per-ring python calls dominated
    the float shell on 100k-ring scenario inputs)."""
    if not rings:
        return []
    counts = np.fromiter((len(r) for r in rings), dtype=np.int64, count=len(rings))
    flat = fn(np.concatenate(rings, axis=0))
    offs = np.zeros(len(rings) + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    ob = offs.tolist()
    return [flat[ob[i]:ob[i + 1]] for i in range(len(rings))]


def _dirty_ring_mask(rings: list[np.ndarray]) -> np.ndarray:
    """Vectorized pre-screen for _clean_contour: per ring, does ANY point
    duplicate its predecessor or sit collinear (in float space)? Clean rings —
    the overwhelming majority — skip the per-ring python loop entirely."""
    n = len(rings)
    counts = np.fromiter((len(r) for r in rings), dtype=np.int64, count=n)
    short = counts < 3
    if short.all():
        return np.ones(n, dtype=bool)
    P = np.concatenate(rings, axis=0).astype(np.float64)
    total = len(P)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    starts, ends = offs[:-1], offs[1:]
    idx = np.arange(total, dtype=np.int64)
    prv = idx - 1
    prv[starts[counts > 0]] = ends[counts > 0] - 1
    nxt = idx + 1
    nxt[ends[counts > 0] - 1] = starts[counts > 0]
    pr = P[prv]
    nx = P[nxt]
    dup = (P[:, 0] == pr[:, 0]) & (P[:, 1] == pr[:, 1])
    cross = (P[:, 0] - pr[:, 0]) * (nx[:, 1] - pr[:, 1]) - (
        P[:, 1] - pr[:, 1]
    ) * (nx[:, 0] - pr[:, 0])
    degen = dup | (cross == 0.0)
    any_deg = np.zeros(n, dtype=bool)
    nz = counts > 0
    if nz.any():
        any_deg[nz] = np.add.reduceat(degen, starts[nz]) > 0
    return any_deg | short


def float_overlay(
    subj: list[np.ndarray],
    clip: list[np.ndarray],
    rule,
    fill_rule: FillRule = FillRule.NON_ZERO,
    options: OverlayOptions = OverlayOptions(),
    adapter: NumpyFloatAdapter | None = None,
    clean_result: bool = True,
    dtype=np.float32,
) -> list[list[np.ndarray]]:
    """Reference FloatOverlay (iOverlay/src/float/overlay.rs:96-372): fit an
    adapter over both inputs, run the integer kernel, dequantize, then (by
    default, matching OverlayOptions::default for f32/i32 where
    clean_result = F::BITS <= I::BITS) clean float-space precision artifacts.

    dtype: the float type of the caller's coordinates — dequantized points are
    collapsed at THIS precision before cleaning, mirroring the reference's
    f32 round-trip."""
    from ..kernel.overlay import overlay

    subj = [np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in subj]
    clip = [np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in clip]
    a = adapter or NumpyFloatAdapter.fit(list(subj) + list(clip))
    shapes = overlay(
        _map_many(a.quantize, subj),
        _map_many(a.quantize, clip),
        rule,
        fill_rule,
        options,
    )
    flat_in = [r for shape in shapes for r in shape]
    flat_out = _map_many(lambda p: a.dequantize(p).astype(dtype), flat_in)
    out: list[list[np.ndarray]] = []
    k = 0
    for shape in shapes:
        out.append(flat_out[k:k + len(shape)])
        k += len(shape)
    if not clean_result:
        return out
    dirty = _dirty_ring_mask(flat_out) if flat_out else np.zeros(0, dtype=bool)
    cleaned: list[list[np.ndarray]] = []
    k = 0
    for shape in out:
        rings = []
        for i, r in enumerate(shape):
            if not dirty[k + i]:
                rings.append(r)
                continue
            c = _clean_contour(r)
            if c is None:
                if i == 0:
                    rings = None
                    break
                continue
            rings.append(c.astype(dtype))
        k += len(shape)
        if rings:
            cleaned.append(rings)
    return cleaned
