"""A18 contour decomposition: split a self-touching contour into simple sub-contours
at repeated vertices.

Reference: ContourDecomposition::decompose_contours (iOverlay/src/core/divide.rs:34-289)
— stack-based single pass: walk the ring keeping a stack of visited vertices; when the
current vertex equals an earlier stack entry, the slice between the two occurrences is
a closed loop — emit it and collapse the stack. The remainder after the full walk is
the final sub-contour. Orientation of each emitted loop is its traversal order, so
winding is preserved per loop.

Used standalone (the public decompose op) and as the `extract_ogc` post-pass
(iOverlay/src/core/extract_ogc.rs:19-350 splits pinch-point shapes the same way).
"""

from __future__ import annotations

import numpy as np


def decompose_ring(ring) -> list[np.ndarray]:
    """Split one closed ring (endpoint not repeated) at repeated vertices.

    Returns simple sub-rings (each visits no vertex twice); rings with fewer than
    3 vertices after splitting are dropped."""
    pts = [(int(x), int(y)) for x, y in np.asarray(ring).reshape(-1, 2)]
    # drop consecutive duplicates (incl. wrap)
    dedup = [p for i, p in enumerate(pts) if p != pts[i - 1]]
    out: list[np.ndarray] = []
    stack: list[tuple[int, int]] = []
    pos: dict[tuple[int, int], int] = {}
    for p in dedup:
        if p in pos:
            i = pos[p]
            loop = stack[i:]
            for q in loop[1:]:
                pos.pop(q, None)
            if len(loop) >= 3:
                out.append(np.array(loop, dtype=np.int64))
            del stack[i + 1 :]
        else:
            pos[p] = len(stack)
            stack.append(p)
    if len(stack) >= 3:
        out.append(np.array(stack, dtype=np.int64))
    return out


def decompose_contours(contours: list[np.ndarray]) -> list[np.ndarray]:
    """Decompose every contour of a multipolygon into simple sub-contours."""
    out: list[np.ndarray] = []
    for ring in contours:
        out.extend(decompose_ring(ring))
    return out
