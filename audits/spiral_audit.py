"""Spiral self-union audit — reference perf scenario test_3_spiral.rs.

Geometry replicates /root/reference/performance/rust_app/src/test/util.rs:181-227:
a zigzag spiral band (width 0.1*r, zigzag amplitude +/-0.2*r) whose inner and
outer rails cross each other, resolved with OverlayRule SUBJECT / NON_ZERO via
the float shell (f64 input, i32-scale adapter like the reference's i32 rows).
"""
import sys, time, math
import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ioverlay_spark.functions.float_shell import float_overlay, NumpyFloatAdapter
from ioverlay_spark.options import OverlayRule, FillRule


def spiral(count: int, radius: float) -> np.ndarray:
    a_path, b_path = [], []
    a, r = 0.0, radius
    w = 0.1 * radius
    p0 = np.array([0.0, 0.0])
    for i in range(count):
        sx, sy = math.cos(a), math.sin(a)
        rr = r + 0.2 * radius if i % 2 == 0 else r - 0.2 * radius
        p = np.array([rr * sx, rr * sy])
        d = p - p0
        n = d / math.hypot(d[0], d[1])
        t = np.array([w * -n[1], w * n[0]])
        a_path.append(p0 + t)
        a_path.append(p + t)
        b_path.append(p0 - t)
        b_path.append(p - t)
        a += radius / r
        r = radius * (1.0 + a / (2.0 * math.pi))
        p0 = p
    b_path.reverse()
    return np.array(a_path + b_path)


def main():
    ns = [int(x) for x in sys.argv[1:]] or [65536, 262144, 524288]
    for n in ns:
        path = spiral(n, 100.0)
        best = float("inf")
        reps = 3 if n <= 65536 else 2
        for _ in range(reps):
            t0 = time.perf_counter()
            shapes = float_overlay(
                [path], [], OverlayRule.SUBJECT, FillRule.NON_ZERO, dtype=np.float64
            )
            best = min(best, time.perf_counter() - t0)
        nrings = sum(len(s) for s in shapes)
        print(
            f"n={n} shapes={len(shapes)} rings={nrings} wall={best:.3f}s "
            f"segs_per_s={2*n/best:,.0f}"
        )


if __name__ == "__main__":
    main()
