"""4-vs-16-process scaling probe for the batch kernel's two ring walks.

Each worker process runs overlay_batch over its OWN copy of a flagship-shaped
job batch (hexagon vs shifted rect, 3 rules) in a loop; we time P workers in
parallel at P=4 and P=16 and report per-variant scaling efficiency
T4 / (4 * T16_per_equal_work). This is the measurement that set
FAST_EXTRACT_DEFAULT=False in round 2 (0.906 -> 0.743); re-run it whenever the
walk implementations change materially.

Usage: python audits/walk_scaling_probe.py [variant ...]
  variants: scalar fast fast2k (default: all three)
"""
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JOBS_PER_WORKER = 10_000
REPS = 3  # each worker runs its batch this many times


def _make_jobs(seed: int, n: int):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, 6_000_000, size=n).astype(np.int64)
    x1 = (ids % 10_000) * 100
    y1 = ((ids // 7) % 10_000) * 100
    x2 = x1 + 400 + (ids % 37) * 8
    y2 = y1 + 400 + (ids % 29) * 8
    xm = x1 + ((x2 - x1) >> 1)
    ym = y1 + ((y2 - y1) >> 1)
    jobs = []
    for i in range(n):
        subj = np.array(
            [[x1[i], y1[i]], [x2[i], y1[i]], [x2[i], ym[i]],
             [xm[i], ym[i]], [xm[i], y2[i]], [x1[i], y2[i]]], dtype=np.int64)
        clip = np.array(
            [[x1[i] + 150, y1[i] + 150], [x2[i] + 150, y1[i] + 150],
             [x2[i] + 150, y2[i] + 150], [x1[i] + 150, y2[i] + 150]],
            dtype=np.int64)
        jobs.append(([subj], [clip]))
    return jobs


def _worker(args):
    seed, variant = args
    from ioverlay_spark.kernel.batch import overlay_batch
    from ioverlay_spark.options import DEFAULT_OPTIONS, FillRule, OverlayRule

    rules = [OverlayRule("intersect"), OverlayRule("union"), OverlayRule("xor")]
    jobs = _make_jobs(seed, JOBS_PER_WORKER)
    fast = variant != "scalar"
    chunk = 2048 if variant == "fast2k" else None
    t0 = time.perf_counter()
    for _ in range(REPS):
        if chunk is None:
            overlay_batch(jobs, rules, FillRule.EVEN_ODD, DEFAULT_OPTIONS,
                          fast_extract=fast)
        else:
            for s in range(0, len(jobs), chunk):
                overlay_batch(jobs[s:s + chunk], rules, FillRule.EVEN_ODD,
                              DEFAULT_OPTIONS, fast_extract=fast)
    return time.perf_counter() - t0


def run(variant: str, procs: int) -> float:
    """Wall seconds for `procs` workers each doing the fixed per-worker load."""
    with mp.get_context("spawn").Pool(procs) as pool:
        t0 = time.perf_counter()
        pool.map(_worker, [(100 + i, variant) for i in range(procs)])
        return time.perf_counter() - t0


if __name__ == "__main__":
    variants = sys.argv[1:] or ["scalar", "fast", "fast2k"]
    for v in variants:
        # per-worker load is FIXED, so 16 procs do 4x the total work of 4 procs:
        # perfect scaling => equal wall time; efficiency = T4 / T16.
        t4 = run(v, 4)
        t16 = run(v, 16)
        eff = t4 / t16
        thr4 = 4 * REPS * JOBS_PER_WORKER / t4
        thr16 = 16 * REPS * JOBS_PER_WORKER / t16
        print(f"{v:8s} T4={t4:6.2f}s ({thr4/1e3:6.1f}k jobs/s)  "
              f"T16={t16:6.2f}s ({thr16/1e3:6.1f}k jobs/s)  eff={eff:.3f}")
