"""Differential tests: overlay_batch_flat_out (FLAT job/shape/contour/lens/pts/
area2 arrays) vs overlay_batch_flat(with_areas=True) — ring sets, ordering, and
areas must be BIT-IDENTICAL (the flat tail is an emission strategy, not an
approximation), across random stars, holes, degenerates, multi-hull slots that
force the per-slot fallback, unsorted ring_job layouts, and both extract paths.
Also covers overlay()'s >=256-ring clustered flat route vs the monolithic
graph, order-canonically (output shape order is not contract, kernel/overlay.py
docstring)."""

import math
import random

import numpy as np
import pytest

from ioverlay_spark.kernel.batch import (
    overlay_batch_flat,
    overlay_batch_flat_out,
)
from ioverlay_spark.kernel.overlay import CLUSTER_MIN_RINGS, build_graph, overlay
from ioverlay_spark.options import ALL_RULES, FillRule, OverlayRule

RULES = list(ALL_RULES)


def rect(x, y, w, h):
    return np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h]], dtype=np.int64)


def star(cx, cy, r1, r2, n, rot=0.0):
    pts = []
    for k in range(2 * n):
        r = r1 if k % 2 == 0 else r2
        a = rot + math.pi * k / n
        pts.append([int(cx + r * math.cos(a)), int(cy + r * math.sin(a))])
    return np.array(pts, dtype=np.int64)


def flatten_jobs(jobs, shuffle_seed=None):
    """(subj, clip) jobs -> (P, counts, ring_job, ring_subj, nj); optionally
    shuffle ring order so ring_job is NOT sorted (the docstring contract)."""
    rings, job_ids, subj_flags = [], [], []
    for j, (subj, clip) in enumerate(jobs):
        for r in subj:
            rings.append(np.asarray(r, dtype=np.int64).reshape(-1, 2))
            job_ids.append(j)
            subj_flags.append(True)
        for r in clip:
            rings.append(np.asarray(r, dtype=np.int64).reshape(-1, 2))
            job_ids.append(j)
            subj_flags.append(False)
    order = list(range(len(rings)))
    if shuffle_seed is not None:
        random.Random(shuffle_seed).shuffle(order)
    rings = [rings[i] for i in order]
    job_ids = [job_ids[i] for i in order]
    subj_flags = [subj_flags[i] for i in order]
    counts = np.array([len(r) for r in rings], dtype=np.int64)
    P = (
        np.concatenate(rings)
        if rings
        else np.empty((0, 2), dtype=np.int64)
    )
    return (
        P,
        counts,
        np.array(job_ids, dtype=np.int64),
        np.array(subj_flags, dtype=bool),
        len(jobs),
    )


def flat_to_jobs(flat, nj):
    """flat tuple -> per-job [(ring_pts_list, ring_area_list), ...] preserving
    emission order, for exact comparison against the Shapes API."""
    job, sid, cidx, lens, pts, a2 = flat
    per_job = [[] for _ in range(nj)]
    splits = np.split(pts, np.cumsum(lens[:-1])) if len(lens) else []
    for j, s, c, ring, a in zip(
        job.tolist(), sid.tolist(), cidx.tolist(), splits, a2.tolist()
    ):
        per_job[j].append((s, c, ring.tolist(), a))
    return per_job


def shapes_to_rows(res_with_areas):
    """overlay_batch_flat(with_areas=True) per-job result for one rule ->
    [(shape_id, contour_idx, ring_pts, area2), ...] in emission order."""
    shapes, areas = res_with_areas
    rows = []
    for s, (shape, s_areas) in enumerate(zip(shapes, areas)):
        for c, (ring, a) in enumerate(zip(shape, s_areas)):
            rows.append((s, c, np.asarray(ring).tolist(), int(a)))
    return rows


def assert_flat_matches(jobs, fill_rule, shuffle_seed=None, fast_extract=None):
    P, counts, ring_job, ring_subj, nj = flatten_jobs(jobs, shuffle_seed)
    flat = overlay_batch_flat_out(
        P, counts, ring_job, ring_subj, nj, RULES, fill_rule,
        fast_extract=fast_extract,
    )
    ref = overlay_batch_flat(
        P, counts, ring_job, ring_subj, nj, RULES, fill_rule,
        fast_extract=fast_extract, with_areas=True,
    )
    for rule in RULES:
        got_per_job = flat_to_jobs(flat[rule], nj)
        for j in range(nj):
            want = shapes_to_rows(ref[j][rule])
            assert got_per_job[j] == want, f"job {j} rule {rule.value}"


@pytest.mark.parametrize("fill_rule", [FillRule.EVEN_ODD, FillRule.NON_ZERO])
def test_flat_out_random_stars(fill_rule):
    rnd = random.Random(37)
    jobs = []
    for _ in range(90):
        cx, cy = rnd.randrange(0, 100000), rnd.randrange(0, 100000)
        subj = [star(cx, cy, rnd.randrange(50, 4000), rnd.randrange(10, 2000),
                     rnd.randrange(3, 9), rnd.random())]
        clip = [star(cx + rnd.randrange(-500, 500), cy + rnd.randrange(-500, 500),
                     rnd.randrange(50, 4000), rnd.randrange(10, 2000),
                     rnd.randrange(3, 9), rnd.random())]
        jobs.append((subj, clip))
    assert_flat_matches(jobs, fill_rule, shuffle_seed=5)


def test_flat_out_holes_multihull_degenerate():
    """Multi-hull-with-holes slots force _finalize_fast_flat's fb_slots path;
    degenerates force the slow walk; both must merge back in exact order."""
    rnd = random.Random(41)
    jobs = []
    for _ in range(25):
        x, y = rnd.randrange(0, 100000), rnd.randrange(0, 100000)
        outer = rect(x, y, 2000, 2000)
        hole = rect(x + 500, y + 500, 800, 800)[::-1].copy()
        jobs.append(([outer, hole], [rect(x + 300, y + 300, 1500, 1500)]))
    for _ in range(25):
        # two disjoint donuts in ONE job -> >=2 hulls each with a hole:
        # exercises the hulls_kept>1 fallback inside the fast tail
        x, y = rnd.randrange(0, 100000), rnd.randrange(0, 100000)
        subj = [
            rect(x, y, 1000, 1000), rect(x + 200, y + 200, 600, 600)[::-1].copy(),
            rect(x + 5000, y, 1000, 1000),
            rect(x + 5200, y + 200, 600, 600)[::-1].copy(),
        ]
        jobs.append((subj, [rect(x - 100, y - 100, 7000, 1200)]))
    jobs += [
        ([], [rect(0, 0, 10, 10)]),
        ([rect(0, 0, 10, 10)], []),
        ([np.array([[0, 0], [5, 0], [10, 0]], dtype=np.int64)], [rect(0, 0, 4, 4)]),
        ([], []),
        ([rect(0, 0, 100, 100)], [rect(0, 0, 100, 100)]),
    ]
    rnd.shuffle(jobs)
    assert_flat_matches(jobs, FillRule.EVEN_ODD, shuffle_seed=7)
    assert_flat_matches(jobs, FillRule.NON_ZERO, shuffle_seed=8)


def test_flat_out_slow_walk_path():
    """fast_extract=False routes every slot through the scalar walk +
    _shapes_to_flat + _merge_flat; output must still match exactly."""
    rnd = random.Random(43)
    jobs = []
    for _ in range(20):
        cx, cy = rnd.randrange(0, 50000), rnd.randrange(0, 50000)
        jobs.append((
            [star(cx, cy, 900, 300, 5, rnd.random())],
            [star(cx + 100, cy - 50, 800, 250, 6, rnd.random())],
        ))
    assert_flat_matches(jobs, FillRule.EVEN_ODD, shuffle_seed=3, fast_extract=False)


def _canon(shapes):
    return sorted(
        sorted(tuple(map(tuple, np.asarray(r).tolist())) for r in shape)
        for shape in shapes
    )


@pytest.mark.parametrize("rule", [OverlayRule.UNION, OverlayRule.XOR,
                                  OverlayRule.DIFFERENCE])
def test_overlay_cluster_flat_route_matches_monolithic(rule):
    """overlay() >= CLUSTER_MIN_RINGS takes the flat clustered route; the ring
    set must equal the monolithic graph's, order-canonically."""
    n = CLUSTER_MIN_RINGS // 2 + 8
    subj = [rect(i * 3000, (i % 7) * 3000, 1200, 1200) for i in range(n)]
    clip = [rect(i * 3000 + 600, (i % 7) * 3000 + 600, 1200, 1200) for i in range(n)]
    got = overlay(subj, clip, rule)
    want = build_graph(subj, clip).extract(rule)
    assert _canon(got) == _canon(want)


def test_overlay_cluster_flat_route_touching_clusters():
    """Touching bboxes (shared edges across the would-be cluster boundary) must
    still merge into correct output through the clustered route."""
    n = CLUSTER_MIN_RINGS
    subj = [rect(i * 1000, 0, 1000, 1000) for i in range(n)]  # seamless strip
    clip = [rect(i * 1000 + 500, 500, 1000, 1000) for i in range(0, n, 2)]
    got = overlay(subj, clip, OverlayRule.UNION)
    want = build_graph(subj, clip).extract(OverlayRule.UNION)
    assert _canon(got) == _canon(want)
