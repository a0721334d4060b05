"""Ports of the reference dynamic (rotating-star robustness sweeps,
iOverlay/tests/dynamic_tests.rs — reduced step counts, same geometry), board
(iOverlay/tests/board_tests.rs — XOR shape counts on touching-square grids) and
vector (iOverlay/tests/vector_tests.rs — S8 directed-edge SideFill output)
suites.

The dynamic sweeps are crash/validity tests in the reference (graph.validate()
+ non-empty result); here each overlay additionally cross-checks the batched
kernel against the scalar kernel on a sample of angles."""

from __future__ import annotations

import math

import numpy as np
import pytest

from ioverlay_spark.kernel.extract import build_shape_vectors, ring_area2
from ioverlay_spark.kernel.overlay import overlay, simplify
from ioverlay_spark.options import FillRule, OverlayRule

NZ = FillRule.NON_ZERO
SCALE = 1024.0  # scale_for::<i64> caps at 1024 for these magnitudes


def create_star(r0, r1, count, angle, scale=SCALE):
    """dynamic_tests.rs create_star: alternating radii, PI/count steps."""
    da = math.pi / count
    a = angle
    pts = []
    for _ in range(count):
        pts.append((round(r0 * scale * math.cos(a)), round(r0 * scale * math.sin(a))))
        a += da
        pts.append((round(r1 * scale * math.cos(a)), round(r1 * scale * math.sin(a))))
        a += da
    return np.array(pts, dtype=np.int64)


def random_polygon(radius, angle, n, scale=SCALE):
    """dynamic_tests.rs random_polygon: deterministic PI*0.7 angular steps."""
    da = math.pi * 0.7
    a = angle
    r = scale * radius
    pts = []
    for _ in range(n):
        pts.append((round(r * math.cos(a)), round(r * math.sin(a))))
        a += da
    return np.array(pts, dtype=np.int64)


def _check(shapes, expect_nonempty=True):
    if expect_nonempty:
        assert shapes
    for shape in shapes:
        for ring in shape:
            assert len(ring) >= 3
            assert ring_area2([tuple(p) for p in ring]) != 0


def frange(lo, hi, step):
    v = lo
    while v < hi:
        yield v
        v += step


def _sweep(jobs, rule, check=True, cross_every=97):
    """Run a dense sweep at FULL reference density through the batched kernel
    (65 us/job vs ~1.5 ms scalar — what makes dynamic_tests.rs's 10k-40k-case
    grids affordable in python), with a scalar cross-check every `cross_every`
    jobs (overlay_batch is independently differential-tested; the sample keeps
    both engines honest inside the sweep itself)."""
    from ioverlay_spark.kernel.batch import overlay_batch

    for lo in range(0, len(jobs), 512):
        chunk = jobs[lo : lo + 512]
        results = overlay_batch(chunk, [rule], NZ)
        for k, (job, res) in enumerate(zip(chunk, results)):
            shapes = res[rule]
            if check:
                _check(shapes)
            if (lo + k) % cross_every == 0:
                want = overlay(job[0], job[1], rule, NZ)
                assert [np.asarray(r).tolist() for s in shapes for r in s] == [
                    np.asarray(r).tolist() for s in want for r in s
                ]


def test_0_rotating_7_star_union():
    # full reference grid: r 0.9..1.2 step 0.02, a 0..2pi step 0.01
    # (dynamic_tests.rs:30-53) — ~9.4k overlays
    clip = [create_star(1.0, 2.0, 7, 0.0)]
    jobs = [
        ([create_star(1.0, r, 7, a)], clip)
        for r in frange(0.9, 1.2, 0.02)
        for a in frange(0.0, 2 * math.pi, 0.01)
    ]
    _sweep(jobs, OverlayRule.UNION)


@pytest.mark.parametrize(
    "r0,r1,count,rule,hi",
    [
        (200.0, 30.0, 7, OverlayRule.XOR, 4 * math.pi),   # test_1
        (202.5, 33.75, 24, OverlayRule.XOR, 2 * math.pi),  # test_2
        (100.0, 10.0, 17, OverlayRule.XOR, 4 * math.pi),   # test_3
    ],
)
def test_1_2_3_rotating_star_xor(r0, r1, count, rule, hi):
    # full reference density: angle step 0.01 (dynamic_tests.rs:62-131); scale
    # 4.0 keeps the stars in a ~±1000 coordinate window (the reference's
    # scale_for::<i16> regime, the hardest snap-rounding case of the three)
    clip = [create_star(r0, r1, count, 0.0, 4.0)]
    jobs = [
        ([create_star(r0, r1, count, a, 4.0)], clip)
        for a in frange(0.0, hi, 0.01)
    ]
    # XOR of identical-parameter stars may legitimately be empty at a=0-ish
    _sweep(jobs, rule, check=False)
    _sweep(jobs, OverlayRule.UNION)


@pytest.mark.parametrize(
    "r0,r1,count,step",
    [
        (202.5, 33.75, 24, 1e-8),  # test_4 (full reference step)
        (100.0, 50.0, 24, 1e-7),   # test_6
    ],
)
def test_4_6_epsilon_rotations(r0, r1, count, step):
    clip = [create_star(r0, r1, count, 0.0, 4.0)]
    jobs = []
    a = -1e-6
    while a < 1e-6:
        jobs.append(([create_star(r0, r1, count, a, 4.0)], clip))
        a += step
    _sweep(jobs, OverlayRule.XOR, check=False)


def test_5_single_epsilon_rotation():
    clip = [create_star(202.5, 33.75, 24, 0.0, 4.0)]
    subj = [create_star(202.5, 33.75, 24, -1e-6, 4.0)]
    overlay(subj, clip, OverlayRule.XOR, NZ)


def test_7_large_self_intersecting_polygon():
    subj = [random_polygon(1_000_000.0, 0.0, 1010, 1.0)]
    _check(simplify(subj, NZ))


def test_8_tiny_radius_polygons():
    # full reference grid: r step 0.001 (dynamic_tests.rs test_8), n in 5..10
    jobs = [
        ([random_polygon(r, 0.0, n)], [])
        for r in frange(0.004, 1.0, 0.001)
        for n in range(5, 10)
    ]
    _sweep(jobs, OverlayRule.SUBJECT, check=False)  # tiny radii may be empty


def test_9_tiny_scale_4_star_union():
    # full reference grid: r step 0.01*s, a step 0.005 (dynamic_tests.rs test_9)
    s = 0.02
    sc = SCALE / (2 * s) / 4
    clip = [create_star(s, 2 * s, 4, 0.0, sc)]
    jobs = [
        ([create_star(s, r, 4, a, sc)], clip)
        for r in frange(0.9 * s, 1.2 * s, 0.01 * s)
        for a in frange(0.0, 2 * math.pi, 0.005)
    ]
    _sweep(jobs, OverlayRule.UNION)


def test_10_pinned_angle_case():
    clip = [create_star(1.0, 2.0, 7, 0.0)]
    subj = [create_star(1.0, 1.01, 7, 0.4400000000000003)]
    _check(overlay(subj, clip, OverlayRule.UNION, NZ))


def test_11_random_hexagon_pairs():
    # full reference count: 2000 random pairs (dynamic_tests.rs test_11);
    # seeded stand-in for the reference's rng: jitter the deterministic
    # star-polygon by random radii
    rng = np.random.default_rng(11)
    jobs = []
    for _ in range(2000):
        r1, r2 = rng.uniform(20, 100, size=2)
        a1, a2 = rng.uniform(0, 2 * math.pi, size=2)
        jobs.append(
            ([random_polygon(r1, a1, 6, 8.0)], [random_polygon(r2, a2 + 0.5 * math.pi, 6, 8.0)])
        )
    _sweep(jobs, OverlayRule.UNION)


def test_12_random_tiny_5gons():
    # full reference count: 10000 (dynamic_tests.rs test_12)
    rng = np.random.default_rng(12)
    jobs = [
        ([np.asarray(rng.integers(-5, 6, size=(5, 2)), dtype=np.int64)], [])
        for _ in range(10000)
    ]
    _sweep(jobs, OverlayRule.SUBJECT, check=False)


def test_13_random_float_5gons():
    # full reference count: 10000 radius steps (dynamic_tests.rs test_13)
    from ioverlay_spark.functions.float_shell import NumpyFloatAdapter

    rng = np.random.default_rng(13)
    jobs = []
    for i in range(1, 10000):
        r = float(i)
        pts = rng.uniform(-0.5 * r, 0.5 * r, size=(5, 2))
        a = NumpyFloatAdapter.fit([pts])
        jobs.append(([a.quantize(pts)], []))
    _sweep(jobs, OverlayRule.SUBJECT, check=False)


def test_14_random_triangle_fans():
    # reference count: 100_000 (dynamic_tests.rs test_14); batched, full count
    rng = np.random.default_rng(14)
    jobs = []
    for _ in range(100_000):
        tris = []
        for _ in range(3):
            ax, ay = int(rng.integers(0, 9)), int(rng.integers(-8, 9))
            bx, by = int(rng.integers(0, 9)), int(rng.integers(-8, 9))
            tris.append(np.array([(0, 0), (ax, ay), (bx, by)], dtype=np.int64))
        jobs.append((tris, []))
    _sweep(jobs, OverlayRule.SUBJECT, check=False)


# --- board_tests.rs: XOR shape counts on touching-square grids ----------------


def many_squares(sx, sy, size, offset, n):
    out = []
    y = sy
    for _ in range(n):
        x = sx
        for _ in range(n):
            out.append(np.array(
                [(x, y), (x, y + size), (x + size, y + size), (x + size, y)],
                dtype=np.int64))
            x += offset
        y += offset
    return out


@pytest.mark.parametrize("n", list(range(1, 20)))
def test_board_xor_counts(n):
    subj = many_squares(0, 0, 20, 30, n)
    clip = many_squares(15, 15, 20, 30, n - 1)
    r = overlay(subj, clip, OverlayRule.XOR, NZ)
    assert len(r) == n * n + (n - 1) * (n - 1)


# --- vector_tests.rs: S8 directed-edge SideFill output ------------------------


def _rot(seq):
    """cyclic normalization: rotate to the lexicographically-least element."""
    k = min(range(len(seq)), key=lambda i: seq[i])
    return tuple(seq[k:] + seq[:k])


def test_vector_0_subject_square():
    subj = [np.array([(-10240, -10240), (-10240, 10240), (10240, 10240),
                      (10240, -10240)], dtype=np.int64)]
    clip = [np.array([(-5120, -5120), (-5120, 5120), (5120, 5120),
                      (5120, -5120)], dtype=np.int64)]
    shapes = build_shape_vectors(subj, clip, NZ, OverlayRule.SUBJECT)
    assert len(shapes) == 1 and len(shapes[0]) == 1
    want = [
        (-10240, 10240, -10240, -10240, 1),
        (-10240, -10240, 10240, -10240, 1),
        (10240, -10240, 10240, 10240, 1),
        (10240, 10240, -10240, 10240, 1),
    ]
    assert _rot(shapes[0][0]) == _rot(want)


def test_vector_1_difference_side_fills():
    subj = [np.array([(-10240, -10240), (-10240, 10240), (10240, 10240),
                      (10240, -10240)], dtype=np.int64)]
    clip = [np.array([(-5120, -5120), (-5120, 15360), (15360, 15360),
                      (15360, -5120)], dtype=np.int64)]
    shapes = build_shape_vectors(subj, clip, NZ, OverlayRule.DIFFERENCE)
    assert len(shapes) == 1 and len(shapes[0]) == 1
    want = [
        (-10240, 10240, -10240, -10240, 1),
        (-10240, -10240, 10240, -10240, 1),
        (10240, -10240, 10240, -5120, 1),
        (10240, -5120, -5120, -5120, 11),
        (-5120, -5120, -5120, 10240, 11),
        (-5120, 10240, -10240, 10240, 1),
    ]
    assert _rot(shapes[0][0]) == _rot(want)