"""Property tests (reference dynamic-tests analog, SURVEY.md §5) and the
spark-submit --py-files packaging smoke test (north rule deployment model)."""

import math
import os
import shutil
import subprocess
import sys
import textwrap

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from ioverlay_spark.kernel import build_graph, overlay, ring_area2
from ioverlay_spark.options import FillRule, OverlayRule


def star(cx, cy, r1, r2, n, rot):
    pts = []
    for k in range(2 * n):
        r = r1 if k % 2 == 0 else r2
        a = rot + math.pi * k / n
        pts.append([int(cx + r * math.cos(a)), int(cy + r * math.sin(a))])
    return np.array(pts, dtype=np.int64)


def area2(shapes) -> int:
    return sum(ring_area2(r) for s in shapes for r in s)


star_params = st.tuples(
    st.integers(0, 1 << 16),      # cx
    st.integers(0, 1 << 16),      # cy
    st.integers(64, 4096),        # r1
    st.integers(16, 2048),        # r2
    st.integers(3, 9),            # points
    st.floats(0, math.pi, allow_nan=False),  # rotation
)


@settings(max_examples=40, deadline=None)
@given(star_params, star_params, st.integers(-600, 600), st.integers(-600, 600))
def test_boolean_area_identities_random_stars(p1, p2, dx, dy):
    """union = A + B - intersect; xor = union - intersect; diff = A - intersect;
    intersect <= min(A, B) — exact integer identities on arbitrary star overlays
    (mirrors the reference's randomized dynamic tests,
    iOverlay/tests/dynamic_tests.rs:23-100)."""
    subj = [star(*p1)]
    clip = [star(p2[0] + p1[0] + dx, p2[1] + p1[1] + dy, *p2[2:])]
    g = build_graph(subj, clip, FillRule.NON_ZERO)
    a = area2(g.extract(OverlayRule.SUBJECT))
    b = area2(g.extract(OverlayRule.CLIP))
    i = area2(g.extract(OverlayRule.INTERSECT))
    u = area2(g.extract(OverlayRule.UNION))
    x = area2(g.extract(OverlayRule.XOR))
    d = area2(g.extract(OverlayRule.DIFFERENCE))
    di = area2(g.extract(OverlayRule.INVERSE_DIFFERENCE))
    assert u == a + b - i
    assert x == u - i
    assert d == a - i
    assert di == b - i
    assert 0 <= i <= min(a, b)
    assert u >= max(a, b)


@settings(max_examples=20, deadline=None)
@given(star_params)
def test_graph_view_equals_one_shot(p):
    """A16 graph reuse == A15 one-shot per rule (reference runner assertion (a),
    iOverlay/tests/overlay_tests.rs:18-94)."""
    subj = [star(*p)]
    clip = [star(p[0] + 500, p[1] + 500, *p[2:])]
    g = build_graph(subj, clip, FillRule.EVEN_ODD)
    for rule in (OverlayRule.INTERSECT, OverlayRule.UNION, OverlayRule.XOR):
        one = overlay(subj, clip, rule, FillRule.EVEN_ODD)
        via = g.extract(rule)
        assert [[r.tolist() for r in s] for s in one] == [
            [r.tolist() for r in s] for s in via
        ]


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_spark_submit_py_files(tmp_path):
    """The north-rule deployment model: the engine runs from a --py-files zip in a
    fresh spark-submit process whose cwd does NOT contain the repo."""
    from ioverlay_spark.session import build_package_zip

    zpath = build_package_zip(str(tmp_path / "ioverlay_spark.zip"))
    script = tmp_path / "job.py"
    script.write_text(
        textwrap.dedent(
            """
            from pyspark.sql import SparkSession, functions as F
            import ioverlay_spark  # resolved from the --py-files zip
            from ioverlay_spark.operators.overlay_df import overlay_rows

            spark = (SparkSession.builder
                     .config("spark.sql.shuffle.partitions", "4")
                     .config("spark.ui.enabled", "false").getOrCreate())
            rows = spark.range(50).selectExpr(
                "id AS pair_id",
                "array(id*10, id*10+8, id*10+8, id*10) AS subj_x",
                "array(0L, 0L, 8L, 8L) AS subj_y",
                "array(id*10+4, id*10+12, id*10+12, id*10+4) AS clip_x",
                "array(4L, 4L, 12L, 12L) AS clip_y",
            )
            out = overlay_rows(rows, rules=["intersect"])
            total = out.agg(F.sum("area2")).collect()[0][0]
            assert total == 50 * 2 * 4 * 4, total
            print("SUBMIT_OK", total)
            spark.stop()
            """
        )
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    res = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[2]",
            "--py-files",
            zpath,
            str(script),
        ],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
    )
    assert "SUBMIT_OK 1600" in res.stdout, res.stdout[-2000:] + res.stderr[-2000:]
