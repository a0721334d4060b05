"""Two-level strip-rank expression (`_strip_rank_expr`): the JIT-sized strip
index used by `compute_fills_df` above ~15 strip edges.

Correctness contract (see the docstring in operators/distributed.py): strip
edges only steer load balance, but the expression MUST be monotone in the
doubled-x value so that `sequence(s_lo, s_hi)` covers every strip a segment
crosses. These tests pin (a) SQL == a Python model of the same formula,
(b) monotonicity, (c) value range [0, n_strips-1], and (d) an end-to-end
fills differential at a strip count that forces the two-level path."""

import numpy as np
import pytest

from tests.test_distributed import _kernel_split, checkerboard, rings_to_contours_rows


def _py_strip_rank(v: int, edges: list[int], lo2: int, hi2: int) -> int:
    """Driver-side model of _strip_rank_expr's two-level formula."""
    if len(edges) <= 15:
        return int(np.searchsorted(edges, v, side="right"))
    k = -(-(len(edges) + 1) // 16)
    coarse = edges[k - 1 :: k][:15]
    lows = [lo2] + coarse
    highs = coarse + [hi2]
    c = int(np.searchsorted(coarse, v, side="right"))
    span = max(1.0, float(highs[c]) - float(lows[c]))
    fine = int(np.floor((float(v) - float(lows[c])) * k / span))
    return c * k + min(k - 1, max(0, fine))


@pytest.mark.parametrize("n_edges", [7, 15, 63, 255])
def test_strip_rank_sql_matches_model_and_is_monotone(spark, n_edges):
    from ioverlay_spark.operators.distributed import _strip_rank_expr

    rng = np.random.default_rng(n_edges)
    # non-uniform edges (quantiles of a skewed sample), values straddling them
    sample = np.sort(rng.integers(-(1 << 40), 1 << 40, size=4096))
    edges = sorted(set(int(q) for q in np.quantile(
        sample, [i / (n_edges + 1) for i in range(1, n_edges + 1)], method="lower"
    )))
    lo2, hi2 = int(sample[0]) - 7, int(sample[-1]) + 7
    vals = np.unique(np.concatenate([
        sample[:: max(1, len(sample) // 512)],
        np.array(edges, dtype=np.int64),
        np.array(edges, dtype=np.int64) - 1,
        np.array(edges, dtype=np.int64) + 1,
        np.array([lo2, hi2], dtype=np.int64),
    ]))
    df = spark.createDataFrame([(int(v),) for v in vals], ["v"])
    expr = _strip_rank_expr("v", edges, lo2, hi2)
    got = (
        df.selectExpr("v", f"CAST({expr} AS INT) AS r")
        .toPandas()
        .sort_values("v")["r"]
        .to_numpy()
    )
    exp = np.array([_py_strip_rank(int(v), edges, lo2, hi2) for v in np.sort(vals)])
    assert (got == exp).all()
    # monotone: sequence(s_lo, s_hi) covers the home strip only if rank is
    # non-decreasing in the doubled-x value
    assert (np.diff(got) >= 0).all()
    assert got.min() >= 0 and got.max() <= len(edges)


@pytest.mark.parametrize("n_edges", [63, 255, 1023])
def test_strip_rank_expr_stays_jit_sized(n_edges):
    """Tripwire for the HotSpot JIT cliff (BENCH.md round 4 third pass): a
    single nested-IF tree past ~60 IF nodes exceeds the huge-method limit and
    the generated Java runs INTERPRETED (~10x per row). Every inlined coarse
    tree must stay <= 15 IFs; the whole two-level expression inlines the
    coarse tree at most 4 times."""
    from ioverlay_spark.operators.distributed import _strip_rank_expr

    expr = _strip_rank_expr("v", list(range(n_edges)), -10, n_edges + 10)
    assert expr.count("IF(") <= 15 * 4


def test_distributed_fills_two_level_strips_match_kernel(spark):
    """n_strips=64 -> 63 edges -> the two-level path; fills must still be
    exact (the strip kernel sees every segment crossing each strip)."""
    from ioverlay_spark.kernel import compute_fills
    from ioverlay_spark.options import FillRule
    from ioverlay_spark.operators.distributed import (
        compute_fills_df,
        contours_to_segments_df,
        split_segments_df,
    )

    subj, clip = checkerboard(6)
    df = spark.createDataFrame(
        rings_to_contours_rows(subj, clip), ["role", "cid", "pts_x", "pts_y"]
    )
    split = split_segments_df(contours_to_segments_df(spark, df))
    fills = compute_fills_df(split, FillRule.EVEN_ODD, n_strips=64).toPandas()

    ker = _kernel_split(subj, clip)
    kf = compute_fills(ker, FillRule.EVEN_ODD)
    exp = sorted(
        zip(ker.ax.tolist(), ker.ay.tolist(), ker.bx.tolist(), ker.by.tolist(), kf.tolist())
    )
    got = sorted(map(tuple, fills[["ax", "ay", "bx", "by", "fill"]].to_numpy().tolist()))
    assert got == exp
