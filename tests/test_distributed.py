"""Distributed huge-overlay pipeline vs the exact single-kernel result
(differential test, SURVEY.md §7 hard-part (c))."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def checkerboard(n: int, cell: int = 16):
    """The reference's headline scenario (performance/rust_app checkerboard): an
    n x n grid of SUBJECT squares XORed with an (n-1) x (n-1) grid of offset
    CLIP squares (performance/rust_app/src/test/test_0_checkerboard.rs)."""
    subj, clip = [], []
    for i in range(n):
        for j in range(n):
            x, y = i * cell * 2, j * cell * 2
            subj.append([(x, y), (x + 2 * cell, y), (x + 2 * cell, y + 2 * cell), (x, y + 2 * cell)])
    for i in range(n - 1):
        for j in range(n - 1):
            x, y = i * cell * 2 + cell, j * cell * 2 + cell
            clip.append([(x, y), (x + 2 * cell, y), (x + 2 * cell, y + 2 * cell), (x, y + 2 * cell)])
    return subj, clip


def rings_to_contours_rows(subj, clip):
    rows = [
        ("subject", i, [p[0] for p in r], [p[1] for p in r]) for i, r in enumerate(subj)
    ]
    rows += [
        ("clip", len(subj) + i, [p[0] for p in r], [p[1] for p in r])
        for i, r in enumerate(clip)
    ]
    return rows


@pytest.fixture(scope="module")
def board(spark):
    subj, clip = checkerboard(6)
    df = spark.createDataFrame(
        rings_to_contours_rows(subj, clip), ["role", "cid", "pts_x", "pts_y"]
    )
    return subj, clip, df


def kernel_reference(subj, clip, rule, fill_rule):
    from ioverlay_spark.kernel import build_graph
    from ioverlay_spark.kernel.extract import ring_area2

    g = build_graph(
        [np.array(r, dtype=np.int64) for r in subj],
        [np.array(r, dtype=np.int64) for r in clip],
        fill_rule,
    )
    shapes = g.extract(rule)
    return sorted(ring_area2(ring) for shape in shapes for ring in shape)


def _kernel_split(subj, clip):
    from ioverlay_spark.kernel import build_segments, sort_and_merge, split_segments
    from ioverlay_spark.kernel.segments import Segments

    segs = Segments.concat(
        [
            build_segments([np.array(r, dtype=np.int64) for r in subj], True),
            build_segments([np.array(r, dtype=np.int64) for r in clip], False),
        ]
    )
    return split_segments(sort_and_merge(segs))


def test_distributed_split_merge_matches_kernel(spark, board):
    subj, clip, df = board
    from ioverlay_spark.operators.distributed import contours_to_segments_df, split_segments_df

    segs_df = contours_to_segments_df(spark, df)
    out = split_segments_df(segs_df).toPandas()

    ker = _kernel_split(subj, clip)
    got = sorted(map(tuple, out[["ax", "ay", "bx", "by", "subj", "clip"]].to_numpy().tolist()))
    exp = sorted(
        zip(
            ker.ax.tolist(),
            ker.ay.tolist(),
            ker.bx.tolist(),
            ker.by.tolist(),
            ker.subj.tolist(),
            ker.clip.tolist(),
        )
    )
    assert got == exp


def test_distributed_fills_match_kernel(spark, board):
    subj, clip, df = board
    from ioverlay_spark.kernel import compute_fills
    from ioverlay_spark.options import FillRule
    from ioverlay_spark.operators.distributed import (
        compute_fills_df,
        contours_to_segments_df,
        split_segments_df,
    )

    split = split_segments_df(contours_to_segments_df(spark, df))
    fills = compute_fills_df(split, FillRule.EVEN_ODD, n_strips=7).toPandas()

    ker = _kernel_split(subj, clip)
    kf = compute_fills(ker, FillRule.EVEN_ODD)
    exp = sorted(
        zip(ker.ax.tolist(), ker.ay.tolist(), ker.bx.tolist(), ker.by.tolist(), kf.tolist())
    )
    got = sorted(map(tuple, fills[["ax", "ay", "bx", "by", "fill"]].to_numpy().tolist()))
    assert got == exp


@pytest.mark.parametrize("rule_name", ["xor", "union", "intersect", "difference"])
def test_distributed_extract_matches_kernel_areas(spark, board, rule_name):
    subj, clip, df = board
    from ioverlay_spark.options import FillRule, OverlayRule
    from ioverlay_spark.operators.distributed import contours_to_segments_df, distributed_overlay

    rule = OverlayRule(rule_name)
    out = distributed_overlay(contours_to_segments_df(spark, df), rule, FillRule.EVEN_ODD)
    pdf = out.toPandas()
    got = sorted(int(a) for a in pdf["area2"].tolist())
    exp = kernel_reference(subj, clip, rule, FillRule.EVEN_ODD)
    assert got == exp
    # hole binding sanity: every hole's shape_id is some hull's ring_id
    hull_ids = set(pdf.loc[~pdf["is_hole"], "ring_id"])
    assert set(pdf.loc[pdf["is_hole"], "shape_id"]).issubset(hull_ids)
