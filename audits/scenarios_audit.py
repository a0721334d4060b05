"""End-to-end audit of the six reference perf scenarios added in round 4
(performance/rust_app/src/test/test_{1,4,5,6,7,8}_*.rs; geometry re-derived in
ioverlay_spark/scenarios.py, correctness oracles in tests/test_perf_scenarios.py).

Usage:
    python audits/scenarios_audit.py                      # all scenarios, default ladders, scalar kernel
    python audits/scenarios_audit.py not_overlap 256 512  # one scenario, chosen n
    python audits/scenarios_audit.py windows 512 --spark  # distributed path (local[16])
    ... --reps 3

Each row prints the measured wall (best of reps), the closed-form oracle verdict
where one exists, and the reference's published i32 multithreading-on s/op for
that n (the comment blocks in the test_*.rs files)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ioverlay_spark import scenarios
from ioverlay_spark.kernel import overlay, ring_area2
from ioverlay_spark.options import FillRule, OverlayRule

# reference i32 MT-on seconds per op, keyed by n (comment blocks, test_*.rs)
REF = {
    "not_overlap": {256: 0.036901, 512: 0.177118, 1024: 0.745187, 2048: 3.282416},
    "windows": {128: 0.010892, 256: 0.049875, 512: 0.224817, 1024: 1.007965},
    "nested_squares": {16384: 0.322707, 32768: 0.653741, 65536: 2.410910},
    "corrosion": {64: 0.033293, 128: 0.133794, 256: 0.594231, 512: 2.297538},
    "concentric": {64: 0.034357, 128: 0.134210, 256: 0.563524, 512: 2.367582},
    "wind_mill": {64: 0.015072, 128: 0.061520, 256: 0.280049, 512: 1.243484},
}

DEFAULT_NS = {
    "not_overlap": [256, 512, 1024],
    "windows": [128, 256, 512, 1024],
    "nested_squares": [16384, 32768],
    "corrosion": [64, 128, 256],
    "concentric": [64, 128, 256],
    "wind_mill": [64, 128, 256],
}

RULES = {
    "not_overlap": OverlayRule.UNION,
    "windows": OverlayRule.DIFFERENCE,
    "nested_squares": OverlayRule.XOR,
    "corrosion": OverlayRule.DIFFERENCE,
    "concentric": OverlayRule.INTERSECT,
    "wind_mill": OverlayRule.INTERSECT,
}

FLOAT_SCENARIOS = {"corrosion", "concentric"}


def oracle(name: str, n: int, count: int, area2: int, base_cell_area2: int | None,
           rings: int | None = None):
    if name == "not_overlap":
        exp = n * n + (n - 1) * (n - 1)
        return count == exp and area2 == 200 * exp
    if name == "windows":
        # n^2 frame shapes, each hull + one hole ring
        return count == n * n and (rings is None or rings == 2 * n * n) and area2 == 600 * n * n
    if name == "nested_squares":
        return count == 4 * n and area2 == 64 * n * n
    if name == "wind_mill":
        return count == 4 * n * n and (
            base_cell_area2 is None or area2 == n * n * base_cell_area2
        )
    return None  # corrosion/concentric: no closed form; identities live in tests


def build_int_inputs(name: str, n: int):
    subj, clip = getattr(scenarios, name)(n)
    if name in FLOAT_SCENARIOS:
        from ioverlay_spark.functions.float_shell import NumpyFloatAdapter

        adapter = NumpyFloatAdapter.fit(np.concatenate(subj + clip))
        subj = [adapter.quantize(r) for r in subj]
        clip = [adapter.quantize(r) for r in clip]
    return subj, clip


def run_scalar(name: str, ns: list[int], reps: int):
    base_cell = None
    if name == "wind_mill":
        s1 = overlay(*scenarios.wind_mill(1), RULES[name], FillRule.NON_ZERO)
        base_cell = sum(ring_area2(r) for sh in s1 for r in sh)
    for n in ns:
        subj, clip = build_int_inputs(name, n)
        npolys = len(subj) + len(clip)
        best, count, area2 = float("inf"), 0, 0
        for _ in range(reps):
            t0 = time.perf_counter()
            shapes = overlay(subj, clip, RULES[name], FillRule.NON_ZERO)
            best = min(best, time.perf_counter() - t0)
            count = sum(1 for _ in shapes)
            rings = sum(len(s) for s in shapes)
            area2 = sum(ring_area2(r) for s in shapes for r in s)
        ok = oracle(name, n, count, area2, base_cell, rings)
        ref = REF[name].get(n)
        print(
            f"SCALAR {name} n={n} polys={npolys} wall={best:.3f}s shapes={count} "
            f"rings={rings} area2={area2} oracle={'n/a' if ok is None else ok} "
            f"ref_i32_mt={ref if ref is not None else 'n/a'}"
            + (f" ratio={best/ref:.1f}x" if ref else "")
        )


def run_spark(name: str, ns: list[int], reps: int, monolithic: bool = False):
    from pyspark.sql import SparkSession

    from ioverlay_spark.operators.cluster_overlay import cluster_overlay
    from ioverlay_spark.operators.distributed import (
        contours_to_segments_df,
        distributed_overlay,
    )

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _noop(it):
        import ioverlay_spark.operators.distributed_extract  # noqa: F401

        for pdf in it:
            yield pdf

    spark.range(64).repartition(16).mapInPandas(_noop, "id long").count()

    base_cell = None
    if name == "wind_mill":
        s1 = overlay(*scenarios.wind_mill(1), RULES[name], FillRule.NON_ZERO)
        base_cell = sum(ring_area2(r) for sh in s1 for r in sh)

    import pyarrow as pa

    for n in ns:
        subj, clip = build_int_inputs(name, n)
        npolys = len(subj) + len(clip)
        rings = subj + clip
        counts = np.fromiter((len(r) for r in rings), dtype=np.int64, count=npolys)
        offs = np.zeros(npolys + 1, dtype=np.int32)
        np.cumsum(counts, out=offs[1:])
        P = np.concatenate(rings)
        tbl = pa.table(
            {
                "role": pa.array(["subject"] * len(subj) + ["clip"] * len(clip)),
                "cid": pa.array(np.arange(npolys, dtype=np.int64)),
                "pts_x": pa.ListArray.from_arrays(pa.array(offs), pa.array(P[:, 0].copy())),
                "pts_y": pa.ListArray.from_arrays(pa.array(offs), pa.array(P[:, 1].copy())),
            }
        )
        df = spark.createDataFrame(tbl).localCheckpoint(eager=True)
        best, count, area2 = float("inf"), 0, 0
        for _ in range(reps):
            t0 = time.perf_counter()
            if monolithic:
                out = distributed_overlay(
                    contours_to_segments_df(spark, df),
                    RULES[name],
                    FillRule.NON_ZERO,
                    force_distributed=True,
                )
                shapes_expr = "count(distinct shape_id) AS shapes"
            else:
                out = cluster_overlay(df, RULES[name], FillRule.NON_ZERO)
                shapes_expr = "count(distinct cluster_id, shape_id) AS shapes"
            agg = out.selectExpr(
                "count(*) AS rings", "sum(area2) AS area2", shapes_expr
            ).first()
            best = min(best, time.perf_counter() - t0)
            count, area2 = agg["shapes"], int(agg["area2"])
            rings = agg["rings"]
        ok = oracle(name, n, count, area2, base_cell, rings)
        ref = REF[name].get(n)
        print(
            f"SPARK {name} n={n} polys={npolys} wall={best:.3f}s shapes={count} "
            f"rings={rings} area2={area2} oracle={'n/a' if ok is None else ok} "
            f"ref_i32_mt={ref if ref is not None else 'n/a'}"
            + (f" ratio={best/ref:.1f}x" if ref else "")
        )
    spark.stop()


def main():
    args = [a for a in sys.argv[1:]]
    use_spark = "--spark" in args
    monolithic = "--monolithic" in args
    reps = 2
    if "--reps" in args:
        reps = int(args[args.index("--reps") + 1])
        del args[args.index("--reps") : args.index("--reps") + 2]
    args = [a for a in args if not a.startswith("--")]
    names = [a for a in args if not a.isdigit()] or list(RULES)
    ns = [int(a) for a in args if a.isdigit()]
    for name in names:
        if use_spark:
            run_spark(name, ns or DEFAULT_NS[name], reps, monolithic=monolithic)
        else:
            run_scalar(name, ns or DEFAULT_NS[name], reps)


if __name__ == "__main__":
    main()
