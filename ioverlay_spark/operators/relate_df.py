"""Pair-parallel spatial predicates over a DataFrame of geometry jobs — the
"many pairs" usage model of the reference's relate API (SURVEY.md §2.3): cell-join
candidates feed pair_id groups, each group runs split+fill once and reduces to one
boolean row per pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, LongType, StructField, StructType

from ..kernel.predicates import relate
from ..options import FillRule

RELATE_SCHEMA = StructType(
    [
        StructField("pair_id", LongType()),
        StructField("intersects", BooleanType()),
        StructField("disjoint", BooleanType()),
        StructField("interiors_intersect", BooleanType()),
        StructField("touches", BooleanType()),
        StructField("point_intersects", BooleanType()),
        StructField("within", BooleanType()),
    ]
)


def _relate_kernel_factory(fill_rule: str):
    fr = FillRule(fill_rule)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["pair_id"].to_numpy(), kind="stable")
        pid_arr = pdf["pair_id"].to_numpy()[order]
        role_arr = pdf["role"].to_numpy()[order]
        xs_arr = pdf["pts_x"].to_numpy()[order]
        ys_arr = pdf["pts_y"].to_numpy()[order]
        rows = []
        n = len(pid_arr)
        i = 0
        while i < n:
            pair_id = int(pid_arr[i])
            subj, clip = [], []
            while i < n and pid_arr[i] == pair_id:
                ring = np.stack(
                    [np.asarray(xs_arr[i], dtype=np.int64), np.asarray(ys_arr[i], dtype=np.int64)],
                    axis=1,
                )
                (subj if role_arr[i] == "subject" else clip).append(ring)
                i += 1
            rel = relate(subj, clip, fr)
            d = rel.as_dict()
            rows.append(
                (
                    pair_id,
                    d["intersects"],
                    d["disjoint"],
                    d["interiors_intersect"],
                    d["touches"],
                    d["point_intersects"],
                    d["within"],
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "pair_id",
                "intersects",
                "disjoint",
                "interiors_intersect",
                "touches",
                "point_intersects",
                "within",
            ],
        )

    return run


def relate_pairs(
    geoms: DataFrame,
    fill_rule: str | FillRule = FillRule.EVEN_ODD,
    buckets: int | None = None,
) -> DataFrame:
    """One boolean predicate row per pair_id (same geoms schema as overlay_pairs)."""
    from ..session import ship_package

    ship_package(geoms.sparkSession)
    if buckets is None:
        try:
            buckets = 8 * int(geoms.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        except Exception:
            buckets = 256
    kernel = _relate_kernel_factory(FillRule(fill_rule).value)
    n_part = max(2, buckets // 8)
    return (
        geoms.withColumn("_bucket", F.pmod(F.hash("pair_id"), F.lit(buckets)))
        .repartition(n_part, "_bucket")
        .groupBy("_bucket")
        .applyInPandas(kernel, schema=RELATE_SCHEMA)
    )
