"""Embedding similarity operators: brute-force cosine kNN/near-dup and IVF ANN.

These are the training-data-pipeline companions to the geometry engine: the same
broadcast/shuffle discipline applied to an `embedding: array<float>` column.

Scale design:
- dot products stay JVM-side (`aggregate`/`zip_with` Column expressions — whole-stage
  codegen, no Python);
- the IVF coarse quantizer is a tiny centroid table joined via **broadcast** (no
  shuffle to assign 10^12 vectors); the inverted-list self-join shuffles only on
  `list_id`, i.e. candidate sets shrink from O(N^2) to O(N^2 / n_lists) and each
  list is an independent partition — skew shows up as oversized lists and is
  handled by raising `n_lists` (same histogram-driven refinement as the geometry
  grid salting in operators/distributed.py).
- floating-point determinism: every distance is computed from sequential-fold dot
  products (`aggregate(zip_with(...))`), matching DuckDB's `list_dot_product`
  element order, so Spark and the oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# sequential-fold dot product over two array<float> columns, as DOUBLE
def _dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def with_norm2(emb: DataFrame, vec_col: str = "embedding", out: str = "nrm2") -> DataFrame:
    """Self dot product (squared L2 norm) as a column."""
    return emb.withColumn(out, F.expr(_dot(vec_col, vec_col)))


def cosine_pairs(emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """All ordered pairs (a < b) with exact cosine similarity — the O(N^2) baseline.

    Columns: vec_a, vec_b, cos."""
    e = with_norm2(emb.select(id_col, vec_col), vec_col)
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            (
                F.expr(_dot(f"a.{vec_col}", f"b.{vec_col}"))
                / F.sqrt(F.col("a.nrm2") * F.col("b.nrm2"))
            ).alias("cos"),
        )
    )


def neardup_pairs(
    emb: DataFrame, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: cos > threshold (exact, brute force).

    The scale path for 10^12 vectors is LSH bucketing (queries.embed_ann_lsh) or the
    IVF lists below; this operator is the oracle-checkable exact baseline."""
    return cosine_pairs(emb, id_col, vec_col).where(F.col("cos") > threshold).select(
        "vec_a", "vec_b"
    )


def ivf_centroids(emb: DataFrame, n_lists: int, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic coarse quantizer: the first `n_lists` vectors by id.

    (A k-means refinement would iterate assign+mean on the same broadcast pattern;
    seeding by id keeps the operator reproducible for the correctness gate.)"""
    return emb.where(F.col(id_col) < n_lists).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec")
    )


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (L2), via broadcast join — no
    shuffle of the big side. dist2 = <a,a> - 2<a,c> + <c,c> (sequential folds).

    Columns: vec_id, embedding, nrm2, list_id."""
    e = with_norm2(emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")))
    c = with_norm2(centroids, "cvec", "cnrm2")
    d = e.join(F.broadcast(c)).select(
        "vec_id",
        "embedding",
        "nrm2",
        "centroid_id",
        (
            F.col("nrm2")
            - 2.0 * F.expr(_dot("embedding", "cvec"))
            + F.col("cnrm2")
        ).alias("dist2"),
    )
    w = Window.partitionBy("vec_id").orderBy("dist2", "centroid_id")
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("vec_id", "embedding", "nrm2", F.col("centroid_id").alias("list_id"))
    )


def ivf_topk(assigned: DataFrame, k: int = 1) -> DataFrame:
    """Within-list cosine top-k neighbors (nprobe=1 IVF search: each vector queries
    its own inverted list). Shuffles on list_id only.

    Columns: vec_id, list_id, neighbor_id, rnk."""
    a, b = assigned.alias("l"), assigned.alias("r")
    pairs = (
        a.join(b, "list_id")
        .where(F.expr("l.vec_id != r.vec_id"))
        .select(
            F.col("l.vec_id").alias("vec_id"),
            F.col("list_id"),
            F.col("r.vec_id").alias("neighbor_id"),
            (
                F.expr(_dot("l.embedding", "r.embedding"))
                / F.sqrt(F.col("l.nrm2") * F.col("r.nrm2"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("vec_id", "list_id", "neighbor_id", F.col("rnk").cast("long").alias("rnk"))
    )


def ivf_kmeans_refine(
    emb: DataFrame,
    centroids: DataFrame,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd refinement of the coarse quantizer: assign (broadcast) -> per-list
    element-wise mean -> new centroids. Means are computed over FIXED-POINT
    integer sums (round(x * 2^20) as BIGINT), which are exact and associative —
    the result is bit-deterministic regardless of partitioning/summation order
    (unlike double sums), and replayable by any engine with the same integer
    rounding (the DuckDB oracle replays these iterations in SQL).

    Returns the refined centroids DataFrame (centroid_id, cvec). The lists stay
    tiny (n_lists x dim doubles), so each iteration collects them to the driver
    and rebroadcasts — the assign job over the big side stays shuffle-free."""
    spark = emb.sparkSession
    for _ in range(n_iters):
        assigned = ivf_assign(emb, centroids, id_col, vec_col)
        means = (
            assigned.select("list_id", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("list_id", "pos")
            .agg(
                (
                    F.sum(
                        F.expr("CAST(round(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)")
                    ).cast("double")
                    / (F.count("*").cast("double") * F.lit(1048576.0))
                ).alias("m")
            )
            .collect()
        )
        by_list: dict[int, dict[int, float]] = {}
        for r in means:
            by_list.setdefault(int(r["list_id"]), {})[int(r["pos"])] = float(r["m"])
        rows = [
            (lid, [vals[p] for p in sorted(vals)]) for lid, vals in sorted(by_list.items())
        ]
        centroids = spark.createDataFrame(rows, ["centroid_id", "cvec"])
    return centroids
