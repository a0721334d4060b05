"""IVF k-means refinement: determinism under partitioning and assignment sanity."""

from pyspark.sql import functions as F

from ioverlay_spark.operators.similarity import (
    ivf_assign,
    ivf_centroids,
    ivf_kmeans_refine,
    ivf_topk,
)

SF = "/root/testdata/sf0.001"


def test_kmeans_refine_deterministic_under_partitioning(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    seeds = ivf_centroids(emb, 4)
    a = ivf_kmeans_refine(emb, seeds, n_iters=2).collect()
    b = ivf_kmeans_refine(emb.repartition(13), seeds, n_iters=2).collect()
    ca = {r["centroid_id"]: r["cvec"] for r in a}
    cb = {r["centroid_id"]: r["cvec"] for r in b}
    assert ca == cb  # decimal sums make means order-independent


def test_kmeans_refinement_does_not_grow_distortion(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    seeds = ivf_centroids(emb, 4)

    def distortion(cents):
        return (
            ivf_assign(emb, cents)
            .join(
                cents.select(F.col("centroid_id").alias("list_id"), "cvec"), "list_id"
            )
            .selectExpr(
                "aggregate(zip_with(embedding, cvec, (x, c) -> "
                "(CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)), "
                "CAST(0 AS DOUBLE), (a, v) -> a + v) AS d2"
            )
            .agg(F.sum("d2"))
            .collect()[0][0]
        )

    d0 = distortion(seeds)
    d1 = distortion(ivf_kmeans_refine(emb, seeds, n_iters=1))
    d2 = distortion(ivf_kmeans_refine(emb, seeds, n_iters=2))
    assert d1 <= d0 and d2 <= d1  # Lloyd iterations never increase distortion


def test_ivf_topk_covers_all_vectors(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    refined = ivf_kmeans_refine(emb, ivf_centroids(emb, 4), n_iters=1)
    out = ivf_topk(ivf_assign(emb, refined), k=1)
    # every vector sharing a list with >= 1 other vector gets a neighbor
    n_multi = (
        ivf_assign(emb, refined)
        .groupBy("list_id")
        .count()
        .where(F.col("count") > 1)
        .join(ivf_assign(emb, refined), "list_id")
        .count()
    )
    assert out.count() == n_multi
