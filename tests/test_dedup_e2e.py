"""End-to-end dedup pipeline guards: the LSH hot-bucket star cap keeps candidate
volume linear in a huge exact-duplicate class while preserving connectivity
through the connected-components stage (VERDICT round-1 item 8)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def dup_docs(spark, tmp_path_factory):
    """1,000 identical docs + 200 distinct docs, written as a documents table."""
    path = str(tmp_path_factory.mktemp("dup") / "documents.parquet")
    dup_text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, dup_text) for i in range(1000)]
    rows += [
        (1000 + i, f"unique document number {i} with its own words w{i} x{i} y{i} z{i}")
        for i in range(200)
    ]
    spark.createDataFrame(rows, ["doc_id", "text"]).write.mode("overwrite").parquet(path)
    return path


def test_hot_bucket_star_is_linear(spark, dup_docs):
    from ioverlay_spark.queries import _minhash_sql

    pairs = spark.sql(_minhash_sql("spark", f"parquet.`{dup_docs}`")).toPandas()
    # identical docs share every band bucket; all-pairs would be 1000*999/2 ≈ 500k.
    # The star guard emits anchor->member pairs only: ≤ 999 + cross-band dups.
    dup_pairs = pairs[(pairs.doc_a < 1000) & (pairs.doc_b < 1000)]
    assert len(dup_pairs) <= 1100, f"quadratic bucket leak: {len(dup_pairs)} pairs"
    # connectivity: the star must reach every duplicate doc from the anchor
    assert set(dup_pairs.doc_a) == {0}
    assert set(dup_pairs.doc_b) == set(range(1, 1000))


def test_dup_class_collapses_to_one_cluster(spark, dup_docs):
    from ioverlay_spark.operators.distributed_extract import connected_components
    from ioverlay_spark.queries_ext import _dedup_verified_pairs_sql

    pairs = spark.sql(_dedup_verified_pairs_sql("spark", f"parquet.`{dup_docs}`"))
    edges = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    cc = connected_components(edges).toPandas()
    dup_components = cc[cc.node < 1000]["component"].unique()
    assert list(dup_components) == [0], "duplicate class must form ONE cluster"
    # distinct docs stay out of it
    uniq = cc[cc.node >= 1000]
    assert (uniq["component"] >= 1000).all()
