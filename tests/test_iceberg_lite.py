"""Iceberg-style table layout: snapshot manifests, partition + stats pruning with
metrics, append snapshots, time travel, and Catalyst pushdown on the pruned scan."""

import pytest

from pyspark.sql import functions as F

from ioverlay_spark.sources.iceberg_lite import read_table, write_table
from ioverlay_spark.sources.pages import pages_from_documents

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages_table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("iceberg") / "pages")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pages = pages_from_documents(docs).withColumn(
        "warc_day", F.date_format("warc_ts", "yyyy-MM-dd")
    )
    manifest = write_table(pages, root, partition_by=["warc_day"])
    return root, manifest, pages


def test_roundtrip_and_manifest(spark, pages_table):
    root, manifest, pages = pages_table
    assert manifest["snapshot_id"] == 1
    assert manifest["total_rows"] == pages.count()
    assert all(f["partition"].get("warc_day") for f in manifest["files"])
    df, report = read_table(spark, root)
    assert report.files_pruned == 0
    assert df.count() == pages.count()
    assert set(df.columns) == set(pages.columns)


def test_partition_pruning_metrics(spark, pages_table):
    root, manifest, pages = pages_table
    day = manifest["files"][0]["partition"]["warc_day"]
    df, report = read_table(spark, root, filters=[("warc_day", "=", day)])
    assert report.files_selected < report.files_total
    assert report.files_pruned >= 1
    # exactness: pruned scan + predicate == full scan + predicate
    expect = pages.where(F.col("warc_day") == day).count()
    assert df.where(F.col("warc_day") == day).count() == expect
    assert report.rows_selected_upper_bound >= expect


def test_stats_pruning_on_nonpartition_column(spark, pages_table):
    root, _manifest, pages = pages_table
    # url stats min/max per file: an impossible range prunes everything
    df, report = read_table(spark, root, filters=[("url", "<", "https://site")])
    assert report.files_selected == 0
    assert df.count() == 0


def test_append_snapshot_and_time_travel(spark, pages_table):
    root, manifest, pages = pages_table
    v1_rows = manifest["total_rows"]
    extra = pages.limit(7)
    m2 = write_table(extra, root, partition_by=["warc_day"], mode="append")
    assert m2["snapshot_id"] == manifest["snapshot_id"] + 1
    assert m2["total_rows"] == v1_rows + 7
    # latest sees all rows; snapshot 1 still reads the original set
    df2, _ = read_table(spark, root)
    assert df2.count() == v1_rows + 7
    df1, rep1 = read_table(spark, root, snapshot_id=manifest["snapshot_id"])
    assert rep1.snapshot_id == manifest["snapshot_id"]
    assert df1.count() == v1_rows


def test_catalyst_pushdown_on_pruned_scan(spark, pages_table):
    root, manifest, _pages = pages_table
    day = manifest["files"][0]["partition"]["warc_day"]
    df, _ = read_table(spark, root, filters=[("warc_day", "=", day)])
    plan = df.where(F.col("lang") == "en").select("url")._jdf.queryExecution().executedPlan().toString()
    # predicate reaches the parquet scan; projection prunes columns
    assert "PushedFilters" in plan and "lang" in plan
    assert "ReadSchema" in plan
