"""Iceberg-style table layout over partitioned Parquet — honest lightweight stand-in
(no iceberg jar in this environment; SURVEY.md §7 environment facts).

What it reproduces from the Iceberg model:
  - immutable data files under partition directories,
  - versioned snapshot manifests (`metadata/v{N}.json`) listing every data file with
    its partition values, row count, and per-column min/max stats,
  - snapshot isolation + time travel (read any snapshot id),
  - scan planning that prunes files by partition values AND column stats before
    Spark ever sees them, reporting pruned-file metrics (north rule: record
    pruned-file counts),
  - append = new snapshot referencing old + new files.

Reads return a plain Spark DataFrame over exactly the selected files, so Catalyst
still applies its own predicate pushdown inside each file (`PushedFilters` in
.explain). Swap for the real Iceberg catalog by replacing read_table/write_table
with `spark.read.format("iceberg")` when a jar is present — the engine's operators
only see DataFrames.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

METADATA_DIR = "metadata"

# simple filter algebra: (column, op, value) conjunctions
_OPS = {
    "=": lambda lo, hi, v: not (v < lo or hi < v),
    "<": lambda lo, hi, v: lo < v,
    "<=": lambda lo, hi, v: lo <= v,
    ">": lambda lo, hi, v: hi > v,
    ">=": lambda lo, hi, v: hi >= v,
}


def _file_stats(path: str) -> tuple[int, dict]:
    """Row count + per-column min/max from the parquet footer (no data read)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    stats: dict[str, list] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            s = col.statistics
            if s is None or not s.has_min_max:
                continue
            mn, mx = s.min, s.max
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode(), mx.decode()
                except UnicodeDecodeError:
                    continue
            cur = stats.get(name)
            if cur is None:
                stats[name] = [mn, mx]
            else:
                cur[0] = min(cur[0], mn)
                cur[1] = max(cur[1], mx)
    return md.num_rows, stats


def _scan_data_files(root: str) -> list[dict]:
    """Walk partition directories (hive-style key=value) collecting data files."""
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if METADATA_DIR in dirpath.split(os.sep):
            continue
        parts = {}
        rel = os.path.relpath(dirpath, root)
        if rel != ".":
            for seg in rel.split(os.sep):
                if "=" in seg:
                    k, v = seg.split("=", 1)
                    parts[k] = v
        for fn in filenames:
            if not fn.endswith(".parquet"):
                continue
            fp = os.path.join(dirpath, fn)
            rows, stats = _file_stats(fp)
            out.append({"path": fp, "partition": parts, "rows": rows, "stats": stats})
    return out


def _latest_version(root: str) -> int:
    mdir = os.path.join(root, METADATA_DIR)
    if not os.path.isdir(mdir):
        return 0
    vs = [
        int(n[1:-5])
        for n in os.listdir(mdir)
        if n.startswith("v") and n.endswith(".json")
    ]
    return max(vs, default=0)


def write_table(df: DataFrame, root: str, partition_by: list[str], mode: str = "overwrite") -> dict:
    """Write a snapshot: data files partitioned hive-style + a new manifest version.

    Data files are immutable: every write APPENDS files at the filesystem level
    (Spark part-file names are unique), and the manifest decides visibility —
    mode="overwrite" lists only the newly-written files, mode="append" lists the
    previous snapshot's files + the new ones. Old snapshots therefore stay
    readable after an overwrite and the version sequence never restarts (real
    Iceberg semantics: overwrite is a metadata operation, not a delete)."""
    before = {f["path"] for f in _scan_data_files(root)} if os.path.isdir(root) else set()
    df.write.mode("append").partitionBy(*partition_by).parquet(root)
    all_files = _scan_data_files(root)
    new_files = [f for f in all_files if f["path"] not in before]
    prev_version = _latest_version(root)
    if mode == "append" and prev_version > 0:
        with open(os.path.join(root, METADATA_DIR, f"v{prev_version}.json")) as f:
            prev_files = json.load(f)["files"]
        files = prev_files + new_files
    else:
        files = new_files
    version = prev_version + 1
    manifest = {
        "format": "iceberg-lite/1",
        "snapshot_id": version,
        "created_ms": int(time.time() * 1000),
        "partition_by": partition_by,
        "schema": df.schema.jsonValue(),
        "files": files,
        "total_rows": sum(f["rows"] for f in files),
    }
    mdir = os.path.join(root, METADATA_DIR)
    os.makedirs(mdir, exist_ok=True)
    with open(os.path.join(mdir, f"v{version}.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


@dataclass
class ScanReport:
    snapshot_id: int
    files_total: int
    files_selected: int
    rows_total: int
    rows_selected_upper_bound: int

    @property
    def files_pruned(self) -> int:
        return self.files_total - self.files_selected


def _parse_scalar(v):
    """Directory partition values are strings; compare numerically when possible."""
    if isinstance(v, str):
        try:
            return int(v)
        except ValueError:
            try:
                return float(v)
            except ValueError:
                return v
    return v


def _comparable(a, b):
    a, b = _parse_scalar(a), _parse_scalar(b)
    if isinstance(a, str) != isinstance(b, str):
        return str(a), str(b)
    return a, b


def _file_matches(f: dict, filters: list[tuple[str, str, object]]) -> bool:
    for col, op, val in filters:
        if col in f["partition"]:
            pv, val_c = _comparable(f["partition"][col], val)
            # partition value is an exact point: lo == hi
            if not _OPS[op](pv, pv, val_c):
                return False
        elif col in f["stats"]:
            lo, hi = f["stats"][col]
            lo, val_c = _comparable(lo, val)
            hi, _ = _comparable(hi, val)
            if not _OPS[op](lo, hi, val_c):
                return False
        # unknown column: cannot prune on it — keep the file
    return True


def read_table(
    spark: SparkSession,
    root: str,
    filters: list[tuple[str, str, object]] | None = None,
    snapshot_id: int | None = None,
) -> tuple[DataFrame, ScanReport]:
    """Plan a scan against a snapshot: prune files via partition values + column
    stats, return (DataFrame over the surviving files, ScanReport with pruning
    metrics). Filters are (col, op, value) conjunctions with op in =,<,<=,>,>=;
    they prune files only — apply the same predicate on the DataFrame for exact
    row-level semantics (Catalyst pushes it into the parquet scan)."""
    version = snapshot_id if snapshot_id is not None else _latest_version(root)
    with open(os.path.join(root, METADATA_DIR, f"v{version}.json")) as f:
        manifest = json.load(f)
    files = manifest["files"]
    selected = [f for f in files if _file_matches(f, filters or [])]
    report = ScanReport(
        snapshot_id=version,
        files_total=len(files),
        files_selected=len(selected),
        rows_total=manifest["total_rows"],
        rows_selected_upper_bound=sum(f["rows"] for f in selected),
    )
    if not selected:
        # all files pruned: empty DataFrame with the TABLE schema (from the
        # manifest), so downstream column references still resolve
        from pyspark.sql.types import StructType

        df = spark.createDataFrame([], schema=StructType.fromJson(manifest["schema"]))
        return df, report
    # basePath keeps hive partition columns in the schema
    df = spark.read.option("basePath", root).parquet(*[f["path"] for f in selected])
    return df, report
