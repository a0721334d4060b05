"""Checkpoint/resume + per-partition lineage & metrics (north rule).

A `CheckpointedPipeline` runs a sequence of named stages, persisting each stage's
output DataFrame as partitioned Parquet under <root>/<stage>/ together with a
_manifest.json recording: stage name, round number, row count, per-partition row
counts (lineage), an order-insensitive content hash, the input manifest hashes it
derived from, and wall-clock. A re-run after a kill reads the latest valid manifest
and resumes from the first missing/invalid stage — identical output hash, no
recomputation of finished stages.

This is the Spark analog of the reference's driver-coordinated fixpoint rounds
(SURVEY.md A9: snap-radius loop -> checkpoint each round): Catalyst has no iterate,
so iteration state lives in Parquet + manifests, and every stage boundary is a
durable, audited cut of the lineage.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"


def content_hash(df: DataFrame) -> str:
    """Order-insensitive, partitioning-independent content hash: xor+sum over
    per-row 64-bit hashes of the canonically stringified row."""
    cols = sorted(df.columns)
    row_hash = F.xxhash64(*[F.col(c).cast("string") for c in cols])
    # decimal(38,0) sum: immune to ANSI-mode bigint overflow
    agg = df.select(
        F.sum(row_hash.cast("decimal(38,0)")).alias("s"),
        F.count("*").alias("n"),
    ).collect()[0]
    s = int(agg["s"] or 0) & 0xFFFFFFFFFFFFFFFF
    return f"{s:016x}-{agg['n']}"


def partition_lineage(df: DataFrame) -> list[dict]:
    """Per-partition row counts (lineage record for the manifest)."""
    counts = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .count()
        .orderBy("_pid")
        .collect()
    )
    return [{"partition": int(r["_pid"]), "rows": int(r["count"])} for r in counts]


@dataclass
class StageResult:
    name: str
    path: str
    rows: int
    hash: str
    elapsed_sec: float
    resumed: bool


@dataclass
class CheckpointedPipeline:
    spark: SparkSession
    root: str
    metrics: list[StageResult] = field(default_factory=list)

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._stage_dir(name), MANIFEST)

    def load_manifest(self, name: str) -> dict | None:
        p = self._manifest_path(name)
        if not os.path.exists(p):
            return None
        try:
            with open(p) as f:
                m = json.load(f)
            return m if m.get("complete") else None
        except (json.JSONDecodeError, OSError):
            return None

    def stage(
        self,
        name: str,
        build: Callable[[], DataFrame],
        inputs: tuple[str, ...] = (),
        partition_by: tuple[str, ...] = (),
    ) -> DataFrame:
        """Run (or resume) one stage. `inputs` are upstream stage names — if any
        upstream hash changed, this stage recomputes (lineage-aware invalidation)."""
        input_hashes = {}
        for dep in inputs:
            m = self.load_manifest(dep)
            if m is None:
                raise RuntimeError(f"stage {name}: missing upstream checkpoint {dep}")
            input_hashes[dep] = m["hash"]

        existing = self.load_manifest(name)
        sdir = self._stage_dir(name)
        if existing is not None and existing.get("input_hashes") == input_hashes:
            self.metrics.append(
                StageResult(name, sdir, existing["rows"], existing["hash"], 0.0, True)
            )
            return self.spark.read.parquet(sdir)

        t0 = time.time()
        df = build()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(sdir)
        out = self.spark.read.parquet(sdir)
        h = content_hash(out)
        manifest = {
            "stage": name,
            "rows": out.count(),
            "hash": h,
            "input_hashes": input_hashes,
            "lineage": partition_lineage(out),
            "written_at": time.time(),
            "complete": True,
        }
        with open(self._manifest_path(name), "w") as f:
            json.dump(manifest, f, indent=1)
        self.metrics.append(
            StageResult(name, sdir, manifest["rows"], h, round(time.time() - t0, 3), False)
        )
        return out

    def fixpoint(
        self,
        name: str,
        init: Callable[[], DataFrame],
        step: Callable[[DataFrame, int], tuple[DataFrame, bool]],
        max_rounds: int = 64,
    ) -> DataFrame:
        """Driver-side fixpoint loop with one checkpoint per round (reference
        snap-radius loop analog, iOverlay/src/split/solver_list.rs:27-64). Resume
        picks up at the last completed round."""
        state_name = f"{name}_r0"
        if self.load_manifest(state_name) is None:
            df = self.stage(state_name, init)
        else:
            df = self.stage(state_name, init)  # no-op resume via manifest
        rnd = 1
        while rnd <= max_rounds:
            rname = f"{name}_r{rnd}"
            done_marker = self.load_manifest(rname)
            if done_marker is not None and done_marker.get("fixpoint_done"):
                return self.spark.read.parquet(self._stage_dir(rname))
            prev = df
            holder: dict[str, bool] = {}

            def build():
                new_df, done = step(prev, rnd)
                holder["done"] = done
                return new_df

            df = self.stage(rname, build, inputs=(f"{name}_r{rnd - 1}",))
            if holder.get("done", False) or rnd == max_rounds:
                m = self.load_manifest(rname)
                m["fixpoint_done"] = True
                with open(self._manifest_path(rname), "w") as f:
                    json.dump(m, f, indent=1)
                return df
            rnd += 1
        return df

    def report(self) -> dict:
        return {
            "stages": [
                {
                    "name": s.name,
                    "rows": s.rows,
                    "hash": s.hash,
                    "sec": s.elapsed_sec,
                    "resumed": s.resumed,
                }
                for s in self.metrics
            ]
        }
