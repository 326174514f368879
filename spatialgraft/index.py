"""Persistent spatial layout — the engine's 'CREATE INDEX' (S3).

The reference builds a transient in-memory index per partition
(reference SpatialRdd.scala:595-644).  The Spark-native equivalent of a
*persistent* spatial index is a storage layout: write the table
hive-partitioned by a coarse cell (bounded directory count) and sorted by
the fine cell within files.  Range queries then get
  - directory pruning from the coarse-cell partition column, and
  - parquet row-group pruning from the fine-cell min/max stats,
entirely through Catalyst (PartitionFilters / PushedFilters in explain).
At Iceberg scale the same layout is `PARTITIONED BY (pcell)` + sort
order, swapped in behind this seam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import config as C
from .cells import with_cell

# 16 x 8 = 128 directories — bounded regardless of data size.
PCOARSE_X = 16
PCOARSE_Y = 8


def pcell_expr(mx: str = "mx", my: str = "my") -> F.Column:
    return F.expr(f"(({mx} * {PCOARSE_X}) div {C.WORLD_MX}) * {PCOARSE_Y} "
                  f"+ (({my} * {PCOARSE_Y}) div {C.WORLD_MY})")


def write_indexed(points: DataFrame, path: str,
                  n_tasks: int | None = None,
                  max_records_per_file: int | None = 50_000_000) -> None:
    """Write the indexed layout: partitioned by coarse cell, sorted by
    fine cell within partitions.

    Write parallelism scales with data, not with the 128 coarse cells:
    repartitionByRange(n_tasks, pcell, cell) gives each task a
    contiguous (pcell, cell) slice — so a hot coarse cell is split
    across many writer tasks (no 128-task straggler/giant-file cap)
    while each output file still covers a tight sorted cell run (row-
    group pruning stays as sharp as the single-task-per-pcell layout).
    maxRecordsPerFile bounds individual file size under skew."""
    spark = points.sparkSession
    if n_tasks is None:
        n_tasks = int(spark.conf.get("spark.sql.shuffle.partitions"))
    w = (with_cell(points)
         .withColumn("pcell", pcell_expr())
         .repartitionByRange(n_tasks, "pcell", "cell")
         .sortWithinPartitions("pcell", "cell")
         .write.mode("overwrite"))
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.partitionBy("pcell").parquet(path)


def read_indexed(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _pcell_cover(xmin: int, ymin: int, xmax: int, ymax: int) -> list[int]:
    px0 = xmin * PCOARSE_X // C.WORLD_MX
    px1 = xmax * PCOARSE_X // C.WORLD_MX
    py0 = ymin * PCOARSE_Y // C.WORLD_MY
    py1 = ymax * PCOARSE_Y // C.WORLD_MY
    return [px * PCOARSE_Y + py
            for px in range(px0, px1 + 1)
            for py in range(py0, py1 + 1)]


def range_filter_indexed(spark: SparkSession, path: str,
                         xmin: int, ymin: int, xmax: int, ymax: int
                         ) -> DataFrame:
    """Range query over the indexed layout: the pcell IN (...) predicate
    prunes directories before any file is opened; the box predicate is
    pushed to parquet row groups."""
    df = read_indexed(spark, path)
    return df.where(
        F.col("pcell").isin(_pcell_cover(xmin, ymin, xmax, ymax)) &
        (F.col("mx") >= xmin) & (F.col("mx") <= xmax) &
        (F.col("my") >= ymin) & (F.col("my") <= ymax))
