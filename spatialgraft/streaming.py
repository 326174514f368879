"""Structured-Streaming ingest: windowed tile rollups with late data.

The reference is batch-only (no streaming anywhere in the repo; SURVEY
§2.10) — this is the engine's forward extension: a stream of events with
derived point locations is rolled up into (event-time window, tile)
counts with a watermark for late arrivals.  The same transformation runs
in batch (`tile_rollup_batch`) so streaming output is testable against
the batch plan on identical input (memory sink + processAllAvailable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import config as C
from .ops.tiles import tile_expr

# Deterministic event -> milli-degree location (same modular-arithmetic
# style as sqlgen.points_cte, derived from event_id).
_EMX = f"((CAST(event_id AS BIGINT) * {C.PT_A1} + 99991) % {C.WORLD_MX})"
_EMY = f"((CAST(event_id AS BIGINT) * {C.PT_A2} + 77773) % {C.WORLD_MY})"


def _located(events: DataFrame) -> DataFrame:
    # watermarks require TIMESTAMP (tz-aware); source parquet is NTZ —
    # session timezone is pinned UTC, so the cast is deterministic
    return events.selectExpr("CAST(ts AS TIMESTAMP) AS ts", "event_id",
                             f"{_EMX} AS mx", f"{_EMY} AS my")


def tile_rollup_batch(events: DataFrame,
                      window: str = "5 minutes") -> DataFrame:
    """(window_start, tile, cnt) — the batch twin of the streaming query."""
    loc = _located(events).withColumn("tile", tile_expr())
    return (loc.groupBy(F.window("ts", window).alias("w"), "tile")
            .agg(F.count("*").alias("cnt"))
            .select(F.col("w.start").alias("window_start"), "tile", "cnt"))


def tile_rollup_stream(spark: SparkSession, events_path: str,
                       schema, window: str = "5 minutes",
                       watermark: str = "10 minutes",
                       query_name: str = "tile_rollup",
                       max_files_per_trigger: int | None = None):
    """Streaming tile rollup over a parquet-backed stream.

    'update' output mode: the watermark actually finalizes windows and
    evicts their state (in 'complete' mode a watermark is inert and
    state grows forever — the scale bug this mode choice avoids).  The
    memory sink is the sandbox stand-in; a production deployment swaps
    in Kafka/Iceberg.  Returns the StreamingQuery (caller stops it).

    Reading the memory sink: 'update' emits one row per (window, tile)
    per trigger in which the group changed, so a multi-batch run leaves
    intermediate counts alongside final ones — consumers must take the
    LAST update per (window_start, tile) (counts only grow, so
    max(cnt) per group; see test_streaming).  Rows later than the
    watermark are dropped by design and will diverge from an
    all-inclusive batch twin — that is the streaming contract, not a
    bug.  max_files_per_trigger caps files per microbatch (testing the
    multi-batch path; production tunes it for latency)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    events = reader.parquet(events_path)
    loc = _located(events).withColumn("tile", tile_expr())
    agg = (loc.withWatermark("ts", watermark)
           .groupBy(F.window("ts", window).alias("w"), "tile")
           .agg(F.count("*").alias("cnt"))
           .select(F.col("w.start").alias("window_start"), "tile", "cnt"))
    return (agg.writeStream.outputMode("update")
            .format("memory").queryName(query_name).start())
