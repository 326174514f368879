"""Two-stage exact kNN join (J5/J6/J7 + W1) — fully JVM-side.

Re-design of the reference's range-based kNN join
(reference/src/main/scala/cs/purdue/edu/spatialrdd/impl/knnJoinRDD.scala:45-242)
as pure DataFrame operations (whole-stage codegen end to end — an earlier
applyInPandas cogroup variant was 10-30x slower at scale because the
grouped-Arrow plumbing dominates):

  stage 1  each query is multicast to the 3x3 cell ring around its home
           cell (bounded fan-out, like the reference's local `knnjoin_`,
           RtreePartition.scala:248-292); an equi-join on cell + window
           rank (dist2, doc_key) gives k local candidates and the
           kth-distance upper bound kth2 (cnt < k in the ring -> +inf).
  split    DONE queries: ring held >= k candidates and the kth-radius
           box lies inside the ring's exact milli bounds -> the local
           top-k is the true kNN (correctKNN/nextRoundKNN split,
           knnJoinRDD.scala:63-98).
  stage 2  boundary queries re-join points over cover_cells(radius box)
           with the exact bound dist2 <= kth2 (the reference's `rkjoin`,
           RtreePartition.scala:294-324); +inf bound -> world cover
           (only happens in near-empty regions where the scan is small
           by definition).
  rank     row_number over (dist2, doc_key) pins a deterministic total
           order (the reference's sort+slice at knnJoinRDD.scala:217-231
           is tie-unstable; ties are real here, so the canon matters).

Skew: the ring join's build side is the multicast query set (broadcast);
the probe side shuffles on cell, where AQE skew-split applies.  All
distances are float64 (dx*dx + dy*dy) with the same expression shape as
the DuckDB oracle -> bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import config as C
from ..cells import cover_cells, with_cell

_D2 = ("(qx - x) * (qx - x) + (qy - y) * (qy - y)")


def _with_ring_bounds(queries: DataFrame,
                      cell_counts: DataFrame | None = None,
                      k: int = C.DEFAULT_K) -> DataFrame:
    """Attach the exact milli bounds of each query's candidate cell ring
    (cell cx covers mx in [ceil(cx*W/CX), ceil((cx+1)*W/CX) - 1]).

    Adaptive fan-out: when the query's own cell already holds plenty of
    points (>= 3k, from the broadcast cell histogram) the ring is just
    that cell — in dense regions (the skew hotspot) a 3x3 ring would
    over-fetch ~100x for the bound it buys.  Sparse cells use the 3x3
    ring.  Correctness is unaffected: the ring only produces the kth
    bound; too few candidates -> +inf -> exact stage-2 fallback."""
    q = (queries
         .withColumn("_cx", F.expr(f"(qmx * {C.CELL_CX}) div {C.WORLD_MX}"))
         .withColumn("_cy", F.expr(f"(qmy * {C.CELL_CY}) div {C.WORLD_MY}"))
         .withColumn("cell", F.col("_cx") * C.CELL_CY + F.col("_cy")))
    if cell_counts is not None:
        q = (q.join(F.broadcast(cell_counts), on="cell", how="left")
             .fillna({"cellcnt": 0})
             .withColumn("_r", F.when(F.col("cellcnt") >= 3 * k, 0)
                         .otherwise(1))
             .drop("cellcnt"))
    else:
        q = q.withColumn("_r", F.lit(1))
    q = (q.drop("cell")
         .withColumn("_cxa", F.expr("greatest(_cx - _r, 0)"))
         .withColumn("_cxb", F.expr(f"least(_cx + _r, {C.CELL_CX - 1})"))
         .withColumn("_cya", F.expr("greatest(_cy - _r, 0)"))
         .withColumn("_cyb", F.expr(f"least(_cy + _r, {C.CELL_CY - 1})"))
         .withColumn("ring_x0", F.expr(
             f"(_cxa * {C.WORLD_MX} + {C.CELL_CX - 1}) div {C.CELL_CX}"))
         .withColumn("ring_x1", F.expr(
             f"((_cxb + 1) * {C.WORLD_MX} + {C.CELL_CX - 1}) "
             f"div {C.CELL_CX} - 1"))
         .withColumn("ring_y0", F.expr(
             f"(_cya * {C.WORLD_MY} + {C.CELL_CY - 1}) div {C.CELL_CY}"))
         .withColumn("ring_y1", F.expr(
             f"((_cyb + 1) * {C.WORLD_MY} + {C.CELL_CY - 1}) "
             f"div {C.CELL_CY} - 1")))
    return q


def _ring(qmeta: DataFrame) -> DataFrame:
    """Multicast each query row to its ring cells."""
    return (qmeta
            .withColumn("_gx", F.explode(F.sequence("_cxa", "_cxb")))
            .withColumn("_gy", F.explode(F.sequence("_cya", "_cyb")))
            .withColumn("cell", F.col("_gx") * C.CELL_CY + F.col("_gy"))
               .drop("_cx", "_cy", "_cxa", "_cxb", "_cya", "_cyb",
                  "_gx", "_gy", "_r"))


def knn_join(points: DataFrame, queries: DataFrame, k: int = C.DEFAULT_K,
             broadcast_queries: bool = True) -> DataFrame:
    """For every query point (qid, qmx, qmy, qx, qy): its k nearest data
    points.  Returns (qid, doc_key, dist2, rnk), rnk 1..k by
    (dist2, doc_key)."""
    # slim projection cached: feeds the cell histogram, stage 1 and
    # stage 2 (the spans column must not ride into the cache)
    pts = with_cell(points).select("cell", "doc_key", "x", "y").persist()
    cell_counts = pts.groupBy("cell").agg(
        F.count("*").alias("cellcnt"))  # O(#cells), broadcast below
    qmeta = _with_ring_bounds(queries, cell_counts, k)
    ring = _ring(qmeta)
    if broadcast_queries:
        ring = F.broadcast(ring)

    w = Window.partitionBy("qid").orderBy("dist2", "doc_key")

    # stage 1: ring candidates, local top-k, kth bound
    cand1 = (pts.join(ring.select("cell", "qid", "qx", "qy"),
                      on="cell", how="inner")
             .withColumn("dist2", F.expr(_D2))
             .withColumn("rnk", F.row_number().over(w))
             .where(F.col("rnk") <= k)
             .persist())

    # left join keeps queries whose whole ring is empty (cnt=0 -> world)
    agg = cand1.groupBy("qid").agg(F.count("*").alias("cnt"),
                                   F.max("dist2").alias("kth2"))
    stats = (qmeta.select("qid", "qmx", "qmy", "qx", "qy",
                          "ring_x0", "ring_x1", "ring_y0", "ring_y1")
             .join(agg, on="qid", how="left")
             .fillna({"cnt": 0}))
    stats = (stats
             .withColumn("rm", F.when(
                 F.col("cnt") < k,
                 F.lit(C.WORLD_MX).cast("bigint"))
                 .otherwise((F.ceil(F.sqrt("kth2") * 1000.0) + 1)
                            .cast("bigint")))
             .withColumn("done",
                         (F.col("cnt") >= k) &
                         (F.col("qmx") - F.col("rm") >= F.col("ring_x0")) &
                         (F.col("qmx") + F.col("rm") <= F.col("ring_x1")) &
                         (F.col("qmy") - F.col("rm") >= F.col("ring_y0")) &
                         (F.col("qmy") + F.col("rm") <= F.col("ring_y1")))
             .persist())

    done = (cand1.join(stats.where("done").select("qid"), on="qid")
            .select("qid", "doc_key", "dist2", "rnk"))

    # stage 2: exact radius re-join for boundary queries
    bq = (stats.where("NOT done")
          .withColumn("kth2", F.when(F.col("cnt") < k,
                                     F.lit(float("inf")))
                      .otherwise(F.col("kth2")))
          .withColumn("xmin", F.greatest(F.lit(0),
                                         F.col("qmx") - F.col("rm")))
          .withColumn("xmax", F.least(F.lit(C.WORLD_MX - 1),
                                      F.col("qmx") + F.col("rm")))
          .withColumn("ymin", F.greatest(F.lit(0),
                                         F.col("qmy") - F.col("rm")))
          .withColumn("ymax", F.least(F.lit(C.WORLD_MY - 1),
                                      F.col("qmy") + F.col("rm")))
          .select("qid", "qx", "qy", "kth2",
                  "xmin", "xmax", "ymin", "ymax"))
    cover = cover_cells(bq)
    if broadcast_queries:
        cover = F.broadcast(cover)
    boundary = (pts.join(cover, on="cell", how="inner")
                .withColumn("dist2", F.expr(_D2))
                .where(F.col("dist2") <= F.col("kth2"))
                .withColumn("rnk", F.row_number().over(w))
                .where(F.col("rnk") <= k)
                .select("qid", "doc_key", "dist2", "rnk"))

    return done.unionByName(boundary)
