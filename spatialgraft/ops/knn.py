"""Two-stage exact kNN join (J5/J6/J7 + W1).

Re-design of the reference's range-based kNN join
(reference/src/main/scala/cs/purdue/edu/spatialrdd/impl/knnJoinRDD.scala:45-242):

  stage 1  queries cogrouped with data by spatial partition id (the
           skew-aware plan from spatialgraft.partitioner); per-group numpy
           kNN (argpartition) gives each query k valid candidates and the
           kth-distance upper bound — the reference's local
           `knnjoin_` (RtreePartition.scala:248-292).
  split    queries whose kth-radius box stays inside their own unsalted
           home cell are DONE (their true kNN is already local), mirroring
           correctKNN/nextRoundKNN (knnJoinRDD.scala:63-98).
  stage 2  boundary queries re-join points over cover_cells(radius box)
           with the exact bound dist2 <= kth2 — the reference's `rkjoin`
           (RtreePartition.scala:294-324) — then a (dist2, doc_key)
           window rank <= k pins a deterministic total order (the
           reference's sort+slice at knnJoinRDD.scala:217-231 is
           tie-unstable; we fix the canon).

Distances are float64 (dx*dx + dy*dy) computed with the same IEEE ops in
numpy, Spark SQL, and the DuckDB oracle, so values match bit-exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import config as C
from ..cells import cover_cells, with_cell
from ..partitioner import SpatialPartitioning, assign_pid, plan_partitions

_STAGE1_SCHEMA = ("qid bigint, qmx bigint, qmy bigint, qx double, "
                  "qy double, doc_key bigint, dist2 double, kth2 double, "
                  "done boolean")


def _cell_bounds_mx(qmx: np.ndarray, qmy: np.ndarray):
    """Exact milli bounds of the cell owning each query point."""
    cx = qmx * C.CELL_CX // C.WORLD_MX
    cy = qmy * C.CELL_CY // C.WORLD_MY
    # cell x-extent is [ceil(cx*W/CX), ceil((cx+1)*W/CX)-1] in milli ints
    x0 = -(-cx * C.WORLD_MX // C.CELL_CX)
    x1 = -(-(cx + 1) * C.WORLD_MX // C.CELL_CX) - 1
    y0 = -(-cy * C.WORLD_MY // C.CELL_CY)
    y1 = -(-(cy + 1) * C.WORLD_MY // C.CELL_CY) - 1
    return x0, x1, y0, y1


def _stage1_factory(k: int):
    def fn(queries: pd.DataFrame, points: pd.DataFrame) -> pd.DataFrame:
        if queries.empty:
            return pd.DataFrame(
                columns=["qid", "qmx", "qmy", "qx", "qy", "doc_key",
                         "dist2", "kth2", "done"])
        qx = queries["qx"].to_numpy(np.float64)
        qy = queries["qy"].to_numpy(np.float64)
        qmx = queries["qmx"].to_numpy(np.int64)
        qmy = queries["qmy"].to_numpy(np.int64)
        nsplits = queries["nsplits"].to_numpy(np.int64)
        nq = len(queries)
        px = points["x"].to_numpy(np.float64)
        py = points["y"].to_numpy(np.float64)
        pk = points["doc_key"].to_numpy(np.int64)
        npts = len(points)
        kk = min(k, npts)

        if kk > 0:
            dx = qx[:, None] - px[None, :]
            dy = qy[:, None] - py[None, :]
            d2 = dx * dx + dy * dy
            # k-smallest per row with the canonical (dist2, doc_key)
            # tie-break: argpartition gives the kth distance value, then
            # everything <= it is re-ordered lexicographically.  Ties are
            # real (hash-derived coordinates collide), and an arbitrary
            # tie pick here would become the final answer for DONE
            # queries.
            idx = np.empty((nq, kk), np.int64)
            dsel = np.empty((nq, kk), np.float64)
            for i in range(nq):
                row = d2[i]
                if kk < npts:
                    thresh = np.partition(row, kk - 1)[kk - 1]
                    cand = np.flatnonzero(row <= thresh)
                else:
                    cand = np.arange(npts)
                order = np.lexsort((pk[cand], row[cand]))[:kk]
                sel = cand[order]
                idx[i] = sel
                dsel[i] = row[sel]
            kth2 = dsel.max(axis=1) if npts >= k else np.full(nq, np.inf)
        else:
            idx = np.zeros((nq, 0), np.int64)
            dsel = np.zeros((nq, 0), np.float64)
            kth2 = np.full(nq, np.inf)

        # done iff unsalted cell and kth-radius box inside the home cell
        x0, x1, y0, y1 = _cell_bounds_mx(qmx, qmy)
        with np.errstate(over="ignore"):
            rm = np.where(np.isfinite(kth2),
                          np.ceil(np.sqrt(kth2) * 1000.0) + 1,
                          np.float64(C.WORLD_MX))
        rm = rm.astype(np.int64)
        done = ((nsplits == 1) & (npts >= k) &
                (qmx - rm >= x0) & (qmx + rm <= x1) &
                (qmy - rm >= y0) & (qmy + rm <= y1))

        rep = idx.shape[1]
        qids = queries["qid"].to_numpy(np.int64)
        return pd.DataFrame({
            "qid": np.repeat(qids, rep),
            "qmx": np.repeat(qmx, rep), "qmy": np.repeat(qmy, rep),
            "qx": np.repeat(qx, rep), "qy": np.repeat(qy, rep),
            "doc_key": pk[idx.ravel()] if rep else
                       np.empty(0, np.int64),
            "dist2": dsel.ravel(),
            "kth2": np.repeat(kth2, rep),
            "done": np.repeat(done, rep)})

    return fn


def knn_join(points: DataFrame, queries: DataFrame, k: int = C.DEFAULT_K,
             plan: SpatialPartitioning | None = None,
             n_partitions: int = C.DEFAULT_PARTITIONS) -> DataFrame:
    """For every query point: its k nearest data points.

    Returns (qid, doc_key, dist2, rnk) with rnk 1..k ordered by
    (dist2, doc_key)."""
    spark = points.sparkSession
    # One extraction pass feeds the histogram, stage 1, and stage 2 —
    # persist only the slim projection (the spans column is heavy and
    # irrelevant here).
    pproj = points.select("doc_key", "x", "y", "mx", "my").persist()
    if plan is None:
        plan = plan_partitions(pproj, n_partitions)

    pts_p = assign_pid(pproj, plan).select(
        "spid", "cell", "doc_key", "x", "y", "mx", "my")
    qcell = with_cell(queries, "qmx", "qmy")
    m = F.broadcast(plan.to_df(spark))
    q_p = (qcell.join(m, on="cell", how="left")
           .fillna({"pid": 0, "nsplits": 1})
           .withColumn("spid",
                       (F.col("pid").cast("long") * 4096 +
                        F.pmod(F.xxhash64("qid"), F.col("nsplits")))
                       .cast("long")))

    stage1 = (q_p.groupBy("spid")
              .cogroup(pts_p.groupBy("spid"))
              .applyInPandas(_stage1_factory(k), _STAGE1_SCHEMA)
              .persist())

    w = Window.partitionBy("qid").orderBy("dist2", "doc_key")

    done = (stage1.where("done")
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("qid", "doc_key", "dist2", "rnk"))

    # Boundary queries: rebuild the candidate set exactly from the
    # kth-radius box (superset of the true kNN by the stage-1 bound).
    bq = (stage1.where("NOT done")
          .groupBy("qid", "qmx", "qmy", "qx", "qy")
          .agg(F.min("kth2").alias("kth2")))
    bq = (bq.withColumn(
            "rm",
            F.when(F.col("kth2") == float("inf"),
                   F.lit(C.WORLD_MX).cast("bigint"))
            .otherwise((F.ceil(F.sqrt("kth2") * 1000.0) + 1)
                       .cast("bigint")))
          .withColumn("xmin", F.greatest(F.lit(0), F.col("qmx") - F.col("rm")))
          .withColumn("xmax", F.least(F.lit(C.WORLD_MX - 1),
                                      F.col("qmx") + F.col("rm")))
          .withColumn("ymin", F.greatest(F.lit(0), F.col("qmy") - F.col("rm")))
          .withColumn("ymax", F.least(F.lit(C.WORLD_MY - 1),
                                      F.col("qmy") + F.col("rm"))))
    cover = F.broadcast(cover_cells(bq))
    cand = (pts_p.join(cover, on="cell", how="inner")
            .withColumn("dist2",
                        (F.col("qx") - F.col("x")) *
                        (F.col("qx") - F.col("x")) +
                        (F.col("qy") - F.col("y")) *
                        (F.col("qy") - F.col("y")))
            .where(F.col("dist2") <= F.col("kth2")))
    boundary = (cand.withColumn("rnk", F.row_number().over(w))
                .where(F.col("rnk") <= k)
                .select("qid", "doc_key", "dist2", "rnk"))

    return done.unionByName(boundary)
