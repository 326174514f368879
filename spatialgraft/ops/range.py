"""Range query / spatial range join / range-aggregate join.

Spark-first realization of the reference's centerpiece joins
(`sjoin` reference/src/main/scala/cs/purdue/edu/spatialrdd/SpatialRdd.scala:264-284,
`rjoin` :298-322, `rangeFilter` :117-147):
query boxes are multicast to their covering grid cells (cover_cells), the
points side carries the same cell id, and Catalyst runs a hash equi-join on
`cell` followed by an exact int64 refine predicate — the dual-tree local
join (RTree.scala:185-300) collapses into join+filter with AQE handling
skew at runtime.  Aggregation rides Catalyst's partial+final hash agg
(replacing the hand-rolled flush at RTree.scala:315-356).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..broadcast import decide as _decide_broadcast
from ..cells import cover_cells, with_cell

CONTAINS = ("mx >= xmin AND mx <= xmax AND "
            "my >= ymin AND my <= ymax")

# None = auto: size-gate the multicast side against the session
# broadcast threshold (spatialgraft.broadcast.decide) — a huge query
# set shuffles instead of building a driver-side broadcast, with no
# flag knowledge required.  Explicit True/False still force.
_BROADCAST_DEFAULT: bool | None = None

# a query box covers <= ~64 cells at the join cell level (cells.py)
BOX_COVER_FANOUT = 64


def _joined(points: DataFrame, boxes: DataFrame,
            broadcast_queries: bool | None = _BROADCAST_DEFAULT,
            presence: set[int] | None = None,
            pred: str | None = None) -> DataFrame:
    """points (with mx,my) x boxes (milli bbox) -> matched pairs.

    `presence`: optional sFilter cell-presence set — multicast rows whose
    cell holds no data are dropped before the shuffle
    (spatialgraft.sfilter; exact version of the reference's sFilter
    pruning, SBQTree.scala:46-257).
    `pred`: optional extra data-side predicate — the reference's
    `z: Entry[V] => Boolean` argument on rangeFilter/sjoin
    (SpatialRdd.scala:117,264); applied before the join so it pushes
    into the scan."""
    if pred is not None:
        points = points.where(F.expr(pred) if isinstance(pred, str)
                              else pred)
    pts = with_cell(points)
    bc = _decide_broadcast(boxes, broadcast_queries, BOX_COVER_FANOUT)
    cover = cover_cells(boxes)
    if presence is not None:
        from ..sfilter import prune_cover
        cover = prune_cover(cover, presence)
    if bc:
        cover = F.broadcast(cover)
    return pts.join(cover, on="cell", how="inner").where(F.expr(CONTAINS))


def range_filter(points: DataFrame, xmin: int, ymin: int,
                 xmax: int, ymax: int) -> DataFrame:
    """Global range query (F1): plain pushed-down predicate.

    Partition pruning comes free once data is written partitioned/sorted
    by cell (reference prunes via the driver quadtree,
    SpatialRdd.scala:117-143)."""
    return points.where(
        (F.col("mx") >= xmin) & (F.col("mx") <= xmax) &
        (F.col("my") >= ymin) & (F.col("my") <= ymax))


def range_join(points: DataFrame, boxes: DataFrame,
               broadcast_queries: bool | None = _BROADCAST_DEFAULT,
               presence: set[int] | None = None,
               pred: str | None = None) -> DataFrame:
    """sjoin (J1): (box_id, doc_key) matched pairs.

    Pairs are unique by construction — a point belongs to exactly one
    cell and a box's cover lists each cell once — so no distinct shuffle
    is needed (the reference dedupes because its multicast can route one
    box to a partition several times, SpatialRdd.scala:264-284; our cell
    cover cannot)."""
    j = _joined(points, boxes, broadcast_queries, presence, pred)
    return j.select("box_id", "doc_key")


def range_join_count(points: DataFrame, boxes: DataFrame,
                     broadcast_queries: bool | None = _BROADCAST_DEFAULT,
                     presence: set[int] | None = None,
                     pred: str | None = None) -> DataFrame:
    """rjoin (J2) with count aggregate — the SpatialJoinApp query
    (reference examples/SpatialJoinApp.scala:81-96)."""
    # Within one box's cover, cells never overlap, so each (box, point)
    # pair appears exactly once: count needs no dedup.
    j = _joined(points, boxes, broadcast_queries, presence, pred)
    return j.groupBy("box_id").agg(F.count("*").alias("cnt"))


def spatio_textual_filter(points: DataFrame, xmin: int, ymin: int,
                          xmax: int, ymax: int, needle: str) -> DataFrame:
    """F5: range predicate AND text containment on the text span
    (reference README.md:57-67)."""
    return range_filter(points, xmin, ymin, xmax, ymax).where(
        F.lower(F.col("text")).contains(needle.lower()))


INTERSECTS = ("d_xmin <= xmax AND xmin <= d_xmax AND "
              "d_ymin <= ymax AND ymin <= d_ymax")


def intersects_join(dboxes: DataFrame, qboxes: DataFrame,
                    broadcast_queries: bool | None = _BROADCAST_DEFAULT
                    ) -> DataFrame:
    """F3: box-data x box-query intersects join -> (box_id, dbox_id).

    Border-inclusive interval overlap on both axes — the reference's
    Geom.intersects / RTree.searchIntersection semantics
    (reference Geom.scala:96-97, rtree/RTree.scala:803-810).  Both
    sides multicast to their covering cells and hash-join on cell; a
    pair overlapping several cells is emitted exactly once via the
    reference-point rule (only the cell owning the intersection's
    lower-left corner reports it), so no distinct shuffle is needed —
    the standard dedup-free partitioned spatial-join shape."""
    from ..cells import cell_expr

    d = cover_cells(dboxes.selectExpr(
        "dbox_id", "xmin AS d_xmin", "ymin AS d_ymin",
        "xmax AS d_xmax", "ymax AS d_ymax"),
        xmin="d_xmin", ymin="d_ymin", xmax="d_xmax", ymax="d_ymax")
    bc = _decide_broadcast(qboxes, broadcast_queries, BOX_COVER_FANOUT)
    q = cover_cells(qboxes)
    if bc:
        q = F.broadcast(q)
    refpt_cell = cell_expr("greatest(d_xmin, xmin)",
                           "greatest(d_ymin, ymin)")
    return (d.join(q, on="cell", how="inner")
            .where(F.expr(INTERSECTS))
            .where(F.col("cell") == refpt_cell)
            .select("box_id", "dbox_id"))


def range_join_count_salted(points: DataFrame, boxes: DataFrame,
                            plan) -> DataFrame:
    """J8: skew-scheduled range join — the explicit analogue of the
    reference's joinScheduler (scheduler/joinScheduler.scala:102-167).

    Hot cells (from the exact cell histogram in `plan`) are split into
    `nsplits` salt slices: the data side hashes into one slice, the
    multicast query side replicates across all slices, and the join key
    becomes (cell, salt) — so no single reducer owns a whole hot cell
    even when AQE's probe-side splitting isn't enough.  Results are
    identical to range_join_count (tested)."""
    from ..partitioner import SpatialPartitioning

    assert isinstance(plan, SpatialPartitioning)
    spark = points.sparkSession
    m = F.broadcast(plan.to_df(spark))
    pts = (with_cell(points)
           .join(m, on="cell", how="left").fillna({"nsplits": 1})
           .withColumn("salt", F.pmod(F.xxhash64("doc_key"),
                                      F.col("nsplits"))))
    cover = (cover_cells(boxes)
             .join(m, on="cell", how="left").fillna({"nsplits": 1})
             .withColumn("salt", F.explode(
                 F.sequence(F.lit(0).cast("long"),
                            (F.col("nsplits") - 1).cast("long")))))
    j = (pts.select("cell", "salt", "mx", "my", "doc_key")
         .join(cover.select("cell", "salt", "box_id",
                            "xmin", "ymin", "xmax", "ymax"),
               on=["cell", "salt"], how="inner")
         .where(F.expr(CONTAINS)))
    return j.groupBy("box_id").agg(F.count("*").alias("cnt"))
