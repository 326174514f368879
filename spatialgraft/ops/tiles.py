"""Raster <-> vector tile assignment at a fixed tile level.

vector->raster: each point gets its owning tile id (exact int64 floor).
raster->vector: each box/polygon gets the set of tiles it overlaps
(cover expansion) — the role of the reference's Hilbert `toRanges`
(reference sfcurve.scala:100-148) at a fixed resolution.  The
exact-match gate (BASELINE.md) is trivial to honor because assignment is
pure integer arithmetic shared with the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import config as C


def tile_expr(mx: str = "mx", my: str = "my") -> F.Column:
    return F.expr(f"(({mx} * {C.TILE_TX}) div {C.WORLD_MX}) * {C.TILE_TY} "
                  f"+ (({my} * {C.TILE_TY}) div {C.WORLD_MY})")


def assign_tiles_points(points: DataFrame) -> DataFrame:
    """vector->raster: (doc_key, tile)."""
    return points.select("doc_key", tile_expr().alias("tile"))


def tiles_for_boxes(boxes: DataFrame, id_col: str = "box_id") -> DataFrame:
    """raster->vector: one row per (id, overlapped tile)."""
    tx0 = F.expr(f"(xmin * {C.TILE_TX}) div {C.WORLD_MX}")
    tx1 = F.expr(f"(xmax * {C.TILE_TX}) div {C.WORLD_MX}")
    ty0 = F.expr(f"(ymin * {C.TILE_TY}) div {C.WORLD_MY}")
    ty1 = F.expr(f"(ymax * {C.TILE_TY}) div {C.WORLD_MY}")
    return (boxes
            .withColumn("_tx", F.explode(F.sequence(tx0, tx1)))
            .withColumn("_ty", F.explode(F.sequence(ty0, ty1)))
            .select(F.col(id_col),
                    (F.col("_tx") * C.TILE_TY + F.col("_ty")).alias("tile")))


def tile_histogram(points: DataFrame) -> DataFrame:
    """Per-tile doc counts — the rollup feeding raster rendering."""
    return (points.select(tile_expr().alias("tile"))
            .groupBy("tile").agg(F.count("*").alias("cnt")))
