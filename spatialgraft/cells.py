"""Grid-cell encoding and box cover — exact int64, JVM-side expressions.

Plays the role of the reference's space-filling-curve cell ids
(reference/src/main/scala/cs/purdue/edu/spatialindex/rtree/sfcurve.scala:28-148)
and of the query-multicast step that replicates each query box to every
overlapping partition (reference SpatialRdd.scala:377-397).  Everything is
a Catalyst column expression (whole-stage codegen, no UDF):

  cell_x = mx * CX div WORLD_MX      (exact integer floor)
  cell   = cell_x * CY + cell_y
  cover(box) = explode(x-range) x explode(y-range)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import config as C


def cell_expr(mx: str = "mx", my: str = "my",
              cx: int = C.CELL_CX, cy: int = C.CELL_CY) -> Column:
    return F.expr(f"(({mx} * {cx}) div {C.WORLD_MX}) * {cy} "
                  f"+ (({my} * {cy}) div {C.WORLD_MY})")


def with_cell(df: DataFrame, mx: str = "mx", my: str = "my",
              out: str = "cell") -> DataFrame:
    return df.withColumn(out, cell_expr(mx, my))


def zorder_expr(mx: str = "mx", my: str = "my") -> Column:
    """Bit-interleaved (Morton) key for locality-preserving sorts."""
    cx = f"(({mx} * {C.CELL_CX}) div {C.WORLD_MX})"
    cy = f"(({my} * {C.CELL_CY}) div {C.WORLD_MY})"
    parts = []
    for i in range(8):  # CELL_CX=256 -> 8 bits; y uses 7
        parts.append(f"((({cx}) >> {i}) & 1) << {2 * i + 1}")
        if i < 7:
            parts.append(f"((({cy}) >> {i}) & 1) << {2 * i}")
    return F.expr(" + ".join(parts))


def cover_cells(boxes: DataFrame,
                xmin: str = "xmin", ymin: str = "ymin",
                xmax: str = "xmax", ymax: str = "ymax",
                out: str = "cell") -> DataFrame:
    """One output row per (box, overlapped cell) — the multicast step.

    Cell ranges are computed with the same exact integer floor as point
    assignment, so a border-inclusive containment can never fall outside
    the cover.
    """
    cx0 = F.expr(f"({xmin} * {C.CELL_CX}) div {C.WORLD_MX}")
    cx1 = F.expr(f"({xmax} * {C.CELL_CX}) div {C.WORLD_MX}")
    cy0 = F.expr(f"({ymin} * {C.CELL_CY}) div {C.WORLD_MY}")
    cy1 = F.expr(f"({ymax} * {C.CELL_CY}) div {C.WORLD_MY}")
    return (boxes
            .withColumn("_cx", F.explode(F.sequence(cx0, cx1)))
            .withColumn("_cy", F.explode(F.sequence(cy0, cy1)))
            .withColumn(out, F.col("_cx") * C.CELL_CY + F.col("_cy"))
            .drop("_cx", "_cy"))


def zorder_int(cell: int, cx_bits: int = 8, cy_bits: int = 7) -> int:
    """Driver-side Morton key of a cell id (for partition packing)."""
    cxv, cyv = divmod(cell, C.CELL_CY)
    z = 0
    for i in range(cx_bits):
        z |= ((cxv >> i) & 1) << (2 * i + 1)
    for i in range(cy_bits):
        z |= ((cyv >> i) & 1) << (2 * i)
    return z
