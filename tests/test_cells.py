"""Cell/Z-order encoding invariants: the JVM-side zorder_expr and the
driver-side zorder_int must agree bit-for-bit on every cell, with both
bit widths DERIVED from the grid config (a CELL_CX/CELL_CY change used
to silently corrupt only the JVM-side packing — VERDICT r4 nit 3)."""

import random

from pyspark.sql import functions as F

from spatialgraft import config as C
from spatialgraft.cells import (CX_BITS, CY_BITS, cell_expr, zorder_expr,
                                zorder_int)


def test_bit_widths_derived_from_config():
    assert 2 ** CX_BITS >= C.CELL_CX > 2 ** (CX_BITS - 1)
    assert 2 ** CY_BITS >= C.CELL_CY > 2 ** (CY_BITS - 1)


def test_zorder_expr_matches_zorder_int(spark):
    rng = random.Random(7)
    pts = [(rng.randrange(C.WORLD_MX), rng.randrange(C.WORLD_MY))
           for _ in range(500)]
    # include the grid corners / extremes
    pts += [(0, 0), (C.WORLD_MX - 1, C.WORLD_MY - 1),
            (0, C.WORLD_MY - 1), (C.WORLD_MX - 1, 0)]
    df = spark.createDataFrame(pts, "mx bigint, my bigint")
    got = (df.select("mx", "my",
                     cell_expr().alias("cell"),
                     zorder_expr().alias("z"))
           .collect())
    for r in got:
        assert int(r["z"]) == zorder_int(int(r["cell"])), \
            (r["mx"], r["my"], r["cell"])


def test_zorder_is_injective_over_cells(spark):
    # every cell id maps to a distinct Morton key (widths really hold
    # the full grid)
    df = spark.range(C.N_CELLS).selectExpr(
        f"id div {C.CELL_CY} AS cx", f"id % {C.CELL_CY} AS cy")
    z = df.selectExpr(
        " + ".join([f"(((cx >> {i}) & 1) << {2 * i + 1})"
                    for i in range(CX_BITS)]
                   + [f"(((cy >> {i}) & 1) << {2 * i})"
                      for i in range(CY_BITS)]) + " AS z")
    assert z.select(F.countDistinct("z")).collect()[0][0] == C.N_CELLS
