"""Deterministic synthesis of the spans-shaped documents table + query sets.

The north-rule input is an Iceberg table
``documents(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)``
of interleaved text + media documents.  No external data is allowed, so we
derive it deterministically from the driver's TPC-H-ish parquet via the
shared integer arithmetic in :mod:`spatialgraft.sqlgen` — the DuckDB oracle
re-derives the identical geometry straight from `lineitem`, which makes the
whole pipeline (span synthesis -> Arrow extraction -> spatial op) verifiable
end-to-end.

Each document carries three spans, in a fixed sequence that every operator
must preserve per-row (kind, text, media_ref, offset):
  0: kind='text'  free text  (spatio-textual predicates run on this)
  1: kind='geo'   'POINT(mx my)' in milli-degrees
  2: kind='media' opaque media_ref
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import sqlgen
from .session import load_table


def points_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived point set (doc_key, doc_id, mx, my, x, y, textline)."""
    load_table(spark, sf_dir, "lineitem")
    return spark.sql(sqlgen.points_cte("spark"))


def documents_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The input_hint-shaped table: (doc_id string, spans array<struct>).

    Geometry exists ONLY inside the geo span text — downstream operators
    must recover it through the vectorized Arrow extractor
    (:func:`spatialgraft.extract.with_geometry`).
    """
    # One slim shuffle to full parallelism (optimization guide §2.3/2.4):
    # hash-repartition the 8-byte key stream BEFORE the distinct agg and
    # the derived-column compute.  The repartition's hashpartitioning(k)
    # satisfies the DISTINCT's required distribution, so Catalyst adds no
    # second exchange, and an explicit repartition(n, col) is exempt from
    # AQE coalescing (which would otherwise shrink the tiny shuffle to
    # 1-2 partitions and starve the CPU-bound Arrow extraction stage).
    # The previous shape paid two exchanges — the AQE-coalesced DISTINCT
    # plus a round-robin repartition (with its sort-before-repartition
    # local sort, SPARK-23207) of the fully-derived ~100 B rows; now only
    # the key column crosses the wire and derivation runs after.  Rows
    # are identical: every column is a pure function of k (sqlgen).
    # (A production Iceberg source has real file splits and skips this.)
    lineitem = load_table(spark, sf_dir, "lineitem")
    keys = (lineitem
            .selectExpr("CAST(l_orderkey AS BIGINT) * 8 "
                        "+ CAST(l_linenumber AS BIGINT) AS k")
            .repartition(spark.sparkContext.defaultParallelism, "k")
            .distinct())
    pts = keys.selectExpr(*sqlgen.points_exprs(
        "spark", ["doc_key", "doc_id", "mx", "my", "textline"]))
    span = lambda kind, text, media, off: F.struct(  # noqa: E731
        F.lit(kind).alias("kind"),
        text.alias("text"),
        media.alias("media_ref"),
        F.lit(off).cast("int").alias("offset"),
    )
    spans = F.array(
        span("text", F.col("textline"), F.lit(""), 0),
        span("geo", F.format_string("POINT(%d %d)", "mx", "my"), F.lit(""), 1),
        span("media", F.lit(""),
             F.format_string("s3://media/%d.bin", "doc_key"), 2),
    )
    return pts.select(F.col("doc_id"), spans.alias("spans"))


def query_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(box_id, xmin, ymin, xmax, ymax) in milli ints, from part."""
    load_table(spark, sf_dir, "part")
    return spark.sql(sqlgen.boxes_cte("spark"))


def data_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dbox_id, xmin, ymin, xmax, ymax): box-geometry DATA entries
    (one per document), from lineitem."""
    load_table(spark, sf_dir, "lineitem")
    return spark.sql(sqlgen.data_boxes_cte("spark"))


def knn_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(qid, qmx, qmy, qx, qy) kNN probe points, from orders."""
    load_table(spark, sf_dir, "orders")
    return spark.sql(sqlgen.knn_queries_cte("spark"))


def polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convex hexagons (poly_id, vx0..vy5, bbox) from part."""
    load_table(spark, sf_dir, "part")
    return spark.sql(sqlgen.polygons_cte("spark"))


def polygons_concave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concave star polygons (poly_id, vxs, vys arrays, bbox) from part
    — variable vertex count (8/10/12), genuinely concave."""
    load_table(spark, sf_dir, "part")
    return spark.sql(sqlgen.concave_polygons_cte("spark"))
