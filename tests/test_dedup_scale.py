"""Scale-honesty guards for the dedup suite: the ~117-bit fingerprint
must not falsely merge distinct docs at 10^6 scale (the old 31-bit fold
collided from ~50k docs), and simhash_pairs must plan as a banded
equi-join, never a cartesian product."""

import __spark_entry__ as entrymod
from spatialgraft import config as C


def test_fingerprint_no_false_merges_at_1e6(spark):
    # 10^6 distinct synthetic docs -> 10^6 distinct (fp1, fp2) pairs.
    # Varied lengths + shared prefixes stress the fold harder than
    # uniform random strings would.
    n = 1_000_000
    docs = spark.range(n).selectExpr(
        "printf('doc %d body %s tail %d', id, "
        "repeat('x', CAST(id % 37 AS INT)), id * 2654435761) AS text")
    distinct = (docs.selectExpr(
        f"aggregate(split(text, ''), 0L, (acc, c) -> "
        f"(acc * {C.FP2_P1} + ascii(c)) % {C.FP2_M1}) AS fp1",
        f"aggregate(split(text, ''), 0L, (acc, c) -> "
        f"(acc * {C.FP2_P2} + ascii(c)) % {C.FP2_M2}) AS fp2")
        .distinct().count())
    assert distinct == n, f"fingerprint collisions: {n - distinct}"


def test_simhash_pairs_plan_has_no_cartesian(spark, sf_smoke):
    df = entrymod.queries()["simhash_pairs"](spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_banding_recall_complete(spark, sf_correct):
    """Banded pairs == all-pairs filter (pigeonhole, hamming <= 3)."""
    from spatialgraft.pipeline.dedup import simhash, simhash_pairs
    from spatialgraft.session import load_table
    docs = load_table(spark, sf_correct, "documents")
    import pyspark.sql.functions as F
    s = simhash(docs)
    a, b = s.alias("a"), s.alias("b")
    brute = (a.crossJoin(b)
             .where(F.col("a.doc_id") < F.col("b.doc_id"))
             .withColumn("hamming",
                         F.expr("CAST(bit_count(a.sh ^ b.sh) AS BIGINT)"))
             .where(F.col("hamming") <= C.SIMHASH_MAX_HAMMING)
             .select(F.col("a.doc_id").alias("id1"),
                     F.col("b.doc_id").alias("id2"), "hamming"))
    cols = ["id1", "id2", "hamming"]
    got = (simhash_pairs(docs).toPandas()
           .sort_values(cols).reset_index(drop=True))
    want = brute.toPandas().sort_values(cols).reset_index(drop=True)
    assert got[cols].equals(want[cols])
