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


def test_ngram_df_cap_bounds_hot_shingle_join(spark):
    """Hot-shingle fixture: 60 docs all share one viral 3-gram.
    Uncapped, the inverted-index self-join sees every pair (f^2/2 rows
    for the viral key); with the df cap the stop-shingle is dropped
    BEFORE the join, join input shrinks, and only genuinely-similar
    pairs (whose shared shingles are rare) survive."""
    from spatialgraft.pipeline.dedup import (ngram_jaccard_pairs,
                                             shingle_hashes)
    n = 60
    viral = spark.range(n).selectExpr(
        "CAST(id AS STRING) AS doc_id",
        "printf('common viral shingle unique%d token%d end%d', "
        "id, id * 7, id * 13) AS text")
    neardup = spark.createDataFrame(
        [("d_a", "alpha beta gamma delta epsilon"),
         ("d_b", "alpha beta gamma delta zeta")],
        "doc_id string, text string")
    docs = viral.unionByName(neardup)

    # join-input bound: the viral shingle (df=60) is gone at cap=5
    sh = shingle_hashes(docs)
    from pyspark.sql import functions as F
    freq = sh.groupBy("h1", "h2").agg(F.count("*").alias("df"))
    capped_rows = (sh.join(freq.where("df <= 5"), on=["h1", "h2"])
                   .count())
    assert sh.count() == n * 4 + 6          # 4 shingles/doc + 3+3
    assert capped_rows == n * 3 + 6          # viral shingle dropped

    uncapped = ngram_jaccard_pairs(docs, tau=0.01, df_cap=None)
    capped = ngram_jaccard_pairs(docs, tau=0.01, df_cap=5)
    # uncapped: every viral pair shares the stop-shingle
    assert uncapped.count() >= n * (n - 1) // 2
    # capped: only the true near-dup pair remains (j = 2/4 over the
    # capped shingle space)
    rows = capped.collect()
    assert [(r["id1"], r["id2"], r["jaccard"]) for r in rows] \
        == [("d_a", "d_b", 0.5)]


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
