"""Multi-band hyperplane LSH guards: bucket occupancy must be far below
n (the old single 8-bit table packed ~n/256 per bucket), signatures must
be balanced across buckets, and the candidate join must not degenerate
to a cross join."""

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from spatialgraft import config as C
from spatialgraft.pipeline.similarity import band_signatures
from spatialgraft.session import load_table


def test_band_bucket_occupancy(spark, sf_correct):
    emb = load_table(spark, sf_correct, "embeddings")
    n = emb.count()
    occ = (band_signatures(emb).groupBy("band", "sig")
           .agg(F.count("*").alias("c")))
    stats = occ.agg(F.max("c").alias("mx"),
                    F.count("*").alias("buckets")).collect()[0]
    # clustered fixture: the hottest bucket must still be a small
    # fraction of the table, and buckets must be numerous
    assert stats["mx"] <= n * 0.1, \
        f"hot bucket {stats['mx']} of {n} — banding too coarse"
    assert stats["buckets"] >= C.ANN_BANDS * 50


def test_lsh_ann_plan_no_cartesian(spark, sf_smoke):
    for name in ("lsh_ann", "cosine_dedup"):
        df = entrymod.queries()[name](spark, sf_smoke)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_sign_hyperplanes_balanced():
    from spatialgraft.pipeline.similarity import ann_signs
    for bi in range(C.ANN_BANDS * C.ANN_BAND_BITS):
        s = ann_signs(bi)
        pos = sum(1 for v in s if v > 0)
        assert C.EMB_DIM * 0.25 <= pos <= C.EMB_DIM * 0.75, (bi, pos)
