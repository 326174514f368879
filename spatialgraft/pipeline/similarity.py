"""Similarity search over the `embeddings` table (vec_id, embedding
array<float>, label).

cosine_topk: brute-force exact top-k by cosine — the correctness
baseline.  Dot products are computed as a left-fold over
zip_with(double-cast) so the DuckDB oracle reproduces the exact IEEE
sum order.  At scale the probe set is broadcast and the data side
streams (one pass, no shuffle until the rank window).

lsh_ann: the scale path — sign-bit LSH bucket (first D dims) as the
partition key; exact top-k *within bucket*.  Deterministic semantics
(not "approximately right"), so it oracles exactly too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import config as C

DOT = ("aggregate(zip_with({a}, {b}, "
       "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
       "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
NORM2 = ("aggregate({a}, CAST(0 AS DOUBLE), "
         "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")


def _probes(emb: DataFrame) -> DataFrame:
    return (emb.where(F.col("vec_id") % C.ANN_QUERY_MOD == 0)
            .select(F.col("vec_id").alias("qid"),
                    F.col("embedding").alias("qemb")))


def cosine_topk(emb: DataFrame, k: int = C.ANN_K) -> DataFrame:
    """(qid, vec_id, cosine, rnk): exact top-k cosine neighbors of each
    probe vector (self excluded), rnk ordered by (-cosine, vec_id)."""
    probes = F.broadcast(_probes(emb))
    dot = DOT.format(a="qemb", b="embedding")
    qn = NORM2.format(a="qemb")
    dn = NORM2.format(a="embedding")
    pairs = (emb.crossJoin(probes)
             .where(F.col("vec_id") != F.col("qid"))
             .selectExpr("qid", "vec_id",
                         f"({dot}) / (sqrt({qn}) * sqrt({dn})) AS cosine"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    return (pairs.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("qid", "vec_id", "cosine", "rnk"))


def _bucket_expr(col: str) -> str:
    """Sign-bit bucket over the first LSH_SIGN_DIMS dims (1-based idx)."""
    bits = " + ".join(
        f"(CASE WHEN CAST(element_at({col}, {j + 1}) AS DOUBLE) >= 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(C.LSH_SIGN_DIMS))
    return f"CAST({bits} AS BIGINT)"


def lsh_ann(emb: DataFrame, k: int = C.ANN_K) -> DataFrame:
    """(qid, vec_id, cosine, rnk): top-k within the probe's sign-LSH
    bucket — the bucketed approximate path (equi-join on bucket replaces
    the cross join; at 10^12 rows this is the only viable shape)."""
    data = emb.selectExpr("vec_id", "embedding",
                          _bucket_expr("embedding") + " AS bucket")
    probes = F.broadcast(
        _probes(emb).selectExpr("qid", "qemb",
                                _bucket_expr("qemb") + " AS bucket"))
    dot = DOT.format(a="qemb", b="embedding")
    qn = NORM2.format(a="qemb")
    dn = NORM2.format(a="embedding")
    pairs = (data.join(probes, on="bucket")
             .where(F.col("vec_id") != F.col("qid"))
             .selectExpr("qid", "vec_id",
                         f"({dot}) / (sqrt({qn}) * sqrt({dn})) AS cosine"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    return (pairs.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("qid", "vec_id", "cosine", "rnk"))


def cosine_dedup_pairs(emb: DataFrame, tau: float = 0.99) -> DataFrame:
    """Embedding near-duplicate pairs: (id1, id2, cosine) with
    cosine >= tau among same-LSH-bucket pairs — the scale shape for
    embedding dedup (bucket join bounds the candidate set; a full
    exact pass would be the cross join)."""
    data = emb.selectExpr("vec_id", "embedding",
                          _bucket_expr("embedding") + " AS bucket")
    a = data.selectExpr("vec_id AS id1", "embedding AS qemb", "bucket")
    b = data.selectExpr("vec_id AS id2", "embedding", "bucket")
    dot = DOT.format(a="qemb", b="embedding")
    qn = NORM2.format(a="qemb")
    dn = NORM2.format(a="embedding")
    return (a.join(b, on="bucket")
            .where(F.col("id1") < F.col("id2"))
            .selectExpr("id1", "id2",
                        f"({dot}) / (sqrt({qn}) * sqrt({dn})) AS cosine")
            .where(F.col("cosine") >= tau))
