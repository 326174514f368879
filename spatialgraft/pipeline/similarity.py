"""Similarity search over the `embeddings` table (vec_id, embedding
array<float>[EMB_DIM], label).

cosine_topk: brute-force exact top-k by cosine — the correctness
baseline (labeled as such; at scale it exists to validate the LSH
path on samples).  Dot products are computed as a left-fold over
zip_with(double-cast) so the DuckDB oracle reproduces the exact IEEE
sum order.

lsh_ann / cosine_dedup_pairs: the scale path — multi-band random
hyperplane LSH.  Each vector gets ANN_BANDS signatures of
ANN_BAND_BITS sign bits (deterministic +-1 hyperplanes shared with the
oracle); candidates are pairs agreeing on at least one full band
signature (union of per-band equi-joins), then exact cosine
verifies/ranks.  No cross join, no probe broadcast requirement: both
sides shuffle on (band, sig).  Deterministic semantics (not
"approximately right"), so it oracles exactly.
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

_COS = (f"({DOT.format(a='qemb', b='embedding')}) / "
        f"(sqrt({NORM2.format(a='qemb')}) * "
        f"sqrt({NORM2.format(a='embedding')}))")


def ann_signs(bi: int) -> list[float]:
    """Deterministic +-1 hyperplane for global bit index `bi` — the
    single source of truth for Spark AND the DuckDB oracle."""
    return [1.0 if ((bi * 1024 + d) * C.ANN_SIGN_A) % C.ANN_SIGN_K % 2 == 0
            else -1.0
            for d in range(1, C.EMB_DIM + 1)]


def _proj_expr(col: str, bi: int) -> str:
    """Signed projection of `col` on hyperplane bi (left fold, IEEE
    order mirrored in oracles._ann_proj)."""
    lits = ", ".join(f"{s:.1f}D" for s in ann_signs(bi))
    return (f"aggregate(zip_with(array({lits}), {col}, "
            f"(x, y) -> x * CAST(y AS DOUBLE)), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)")


def band_sig_expr(col: str, band: int) -> str:
    """ANN_BAND_BITS sign bits of band `band` packed into a BIGINT."""
    terms = [f"(CASE WHEN {_proj_expr(col, band * C.ANN_BAND_BITS + i)} "
             f">= 0 THEN {1 << i} ELSE 0 END)"
             for i in range(C.ANN_BAND_BITS)]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def band_signatures(emb: DataFrame, id_col: str = "vec_id",
                    emb_col: str = "embedding") -> DataFrame:
    """(id, band, sig): one row per (vector, band)."""
    pieces = [emb.selectExpr(id_col, f"{band} AS band",
                             band_sig_expr(emb_col, band) + " AS sig")
              for band in range(C.ANN_BANDS)]
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def _probe_ids(emb: DataFrame) -> DataFrame:
    return (emb.where(F.col("vec_id") % C.ANN_QUERY_MOD == 0)
            .select(F.col("vec_id").alias("qid"),
                    F.col("embedding").alias("qemb")))


def cosine_topk(emb: DataFrame, k: int = C.ANN_K) -> DataFrame:
    """(qid, vec_id, cosine, rnk): exact top-k cosine neighbors of each
    probe vector (self excluded), rnk ordered by (-cosine, vec_id)."""
    probes = F.broadcast(_probe_ids(emb))
    pairs = (emb.crossJoin(probes)
             .where(F.col("vec_id") != F.col("qid"))
             .selectExpr("qid", "vec_id", f"{_COS} AS cosine"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    return (pairs.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("qid", "vec_id", "cosine", "rnk"))


def lsh_ann(emb: DataFrame, k: int = C.ANN_K) -> DataFrame:
    """(qid, vec_id, cosine, rnk): top-k among multi-band LSH candidates
    — vectors sharing >= 1 full band signature with the probe.  Both
    sides of the candidate join shuffle on (band, sig); the probe set is
    never broadcast, so query volume is unbounded."""
    sigs = band_signatures(emb)
    probes = (sigs.where(F.col("vec_id") % C.ANN_QUERY_MOD == 0)
              .withColumnRenamed("vec_id", "qid"))
    cand = (sigs.join(probes, on=["band", "sig"])
            .where(F.col("vec_id") != F.col("qid"))
            .select("qid", "vec_id").distinct())
    pairs = (cand
             .join(emb.select("vec_id", "embedding"), on="vec_id")
             .join(emb.selectExpr("vec_id AS qid", "embedding AS qemb"),
                   on="qid")
             .selectExpr("qid", "vec_id", f"{_COS} AS cosine"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    return (pairs.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("qid", "vec_id", "cosine", "rnk"))


def cosine_dedup_pairs(emb: DataFrame, tau: float = 0.99) -> DataFrame:
    """Embedding near-duplicate pairs: (id1, id2, cosine) with
    cosine >= tau among pairs sharing >= 1 band signature — banded
    candidate generation + exact verify, the embedding-dedup analogue
    of minhash_lsh_pairs."""
    sigs = band_signatures(emb)
    a = sigs.withColumnRenamed("vec_id", "id1")
    b = sigs.withColumnRenamed("vec_id", "id2")
    cand = (a.join(b, on=["band", "sig"])
            .where(F.col("id1") < F.col("id2"))
            .select("id1", "id2").distinct())
    return (cand
            .join(emb.selectExpr("vec_id AS id1", "embedding AS qemb"),
                  on="id1")
            .join(emb.selectExpr("vec_id AS id2", "embedding"), on="id2")
            .selectExpr("id1", "id2", f"{_COS} AS cosine")
            .where(F.col("cosine") >= tau))
