"""Deduplication suite over the `documents` table.

Exact dedup, n-gram Jaccard, MinHash+LSH banding, and SimHash — each as
DataFrame compositions (explode / groupBy / self-join) with all hashing
done by shared integer arithmetic (config.FP_MOD polynomial fold), so the
DuckDB oracles reproduce results exactly.  At 100 TB every op here is
shuffle-by-key with bounded fan-out: shingles explode ~n_tokens rows per
doc, signatures are 8 ints per doc, band join keys are (band, hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import config as C
from .textstats import TOKENS

# ~117-bit fingerprint = two independent int64 polynomial folds
# (config.FP2_*); identical expression shape in the DuckDB oracle.
_FOLD1 = (f"aggregate(split({{s}}, ''), 0L, "
          f"(acc, c) -> (acc * {C.FP2_P1} + ascii(c)) % {C.FP2_M1})")
_FOLD2 = (f"aggregate(split({{s}}, ''), 0L, "
          f"(acc, c) -> (acc * {C.FP2_P2} + ascii(c)) % {C.FP2_M2})")


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by full-text fingerprint: (keep_id, n_dups).

    keep_id = min doc_id of the group; n_dups = group size.  The groupBy
    key is the ~117-bit (fp1, fp2) pair, never the text itself — false
    merges are birthday-bounded at ~2^58 docs."""
    return (docs.selectExpr("doc_id",
                            _FOLD1.format(s="text") + " AS fp1",
                            _FOLD2.format(s="text") + " AS fp2")
            .groupBy("fp1", "fp2")
            .agg(F.min("doc_id").alias("keep_id"),
                 F.count("*").alias("n_dups"))
            .select("keep_id", "n_dups"))


def shingle_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, h1, h2): distinct ~117-bit-hashed token 3-grams per doc."""
    sh = (f"transform(sequence(1, size({TOKENS}) - {C.SHINGLE_K - 1}), "
          f"i -> concat_ws(' ', slice({TOKENS}, i, {C.SHINGLE_K})))")
    return (docs.selectExpr("doc_id", f"{sh} AS shs")
            .where(f"size({TOKENS}) >= {C.SHINGLE_K}")
            .select("doc_id", F.explode("shs").alias("s"))
            .selectExpr("doc_id",
                        _FOLD1.format(s="s") + " AS h1",
                        _FOLD2.format(s="s") + " AS h2")
            .distinct())


def ngram_jaccard_pairs(docs: DataFrame, tau: float = 0.5,
                        df_cap: int | None = C.NGRAM_DF_CAP) -> DataFrame:
    """(id1, id2, jaccard) for pairs with 3-gram Jaccard >= tau.

    Shingle-inverted-index self-join (shuffle on h) -> common counts ->
    |A|+|B|-common denominator.  jaccard emitted as an exact ratio of
    BIGINTs cast to double.

    df_cap: stop-shingle filter — shingles whose document frequency
    exceeds df_cap are removed from the similarity space before the
    self-join (a shingle in f docs makes f^2/2 join rows; one viral
    3-gram otherwise quadratically dominates the h-key join at 100 TB).
    Jaccard is then over the capped shingle space: both `common` and the
    per-doc `sizes` see the same filtered set, and the DuckDB oracle
    applies the identical HAVING filter.  The frequency pass and the
    filter join share the (h1, h2) hash partitioning with the main
    self-join, so the cap costs one extra map-side-combined agg, not an
    extra shuffle pattern.  None disables the cap."""
    sh = shingle_hashes(docs)
    if df_cap is not None:
        hot = sh.groupBy("h1", "h2").agg(F.count("*").alias("_df"))
        sh = (sh.join(hot.where(F.col("_df") <= df_cap), on=["h1", "h2"])
              .drop("_df"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (a.join(b, on=["h1", "h2"])
              .where(F.col("a.doc_id") < F.col("b.doc_id"))
              .groupBy(F.col("a.doc_id").alias("id1"),
                       F.col("b.doc_id").alias("id2"))
              .agg(F.count("*").alias("c")))
    j = (common
         .join(sizes.withColumnRenamed("doc_id", "id1")
               .withColumnRenamed("n", "n1"), on="id1")
         .join(sizes.withColumnRenamed("doc_id", "id2")
               .withColumnRenamed("n", "n2"), on="id2")
         .withColumn("jaccard",
                     F.col("c").cast("double") /
                     (F.col("n1") + F.col("n2") - F.col("c"))))
    return j.where(F.col("jaccard") >= tau).select("id1", "id2", "jaccard")


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, s0..s{H-1}) MinHash signature."""
    sh = shingle_hashes(docs)
    # permutation slots live in 31-bit space (sketch width): project the
    # 59-bit shingle hash down first so h*A never overflows int64
    aggs = [F.min(F.expr(
        f"((h1 % {C.FP_MOD}) * {a} + {b}) % {C.FP_MOD}")).alias(f"s{i}")
        for i, (a, b) in enumerate(zip(C.MINHASH_A, C.MINHASH_B))]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(docs: DataFrame) -> DataFrame:
    """Candidate near-dup pairs (id1, id2) sharing any LSH band."""
    sig = minhash_signatures(docs)
    bands = None
    for band in range(C.MINHASH_BANDS):
        lo = band * C.MINHASH_ROWS
        mix = f"s{lo}"
        for r in range(1, C.MINHASH_ROWS):
            mix = f"(({mix}) * {C.BAND_MIX} + s{lo + r}) % {C.FP_MOD}"
        piece = sig.selectExpr("doc_id", f"{band} AS band",
                               f"{mix} AS bh")
        bands = piece if bands is None else bands.unionByName(piece)
    a, b = bands.alias("a"), bands.alias("b")
    return (a.join(b, on=["band", "bh"])
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("id1"),
                    F.col("b.doc_id").alias("id2"))
            .distinct())


def simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, sh): 16-bit SimHash over shingle hashes."""
    shd = shingle_hashes(docs)
    sums = shd.groupBy("doc_id").agg(*[
        F.sum(F.expr(
            f"CASE WHEN (h1 >> {j}) & 1 = 1 THEN 1 ELSE -1 END"))
        .alias(f"b{j}") for j in range(C.SIMHASH_BITS)])
    bits = " + ".join(
        f"(CASE WHEN b{j} >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(C.SIMHASH_BITS))
    return sums.selectExpr("doc_id", f"CAST({bits} AS BIGINT) AS sh")


def simhash_pairs(docs: DataFrame,
                  max_hamming: int = C.SIMHASH_MAX_HAMMING) -> DataFrame:
    """(id1, id2, hamming) pairs within the SimHash hamming threshold.

    Banded equi-join, never all-pairs: the 16-bit sketch splits into 4
    bands of 4 bits; by pigeonhole any pair with hamming <= 3 agrees
    exactly on at least one band, so the (band, bits) equi-join is
    recall-complete for the threshold.  Exact hamming verify + distinct
    (a pair may share several bands) finish the job — the same
    band->join->verify shape as minhash_lsh_pairs, O(n * band_width)
    shuffle instead of O(n^2)."""
    assert C.SIMHASH_BITS // C.SIMHASH_BANDS * C.SIMHASH_BANDS \
        == C.SIMHASH_BITS
    width = C.SIMHASH_BITS // C.SIMHASH_BANDS
    assert max_hamming < C.SIMHASH_BANDS, \
        "pigeonhole recall needs bands > max_hamming"
    s = simhash(docs)
    mask = (1 << width) - 1
    bands = None
    for band in range(C.SIMHASH_BANDS):
        piece = s.selectExpr(
            "doc_id", "sh", f"{band} AS band",
            f"(sh >> {band * width}) & {mask} AS bb")
        bands = piece if bands is None else bands.unionByName(piece)
    a, b = bands.alias("a"), bands.alias("b")
    return (a.join(b, on=["band", "bb"])
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .withColumn("hamming",
                        F.expr("CAST(bit_count(a.sh ^ b.sh) AS BIGINT)"))
            .where(F.col("hamming") <= max_hamming)
            .select(F.col("a.doc_id").alias("id1"),
                    F.col("b.doc_id").alias("id2"), "hamming")
            .distinct())
