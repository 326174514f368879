"""Text-analysis operators over the `documents` table.

All JVM-side (codegen) expressions — split / lambda filter / aggregate —
no Python in the hot path.  Every output value is integer or a double
produced by arithmetic mirrored exactly in the DuckDB oracle
(spatialgraft.oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import config as C

TOKENS = "split(trim(text), ' +')"
_STOPS = ", ".join(f"'{w}'" for w in C.STOP_WORDS)


def token_stats(docs: DataFrame) -> DataFrame:
    """doc_id, n_tokens, n_chars_m (measured), avg_token_len,
    stopword_ratio, quality — length/stopword quality scoring."""
    toks = TOKENS
    n_tok = f"size({toks})"
    n_stop = f"size(filter({toks}, t -> t IN ({_STOPS})))"
    return docs.selectExpr(
        "doc_id",
        f"CAST({n_tok} AS BIGINT) AS n_tokens",
        "CAST(length(text) AS BIGINT) AS n_chars_m",
        f"CAST(length(replace(text, ' ', '')) AS DOUBLE) / {n_tok} "
        "AS avg_token_len",
        f"CAST({n_stop} AS DOUBLE) / {n_tok} AS stopword_ratio",
        # quality in [0,1]: long-enough docs with a natural stopword rate
        f"LEAST(CAST({n_tok} AS DOUBLE) / 100.0, 1.0) * "
        f"(1.0 - ABS(CAST({n_stop} AS DOUBLE) / {n_tok} - 0.4)) "
        "AS quality",
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """doc_id, lang_pred — stopword-hit language heuristic with a fixed
    tie order (first language in config.LANG_STOPS wins ties).

    Each language's score is computed ONCE in a projected column; the
    CASE then only compares columns — the expression stays O(L) instead
    of re-inlining every size(filter(...)) O(L^2) times (at 4 languages
    codegen CSE absorbed it, at 50+ it would not)."""
    toks = TOKENS
    score_cols = []
    for lang, stops in C.LANG_STOPS:
        inlist = ", ".join(f"'{w}'" for w in stops)
        score_cols.append(
            f"size(filter({toks}, t -> t IN ({inlist}))) AS _s_{lang}")
    scored = docs.selectExpr("doc_id", *score_cols)
    # CASE walks languages in fixed order; >= keeps the earlier language
    # on ties; all-zero -> 'unknown'
    expr = "CASE "
    langs = [lang for lang, _ in C.LANG_STOPS]
    for i, lang in enumerate(langs):
        s = f"_s_{lang}"
        others = " AND ".join(f"{s} >= _s_{l2}" for l2 in langs[i + 1:])
        cond = f"{s} > 0" + (f" AND {others}" if others else "")
        expr += f"WHEN {cond} THEN '{lang}' "
    expr += "ELSE 'unknown' END"
    return scored.selectExpr("doc_id", f"{expr} AS lang_pred")


def fingerprint(docs: DataFrame) -> DataFrame:
    """doc_id, fp1, fp2 — ~117-bit char-level rolling-hash fingerprint
    (two independent int64 polynomial folds, config.FP2_*; exact parity
    with the DuckDB folds; collision-free to ~2^58 docs)."""
    return docs.selectExpr(
        "doc_id",
        f"aggregate(split(text, ''), 0L, "
        f"(acc, c) -> (acc * {C.FP2_P1} + ascii(c)) % {C.FP2_M1}) AS fp1",
        f"aggregate(split(text, ''), 0L, "
        f"(acc, c) -> (acc * {C.FP2_P2} + ascii(c)) % {C.FP2_M2}) AS fp2")
