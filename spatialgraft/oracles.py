"""DuckDB oracle SQL for every engine operator (single source of truth —
used by __spark_entry__.oracle_sql() and by the pytest suite)."""

from __future__ import annotations

from . import config as C
from . import sqlgen

HOTSPOT = (150000, 100000, 170000, 110000)


def all_oracles(k: int = C.DEFAULT_K) -> dict[str, str]:
    pts = sqlgen.points_cte()
    boxes = sqlgen.boxes_cte()
    q = sqlgen.knn_queries_cte()
    polys = sqlgen.polygons_cte()
    x0, y0, x1, y1 = HOTSPOT
    d2 = "(q.qx - p.x)*(q.qx - p.x) + (q.qy - p.y)*(q.qy - p.y)"
    return {
        "range_join_count": (
            f"WITH pts AS ({pts}), boxes AS ({boxes}) "
            "SELECT b.box_id AS box_id, COUNT(*) AS cnt "
            "FROM boxes b JOIN pts p "
            "ON p.mx BETWEEN b.xmin AND b.xmax "
            "AND p.my BETWEEN b.ymin AND b.ymax GROUP BY 1"),
        "range_join_pairs": (
            f"WITH pts AS ({pts}), boxes AS ({boxes}) "
            "SELECT b.box_id AS box_id, p.doc_key AS doc_key "
            "FROM boxes b JOIN pts p "
            "ON p.mx BETWEEN b.xmin AND b.xmax "
            "AND p.my BETWEEN b.ymin AND b.ymax"),
        "range_filter": (
            f"WITH pts AS ({pts}) SELECT doc_key, mx, my FROM pts "
            f"WHERE mx BETWEEN {x0} AND {x1} AND my BETWEEN {y0} AND {y1}"),
        "spatio_textual_filter": (
            f"WITH pts AS ({pts}) SELECT doc_key FROM pts "
            f"WHERE mx BETWEEN {x0} AND {x1} AND my BETWEEN {y0} AND {y1} "
            "AND lower(textline) LIKE '%flag r%'"),
        "knn_join": (
            f"WITH pts AS ({pts}), q AS ({q}), "
            f"pairs AS (SELECT q.qid, p.doc_key, {d2} AS dist2, "
            f"ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY {d2}, "
            "p.doc_key) AS rnk FROM q CROSS JOIN pts p) "
            "SELECT qid, doc_key, dist2, rnk FROM pairs "
            f"WHERE rnk <= {k}"),
        "pip_join_count": (
            f"WITH pts AS ({pts}), polys AS ({polys}) "
            "SELECT g.poly_id AS poly_id, COUNT(*) AS cnt "
            "FROM polys g JOIN pts p "
            "ON p.mx BETWEEN g.xmin AND g.xmax "
            "AND p.my BETWEEN g.ymin AND g.ymax "
            f"WHERE {sqlgen.pip_predicate('p.mx', 'p.my', 'g.')} "
            "GROUP BY 1"),
        "pip_concave": (
            f"WITH pts AS ({pts}), "
            f"polys AS ({sqlgen.concave_polygons_cte()}) "
            "SELECT g.poly_id AS poly_id, COUNT(*) AS cnt "
            "FROM polys g JOIN pts p "
            "ON p.mx BETWEEN g.xmin AND g.xmax "
            "AND p.my BETWEEN g.ymin AND g.ymax "
            f"WHERE {sqlgen.pip_concave_predicate('p.mx', 'p.my', 'g.vxs', 'g.vys', 'duckdb')} "
            "GROUP BY 1"),
        "tiles_points": (
            f"WITH pts AS ({pts}) SELECT doc_key, "
            f"((mx * {C.TILE_TX}) // {C.WORLD_MX}) * {C.TILE_TY} "
            f"+ ((my * {C.TILE_TY}) // {C.WORLD_MY}) AS tile FROM pts"),
        "tiles_boxes": (
            f"WITH boxes AS ({boxes}), "
            "bx AS (SELECT box_id, ymin, ymax, "
            f"unnest(generate_series((xmin * {C.TILE_TX}) // {C.WORLD_MX}, "
            f"(xmax * {C.TILE_TX}) // {C.WORLD_MX})) AS tx FROM boxes), "
            "bxy AS (SELECT box_id, tx, "
            f"unnest(generate_series((ymin * {C.TILE_TY}) // {C.WORLD_MY}, "
            f"(ymax * {C.TILE_TY}) // {C.WORLD_MY})) AS ty FROM bx) "
            f"SELECT box_id, tx * {C.TILE_TY} + ty AS tile FROM bxy"),
    }


# ------------------------------------------------------------------------
# Training-data pipeline oracles (documents / embeddings tables).
# Same arithmetic as spatialgraft.pipeline.* — left folds and integer
# hashing reproduce Spark's values bit-exactly.

_TOKS = "string_split_regex(trim(text), ' +')"


def _fold(s: str, p: int = C.FP2_P1, m: int = C.FP2_M1) -> str:
    # BIGINT seed is mandatory: acc*P must fold in int64 (P*M+255 < 2^63)
    return (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"[CAST(ascii(c) AS BIGINT) for c in string_split({s}, '')]), "
            f"(a, b) -> (a * {p} + b) % {m})")


def _fold2(s: str) -> str:
    return _fold(s, C.FP2_P2, C.FP2_M2)


def _shingles_cte() -> str:
    k = C.SHINGLE_K
    return (
        f"toks AS (SELECT doc_id, {_TOKS} AS t FROM documents), "
        "shs AS (SELECT doc_id, unnest([array_to_string(t[i:i+"
        f"{k - 1}], ' ') for i in range(1, len(t) - {k - 2})]) AS s "
        f"FROM toks WHERE len(t) >= {k}), "
        f"sh AS (SELECT DISTINCT doc_id, {_fold('s')} AS h1, "
        f"{_fold2('s')} AS h2 FROM shs)")


def _dot(a: str, b: str) -> str:
    return (f"list_reduce(list_prepend(0.0, "
            f"[CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
            f"for i in range(1, len({a}) + 1)]), (x, y) -> x + y)")


def _ann_proj(col: str, bi: int) -> str:
    """Signed hyperplane projection — IEEE-identical twin of
    pipeline.similarity._proj_expr (left fold, sign * value order)."""
    from .pipeline.similarity import ann_signs
    lits = ", ".join(f"{s:.1f}" for s in ann_signs(bi))
    return (f"list_reduce(list_prepend(0.0, "
            f"[([{lits}])[d] * CAST({col}[d] AS DOUBLE) "
            f"for d in range(1, {C.EMB_DIM + 1})]), (x, y) -> x + y)")


def _ann_sig(col: str, band: int) -> str:
    terms = [f"(CASE WHEN {_ann_proj(col, band * C.ANN_BAND_BITS + i)} "
             f">= 0 THEN {1 << i} ELSE 0 END)"
             for i in range(C.ANN_BAND_BITS)]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def _band_sigs_cte(table: str = "embeddings") -> str:
    selects = [f"SELECT vec_id, {band} AS band, "
               f"{_ann_sig('embedding', band)} AS sig FROM {table}"
               for band in range(C.ANN_BANDS)]
    return "sigs AS (" + " UNION ALL ".join(selects) + ")"


def pipeline_oracles() -> dict[str, str]:
    stops = ", ".join(f"'{w}'" for w in C.STOP_WORDS)
    n_tok = f"len({_TOKS})"
    n_stop = f"len(list_filter({_TOKS}, t -> t IN ({stops})))"

    lang_case = "CASE "
    scores = []
    for lang, st in C.LANG_STOPS:
        inl = ", ".join(f"'{w}'" for w in st)
        scores.append((lang, f"len(list_filter({_TOKS}, "
                             f"t -> t IN ({inl})))"))
    for i, (lang, s) in enumerate(scores):
        others = " AND ".join(f"{s} >= {s2}"
                              for j, (_, s2) in enumerate(scores) if j > i)
        cond = f"{s} > 0" + (f" AND {others}" if others else "")
        lang_case += f"WHEN {cond} THEN '{lang}' "
    lang_case += "ELSE 'unknown' END"

    sig_cols = ", ".join(
        f"min(((h1 % {C.FP_MOD}) * {a} + {b}) % {C.FP_MOD}) AS s{i}"
        for i, (a, b) in enumerate(zip(C.MINHASH_A, C.MINHASH_B)))
    band_selects = []
    for band in range(C.MINHASH_BANDS):
        lo = band * C.MINHASH_ROWS
        mix = f"s{lo}"
        for r in range(1, C.MINHASH_ROWS):
            mix = f"(({mix}) * {C.BAND_MIX} + s{lo + r}) % {C.FP_MOD}"
        band_selects.append(
            f"SELECT doc_id, {band} AS band, {mix} AS bh FROM sig")
    bands_cte = " UNION ALL ".join(band_selects)

    sum_cols = ", ".join(
        f"sum(CASE WHEN (h1 >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(C.SIMHASH_BITS))
    bit_sum = " + ".join(
        f"(CASE WHEN b{j} >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(C.SIMHASH_BITS))

    cos = (f"({_dot('qemb', 'embedding')}) / "
           f"(sqrt({_dot('qemb', 'qemb')}) * "
           f"sqrt({_dot('embedding', 'embedding')}))")

    mk = "(CAST(l_orderkey AS BIGINT) * 8 + CAST(l_linenumber AS BIGINT))"

    return {
        "token_stats": (
            "SELECT doc_id, "
            f"CAST({n_tok} AS BIGINT) AS n_tokens, "
            "CAST(length(text) AS BIGINT) AS n_chars_m, "
            f"CAST(length(replace(text, ' ', '')) AS DOUBLE) / {n_tok} "
            "AS avg_token_len, "
            f"CAST({n_stop} AS DOUBLE) / {n_tok} AS stopword_ratio, "
            f"LEAST(CAST({n_tok} AS DOUBLE) / 100.0, 1.0) * "
            f"(1.0 - ABS(CAST({n_stop} AS DOUBLE) / {n_tok} - 0.4)) "
            "AS quality FROM documents"),
        "lang_id": (
            f"SELECT doc_id, {lang_case} AS lang_pred FROM documents"),
        "fingerprint": (
            f"SELECT doc_id, {_fold('text')} AS fp1, "
            f"{_fold2('text')} AS fp2 FROM documents"),
        "exact_dedup": (
            f"SELECT min(doc_id) AS keep_id, COUNT(*) AS n_dups "
            f"FROM (SELECT doc_id, {_fold('text')} AS fp1, "
            f"{_fold2('text')} AS fp2 FROM documents) "
            "GROUP BY fp1, fp2"),
        "ngram_jaccard": (
            # shc = the df-capped shingle space (stop-shingle filter) —
            # the exact twin of dedup.ngram_jaccard_pairs(df_cap=...)
            f"WITH {_shingles_cte()}, "
            "keep AS (SELECT h1, h2 FROM sh GROUP BY h1, h2 "
            f"HAVING COUNT(*) <= {C.NGRAM_DF_CAP}), "
            "shc AS (SELECT sh.doc_id, sh.h1, sh.h2 FROM sh "
            "JOIN keep USING (h1, h2)), "
            "sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc "
            "GROUP BY doc_id), "
            "common AS (SELECT a.doc_id AS id1, b.doc_id AS id2, "
            "COUNT(*) AS c FROM shc a JOIN shc b ON a.h1 = b.h1 "
            "AND a.h2 = b.h2 AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT id1, id2, CAST(c AS DOUBLE) / (n1.n + n2.n - c) "
            "AS jaccard FROM common "
            "JOIN sizes n1 ON n1.doc_id = id1 "
            "JOIN sizes n2 ON n2.doc_id = id2 "
            "WHERE CAST(c AS DOUBLE) / (n1.n + n2.n - c) >= 0.5"),
        "minhash_lsh": (
            f"WITH {_shingles_cte()}, "
            f"sig AS (SELECT doc_id, {sig_cols} FROM sh GROUP BY doc_id), "
            f"bands AS ({bands_cte}) "
            "SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2 "
            "FROM bands a JOIN bands b "
            "ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id"),
        "simhash": (
            f"WITH {_shingles_cte()}, "
            f"sums AS (SELECT doc_id, {sum_cols} FROM sh GROUP BY doc_id) "
            f"SELECT doc_id, CAST({bit_sum} AS BIGINT) AS sh FROM sums"),
        "simhash_pairs": (
            f"WITH {_shingles_cte()}, "
            f"sums AS (SELECT doc_id, {sum_cols} FROM sh GROUP BY doc_id), "
            f"s AS (SELECT doc_id, CAST({bit_sum} AS BIGINT) AS sh "
            "FROM sums) "
            "SELECT a.doc_id AS id1, b.doc_id AS id2, "
            "CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming "
            "FROM s a, s b WHERE a.doc_id < b.doc_id "
            "AND CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) <= "
            f"{C.SIMHASH_MAX_HAMMING}"),
        "cosine_topk": (
            "WITH probes AS (SELECT vec_id AS qid, embedding AS qemb "
            f"FROM embeddings WHERE vec_id % {C.ANN_QUERY_MOD} = 0), "
            f"pairs AS (SELECT qid, vec_id, {cos} AS cosine "
            "FROM embeddings CROSS JOIN probes WHERE vec_id <> qid), "
            "ranked AS (SELECT qid, vec_id, cosine, ROW_NUMBER() OVER "
            "(PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rnk "
            "FROM pairs) SELECT qid, vec_id, cosine, rnk FROM ranked "
            f"WHERE rnk <= {C.ANN_K}"),
        "lsh_ann": (
            f"WITH {_band_sigs_cte()}, "
            "probes AS (SELECT vec_id AS qid, band, sig FROM sigs "
            f"WHERE vec_id % {C.ANN_QUERY_MOD} = 0), "
            "cand AS (SELECT DISTINCT p.qid, s.vec_id FROM sigs s "
            "JOIN probes p USING (band, sig) WHERE s.vec_id <> p.qid), "
            f"pairs AS (SELECT qid, c.vec_id, {cos} AS cosine "
            "FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id "
            "JOIN (SELECT vec_id, embedding AS qemb FROM embeddings) q "
            "ON q.vec_id = c.qid), "
            "ranked AS (SELECT qid, vec_id, cosine, ROW_NUMBER() OVER "
            "(PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rnk "
            "FROM pairs) SELECT qid, vec_id, cosine, rnk FROM ranked "
            f"WHERE rnk <= {C.ANN_K}"),
        "media_decode": (
            "SELECT k AS doc_key, "
            "printf('s3://media/%d.bin', k) AS media_ref, "
            "CAST(16 + k % 16 AS INTEGER) AS width, "
            "CAST(16 + (k * 7) % 16 AS INTEGER) AS height, "
            f"CAST((k * {C.PT_A1}) % 256 AS DOUBLE) AS mean_px, "
            "CAST(1 + k % 4 AS INTEGER) AS n_frames "
            f"FROM (SELECT DISTINCT {mk} AS k FROM lineitem) b"),
        # Predicts the DECODED statistics of the real codec path from
        # the content arithmetic (config.MEDIA_*) — independent of the
        # PNG/WAV byte formats, so it cross-checks BOTH codec
        # directions in mediacodec.py.  The i < n_values index join
        # replaces a correlated generate_series (unsupported).
        "media_decode_real": (
            f"WITH ks AS (SELECT DISTINCT {mk} AS k FROM lineitem), "
            "idx AS (SELECT i FROM generate_series(0, "
            f"{C.MEDIA_MAX_PIXELS - 1}) t(i)), "
            "img AS (SELECT k, 'image' AS kind, "
            "CAST(8 + k % 9 AS INTEGER) AS width, "
            "CAST(8 + (k * 3) % 9 AS INTEGER) AS height, "
            "0 AS sample_rate, "
            "CAST((8 + k % 9) * (8 + (k * 3) % 9) AS INTEGER) "
            "AS n_samples, "
            f"CAST(SUM((k * {C.MEDIA_PIX_A} + i * {C.MEDIA_PIX_B}) "
            "% 256) AS DOUBLE) / ((8 + k % 9) * (8 + (k * 3) % 9)) "
            "AS mean_val "
            "FROM ks JOIN idx ON i < (8 + k % 9) * (8 + (k * 3) % 9) "
            "WHERE k % 2 = 0 GROUP BY k), "
            "aud AS (SELECT k, 'audio' AS kind, 0 AS width, "
            "0 AS height, "
            "CAST(8000 + (k % 4) * 4000 AS INTEGER) AS sample_rate, "
            "CAST(64 + k % 64 AS INTEGER) AS n_samples, "
            f"CAST(SUM((k * {C.MEDIA_AUD_A} + i * {C.MEDIA_AUD_B}) "
            "% 65536 - 32768) AS DOUBLE) / (64 + k % 64) AS mean_val "
            "FROM ks JOIN idx ON i < 64 + k % 64 "
            "WHERE k % 2 = 1 GROUP BY k) "
            "SELECT k AS doc_key, kind, "
            "CAST(width AS INTEGER) AS width, "
            "CAST(height AS INTEGER) AS height, "
            "CAST(sample_rate AS INTEGER) AS sample_rate, "
            "n_samples, mean_val FROM "
            "(SELECT * FROM img UNION ALL SELECT * FROM aud)"),
    }


def misc_oracles() -> dict[str, str]:
    pts = sqlgen.points_cte()
    x0, y0, x1, y1 = HOTSPOT
    cell = (f"((mx * {C.CELL_CX}) // {C.WORLD_MX}) * {C.CELL_CY} "
            f"+ ((my * {C.CELL_CY}) // {C.WORLD_MY})")
    qmx, qmy = 160000, 105000
    qx, qy = (qmx - 180000) / 1000.0, (qmy - 90000) / 1000.0
    d2 = f"(x - ({qx}))*(x - ({qx})) + (y - ({qy}))*(y - ({qy}))"
    return {
        "multiget": (
            f"WITH pts AS ({pts}), "
            "keys AS (SELECT mx AS kmx, my AS kmy FROM pts "
            "WHERE doc_key % 97 = 0) "
            "SELECT p.doc_key AS doc_key, p.mx AS mx, p.my AS my "
            "FROM pts p JOIN keys k ON p.mx = k.kmx AND p.my = k.kmy"),
        "nearest_k": (
            f"WITH pts AS ({pts}), "
            f"d AS (SELECT doc_key, {d2} AS dist2 FROM pts) "
            "SELECT doc_key, dist2, ROW_NUMBER() OVER "
            "(ORDER BY dist2, doc_key) AS rnk FROM d "
            "ORDER BY dist2, doc_key LIMIT 25"),
        "count_in_box": (
            f"WITH pts AS ({pts}) SELECT COUNT(*) AS cnt FROM pts "
            f"WHERE mx BETWEEN {x0} AND {x1} AND my BETWEEN {y0} AND {y1}"),
        "cell_histogram": (
            f"WITH pts AS ({pts}) "
            f"SELECT {cell} AS cell, COUNT(*) AS cnt FROM pts GROUP BY 1"),
        "to_wkt": (
            f"WITH pts AS ({pts}) "
            "SELECT doc_key, printf('POINT(%.3f %.3f)', x, y) AS wkt "
            "FROM pts"),
    }


def extension_oracles(k_st: int = 5) -> dict[str, str]:
    """Oracles for the F3/multiput/F6 extensions and the promoted
    pytest-only operators (salted join, indexed filter, checkpoint
    resume, streaming batch twin) — semantics-level SQL; the engine's
    physical tricks (salting, reference-point dedup, manifests) must be
    invisible in the result."""
    pts = sqlgen.points_cte()
    boxes = sqlgen.boxes_cte()
    dbx = sqlgen.data_boxes_cte()
    q = sqlgen.knn_queries_cte()
    x0, y0, x1, y1 = HOTSPOT
    d2 = "(q.qx - p.x)*(q.qx - p.x) + (q.qy - p.y)*(q.qy - p.y)"
    rjc = (
        f"WITH pts AS ({pts}), boxes AS ({boxes}) "
        "SELECT b.box_id AS box_id, COUNT(*) AS cnt "
        "FROM boxes b JOIN pts p "
        "ON p.mx BETWEEN b.xmin AND b.xmax "
        "AND p.my BETWEEN b.ymin AND b.ymax GROUP BY 1")
    emx = f"((CAST(event_id AS BIGINT) * {C.PT_A1} + 99991) % {C.WORLD_MX})"
    emy = f"((CAST(event_id AS BIGINT) * {C.PT_A2} + 77773) % {C.WORLD_MY})"
    tile = (f"(({emx} * {C.TILE_TX}) // {C.WORLD_MX}) * {C.TILE_TY} "
            f"+ (({emy} * {C.TILE_TY}) // {C.WORLD_MY})")
    return {
        "intersects_join": (
            f"WITH dbx AS ({dbx}), boxes AS ({boxes}) "
            "SELECT b.box_id AS box_id, d.dbox_id AS dbox_id "
            "FROM boxes b JOIN dbx d "
            "ON d.xmin <= b.xmax AND b.xmin <= d.xmax "
            "AND d.ymin <= b.ymax AND b.ymin <= d.ymax"),
        "multiput_get": (
            f"WITH pts AS ({pts}), "
            "base AS (SELECT mx, my, CAST(1 AS BIGINT) AS v FROM pts), "
            "upd AS (SELECT mx, my, CAST(100 AS BIGINT) AS v FROM pts "
            "WHERE doc_key % 97 = 0), "
            "merged AS (SELECT mx, my, CAST(SUM(v) AS BIGINT) AS v "
            "FROM (SELECT * FROM base UNION ALL SELECT * FROM upd) u "
            "GROUP BY mx, my), "
            "keys AS (SELECT DISTINCT mx, my FROM pts "
            "WHERE doc_key % 97 = 0) "
            "SELECT m.mx AS mx, m.my AS my, m.v AS v "
            "FROM merged m JOIN keys USING (mx, my)"),
        "spatio_textual_knn": (
            f"WITH pts AS ({pts}), q AS ({q}), "
            "f AS (SELECT * FROM pts "
            "WHERE lower(textline) LIKE '%flag r%'), "
            f"pairs AS (SELECT q.qid, p.doc_key, {d2} AS dist2, "
            f"ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY {d2}, "
            "p.doc_key) AS rnk FROM q CROSS JOIN f p) "
            "SELECT qid, doc_key, dist2, rnk FROM pairs "
            f"WHERE rnk <= {k_st}"),
        "range_join_count_salted": rjc,
        "checkpoint_range_join": rjc,
        "range_filter_indexed": (
            f"WITH pts AS ({pts}) SELECT doc_key, mx, my FROM pts "
            f"WHERE mx BETWEEN {x0} AND {x1} AND my BETWEEN {y0} AND {y1}"),
        "tile_rollup": (
            # epoch_us//...: integer floor — CAST(epoch(ts) AS BIGINT)
            # would ROUND the fractional second and shift boundary rows
            "SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 300000000) "
            f"* 300 AS window_start_s, {tile} AS tile, COUNT(*) AS cnt "
            "FROM events GROUP BY 1, 2"),
    }


def cosine_dedup_oracle(tau: float = 0.99) -> str:
    cos = (f"({_dot('qemb', 'embedding')}) / "
           f"(sqrt({_dot('qemb', 'qemb')}) * "
           f"sqrt({_dot('embedding', 'embedding')}))")
    return (
        f"WITH {_band_sigs_cte()}, "
        "cand AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2 "
        "FROM sigs a JOIN sigs b USING (band, sig) "
        "WHERE a.vec_id < b.vec_id) "
        f"SELECT id1, id2, {cos} AS cosine "
        "FROM cand c "
        "JOIN (SELECT vec_id, embedding AS qemb FROM embeddings) q "
        "ON q.vec_id = c.id1 "
        "JOIN embeddings e ON e.vec_id = c.id2 "
        f"WHERE {cos} >= {tau}")
