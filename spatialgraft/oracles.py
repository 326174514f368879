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
