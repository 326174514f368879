from spatialgraft import datagen, sqlgen
from spatialgraft.extract import with_geometry
from spatialgraft.ops import knn as kops
from spatialgraft.ops import pip as pops
from spatialgraft.ops import tiles as tops
from spatialgraft import config as C
from tests.oracle import assert_df_matches_sql


def engine_points(spark, sf_dir):
    return with_geometry(datagen.documents_spans(spark, sf_dir))


def knn_oracle_sql(k: int) -> str:
    return (f"WITH pts AS ({sqlgen.points_cte()}), "
            f"q AS ({sqlgen.knn_queries_cte()}), "
            "pairs AS (SELECT q.qid, p.doc_key, "
            " (q.qx - p.x)*(q.qx - p.x) + (q.qy - p.y)*(q.qy - p.y)"
            "   AS dist2, "
            " ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY "
            "   (q.qx - p.x)*(q.qx - p.x) + (q.qy - p.y)*(q.qy - p.y), "
            "   p.doc_key) AS rnk "
            " FROM q CROSS JOIN pts p) "
            f"SELECT qid, doc_key, dist2, rnk FROM pairs WHERE rnk <= {k}")


def test_knn_join_vs_oracle(spark, sf_smoke):
    pts = engine_points(spark, sf_smoke)
    q = datagen.knn_queries(spark, sf_smoke)
    got = kops.knn_join(pts, q, k=10)
    assert_df_matches_sql(got, knn_oracle_sql(10), sf_smoke)


def test_pip_join_vs_oracle(spark, sf_smoke):
    pts = engine_points(spark, sf_smoke)
    polys = datagen.polygons(spark, sf_smoke)
    got = pops.pip_join_count(pts, polys)
    pred = sqlgen.pip_predicate("p.mx", "p.my", "g.")
    sql = (f"WITH pts AS ({sqlgen.points_cte()}), "
           f"polys AS ({sqlgen.polygons_cte()}) "
           "SELECT g.poly_id AS poly_id, COUNT(*) AS cnt "
           "FROM polys g JOIN pts p "
           "ON p.mx BETWEEN g.xmin AND g.xmax "
           "AND p.my BETWEEN g.ymin AND g.ymax "
           f"WHERE {pred} GROUP BY 1")
    assert_df_matches_sql(got, sql, sf_smoke)


def test_tiles_vs_oracle(spark, sf_smoke):
    pts = engine_points(spark, sf_smoke)
    got = tops.assign_tiles_points(pts)
    sql = (f"WITH pts AS ({sqlgen.points_cte()}) "
           f"SELECT doc_key, ((mx * {C.TILE_TX}) // {C.WORLD_MX}) "
           f"* {C.TILE_TY} + ((my * {C.TILE_TY}) // {C.WORLD_MY}) AS tile "
           "FROM pts")
    assert_df_matches_sql(got, sql, sf_smoke)

    boxes = datagen.query_boxes(spark, sf_smoke)
    got2 = tops.tiles_for_boxes(boxes)
    from spatialgraft.oracles import all_oracles
    assert_df_matches_sql(got2, all_oracles()["tiles_boxes"], sf_smoke)
