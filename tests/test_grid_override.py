"""Non-power-of-two grid override (ADVICE r5, medium): the grid knobs
SPARK_GRAFT_CELL_CX/_CY are deployment config; the kNN SAT ring-
expansion radii must span ANY grid, not just power-of-two dims — under
the old radii derivation a corner query on a 96x48 grid whose nearest
data sat beyond cell radius 64 matched no expansion radius and was
silently dropped (kNN returned < k rows).  Runs in a subprocess because
the grid constants bind at module import."""

import os
import subprocess
import sys
import textwrap

_INNER = textwrap.dedent('''
    import os
    assert os.environ["SPARK_GRAFT_CELL_CX"] == "96"
    from spatialgraft import config as C
    assert C.CELL_CX == 96 and C.CELL_CY == 48
    from spatialgraft.ops.knn import _EXPAND_RADII
    # the largest radius must reach the far edge of the grid
    assert max(_EXPAND_RADII) >= max(C.CELL_CX, C.CELL_CY) - 1, \\
        _EXPAND_RADII
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from spatialgraft.ops.knn import knn_join
    from spatialgraft.session import get_spark
    spark = get_spark("grid-override", cpus=4)
    # 30 points clustered in the far corner (cell_x ~ 95), queries in
    # the opposite corner (cell_x 0): every 3x3 ring is empty, so the
    # SAT expansion must reach radius ~CELL_CX - 1 = 95 to satisfy the
    # queries.  The old power-of-two radii cap (64 for a 96-wide grid)
    # made these queries vanish.
    pts = spark.createDataFrame(
        [(i, 358000 + (i * 37) % 1500, 178000 + (i * 53) % 1500)
         for i in range(30)], "doc_key bigint, mx bigint, my bigint"
    ).selectExpr("doc_key", "mx", "my",
                 "CAST(mx - 180000 AS DOUBLE) / 1000.0 AS x",
                 "CAST(my - 90000 AS DOUBLE) / 1000.0 AS y")
    qs = spark.createDataFrame(
        [(q, 1000 + q * 211, 1000 + q * 173) for q in range(5)],
        "qid bigint, qmx bigint, qmy bigint"
    ).selectExpr("qid", "qmx", "qmy",
                 "CAST(qmx - 180000 AS DOUBLE) / 1000.0 AS qx",
                 "CAST(qmy - 90000 AS DOUBLE) / 1000.0 AS qy")
    got = knn_join(pts, qs, k=10, materialize=True)
    n = got.count()
    assert n == 50, f"expected 5 queries x k=10 = 50 rows, got {n}"
    w = Window.partitionBy("qid").orderBy("dist2", "doc_key")
    want = (qs.crossJoin(pts)
            .withColumn("dist2", F.expr(
                "(qx - x) * (qx - x) + (qy - y) * (qy - y)"))
            .withColumn("rnk", F.row_number().over(w))
            .where("rnk <= 10").select("qid", "doc_key", "dist2", "rnk"))
    wv = sorted(map(tuple, want.collect()))
    assert sorted(map(tuple, got.collect())) == wv
    # the lazy path walks the same expansion subtree
    lz = knn_join(pts, qs, k=10, materialize=False)
    assert sorted(map(tuple, lz.collect())) == wv
    spark.stop()
    print("GRID-OK")
''')


def test_knn_under_non_power_of_two_grid():
    env = dict(os.environ, SPARK_GRAFT_CELL_CX="96",
               SPARK_GRAFT_CELL_CY="48", SPARK_GRAFT_CPUS="4",
               SPARK_GRAFT_SHUFFLE="8")
    r = subprocess.run([sys.executable, "-c", _INNER], env=env,
                       capture_output=True, text=True, timeout=600,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert "GRID-OK" in r.stdout
