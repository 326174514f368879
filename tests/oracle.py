"""DuckDB oracle helpers mirroring the driver's correctness gate:
row-count + schema-width + order-insensitive value comparison."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def assert_df_matches_sql(spark_df, sql: str, sf_dir: str) -> None:
    got = spark_df.toPandas()
    want = duck_con(sf_dir).execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), \
        f"columns differ: {sorted(got.columns)} vs {sorted(want.columns)}"
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(g) == len(w), f"row count {len(g)} != oracle {len(w)}"
    pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                  check_exact=True)
