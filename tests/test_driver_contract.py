"""Mirror of the driver's correctness gate: every queries() entry must
match its oracle_sql() on the same parquet tables (sf0.001 for speed;
the driver runs sf0.01)."""

import pytest

import __spark_entry__ as entrymod
from tests.oracle import assert_df_matches_sql

NAMES = sorted(entrymod.queries().keys())


def test_every_query_has_oracle_or_is_flagged():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    missing = set(o) - set(q)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_smoke, name):
    q = entrymod.queries()[name]
    o = entrymod.oracle_sql().get(name)
    if o is None:
        df = q(spark, sf_smoke)
        assert df.count() >= 0
        return
    assert_df_matches_sql(q(spark, sf_smoke), o, sf_smoke)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
