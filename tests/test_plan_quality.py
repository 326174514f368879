"""Plan-quality guards: the no-per-row-Python mandate (input_hint) and
broadcast usage must survive refactors."""

import pytest

import __spark_entry__ as entrymod

NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", NAMES)
def test_no_row_at_a_time_python(spark, sf_smoke, name):
    df = entrymod.queries()[name](spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, \
        f"{name} contains a row-at-a-time Python UDF"


def test_joins_broadcast_small_side(spark, sf_smoke):
    for name in ["range_join_count", "pip_join_count", "knn_join",
                 "multiget"]:
        df = entrymod.queries()[name](spark, sf_smoke)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan, \
            f"{name} does not broadcast its small side"
