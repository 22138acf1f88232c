"""The primary correctness gate, run locally: every queries() entry must
match its DuckDB oracle (same check the driver performs at sf0.01)."""

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR
from tests.oracle_check import check_query


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, name):
    problems = check_query(spark, name, SF_DIR)
    assert not problems, f"{name}: " + "; ".join(problems)
