"""End-to-end parity: every ``queries()`` entry against its ``oracle_sql()``
via DuckDB — the same comparison the driver's correctness gate performs."""

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import assert_df_equals_oracle


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.count()
    assert rows >= 0
    assert df.schema is not None


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    df = q(spark, sf_dir)
    if name not in oracles:
        assert df.count() >= 0  # rows-only check, same as the driver
        return
    assert_df_equals_oracle(df, oracles[name], sf_dir)


def test_all_oracle_keys_have_queries():
    qs = entry_mod.queries()
    for name in entry_mod.oracle_sql():
        assert name in qs
