import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from hilbert_curve_spark.session import get_spark

    s = get_spark("hcs-tests", master="local[4]")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def assert_df_equals_oracle(spark_df, sql, sf_dir, sort_cols=None):
    """Driver-style comparison: row count + schema names + order-insensitive
    value equality between a Spark DataFrame and DuckDB SQL over the same
    parquet tables."""
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    expected = con.execute(sql).fetchdf()
    got = spark_df.toPandas()
    assert sorted(got.columns) == sorted(expected.columns), (
        f"schema mismatch: {sorted(got.columns)} vs {sorted(expected.columns)}")
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = expected[cols].sort_values(cols).reset_index(drop=True)
    assert len(g) == len(e), f"row count {len(g)} vs oracle {len(e)}"
    import pandas as pd

    pd.testing.assert_frame_equal(g, e, check_dtype=False)
