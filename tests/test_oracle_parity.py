"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.001 and compare row count + order-insensitive values against
the DuckDB oracle_sql()."""

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ducked():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == "float64":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, ducked, name):
    got = _norm(QUERIES[name](spark, SF_DIR).toPandas())
    if name not in ORACLES:
        assert len(got) >= 0  # rows-only contract: must run and be stable
        again = _norm(QUERIES[name](spark, SF_DIR).toPandas())
        pd.testing.assert_frame_equal(got, again)
        return
    want = _norm(ducked.sql(ORACLES[name]).df())
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    assert list(got.columns) == list(want.columns), (
        f"{name}: cols {list(got.columns)} != {list(want.columns)}"
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert df.schema is not None and len(rows) > 0


def test_contract_key_consistency():
    """Every oracle_sql key must name a queries() entry (a dangling oracle
    would silently never be checked by the driver)."""
    dangling = set(ORACLES) - set(QUERIES)
    assert not dangling, dangling
