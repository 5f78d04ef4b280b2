"""Strict local replica of the driver's correctness gate.

Runs every queries() entry at sf0.01 and compares against oracle_sql()
with a dtype-SENSITIVE value hash (pd.util.hash_pandas_object), mirroring
the driver's CORRECTNESS_r{N}.json check: rows_match, schema_match,
hash_match. Round-1 lesson: check_dtype=False hid DuckDB HUGEINT->float64
artifacts that the driver's hash caught.

Usage: python scripts/strict_parity.py [query ...]
"""

from __future__ import annotations

import os
import sys

import json

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> int:
    # dtype-sensitive: int64 1234 and float64 1234.0 hash differently
    return int(pd.util.hash_pandas_object(df, index=False).sum())


def main() -> int:
    from sprintz_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_bad = 0
    results = {}
    for name in sorted(queries):
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        got = _norm(queries[name](spark, SF_DIR).toPandas())
        entry_mod.release_query_caches()
        want = _norm(con.sql(oracles[name]).df())
        rows = len(got) == len(want)
        schema = list(got.columns) == list(want.columns)
        dtypes_got = {c: str(got[c].dtype) for c in got.columns}
        dtypes_want = {c: str(want[c].dtype) for c in want.columns}
        h = rows and schema and value_hash(got) == value_hash(want)
        status = "OK " if (rows and schema and h) else "FAIL"
        results[name] = {
            "rows_match": rows, "schema_match": schema, "hash_match": h,
            "spark_rows": len(got), "oracle_rows": len(want),
        }
        if not (rows and schema and h):
            n_bad += 1
        print(f"{status} {name}: rows={rows} schema={schema} hash={h}")
        if not h and rows and schema:
            for c in got.columns:
                if dtypes_got[c] != dtypes_want.get(c):
                    print(f"     dtype {c}: spark={dtypes_got[c]} oracle={dtypes_want.get(c)}")
                elif value_hash(got[[c]]) != value_hash(want[[c]]):
                    diff = (got[c] != want[c])
                    print(f"     values differ in {c}: {int(diff.sum())} rows, e.g. "
                          f"{got[c][diff].head(3).tolist()} vs {want[c][diff].head(3).tolist()}")
    try:
        from sprintz_spark.queries import release_shared_stages

        release_shared_stages()
    except ImportError:
        pass
    out_json = os.environ.get("PARITY_JSON")
    if out_json and only:
        print(f"NOTE: PARITY_JSON={out_json} NOT written (subset run; "
              "the artifact must cover the full registry)")
    if out_json and not only:
        # record which zstd backend was active: codec-search winners are
        # backend-dependent, so cross-environment golden comparisons need
        # to know whether the artifacts are comparable
        from sprintz_spark.codecs.search import zstd_backend

        with open(out_json, "w") as f:
            json.dump({"sf_dir": SF_DIR, "n_queries": len(results),
                       "zstd_backend": zstd_backend(),
                       "n_failing": n_bad, "results": results}, f, indent=1)
    print(f"\n{'ALL GREEN' if n_bad == 0 else f'{n_bad} FAILING'}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
