"""Local replica of the driver's correctness gate: run every queries() entry
via Spark at a given sf, run the oracle SQL via DuckDB on the same parquet,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"columns {sorted(got.columns)} != {sorted(want.columns)}")
        return problems
    if len(got) != len(want):
        problems.append(f"rowcount {len(got)} != {len(want)}")
    g, w = normalize(got), normalize(want)
    if len(g) == len(w):
        for c in g.columns:
            if pd.api.types.is_float_dtype(g[c]) or pd.api.types.is_float_dtype(w[c]):
                ok = (
                    (g[c].astype(float) - w[c].astype(float)).abs().max() or 0.0
                ) <= 1e-12
            else:
                ok = (g[c].astype(str) == w[c].astype(str)).all()
            if not ok:
                bad = (g[c].astype(str) != w[c].astype(str))
                problems.append(
                    f"col {c}: {int(bad.sum())} mismatched values; first: "
                    f"{g[bad][:3].to_dict('records')} vs {w[bad][:3].to_dict('records')}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as E
    from metric_search_spark.session import build_session

    only = set(sys.argv[2:])
    spark = build_session(cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = E.queries()
    # the driver contract (E.oracle_sql) is pinned to its sf0.01 compare;
    # locally, derive hand-off paths / n for whatever sf we're checking
    from metric_search_spark.entry_queries import oracles_for

    oracles = oracles_for(sf_dir)
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            failures += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows, {t_spark:.1f}s)")
            continue
        t0 = time.time()
        try:
            want = con.sql(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {type(ex).__name__}: {ex}")
            failures += 1
            continue
        problems = compare(name, got, want)
        if problems:
            failures += 1
            print(f"FAIL {name} ({len(got)} vs {len(want)} rows): " + "; ".join(problems))
        else:
            print(
                f"ok   {name}: {len(got)} rows match "
                f"(spark {t_spark:.1f}s, duckdb {time.time() - t0:.1f}s)"
            )
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
