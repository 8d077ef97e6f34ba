"""Local replica of the driver's correctness gate: run every queries() entry
on Spark at sf0.01, run the matching oracle_sql() through DuckDB with the
testdata tables pre-registered as views, and compare row count, column names,
and an order-insensitive value hash.

Usage: python tools/check_contract.py [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    cols = sorted(df.columns)
    rows = sorted(
        "|".join(norm_cell(r[c]) for c in cols) for _, r in df.iterrows()
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    import __spark_entry__ as entrymod
    from bibexpy_spark.session import build_spark

    only = set(sys.argv[1:])
    spark = build_spark(cores=8, extra_conf={"spark.sql.shuffle.partitions": "8"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {exc}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif value_hash(sdf) != value_hash(odf):
            problems.append("value hash mismatch")
            cols = sorted(sdf.columns)
            a = {"|".join(norm_cell(r[c]) for c in cols) for _, r in sdf.iterrows()}
            b = {"|".join(norm_cell(r[c]) for c in cols) for _, r in odf.iterrows()}
            print("   spark-only:", list(a - b)[:3])
            print("   duck-only :", list(b - a)[:3])
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
        else:
            print(f"OK    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
