"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf0.01, compare row count + column names + order-insensitive values.

Usage: python selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

import __spark_entry__ as entry_mod
from metacache_mpi_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            try:
                df[c] = pd.to_numeric(df[c], errors="raise")
                if (df[c].dropna() % 1 == 0).all():
                    df[c] = df[c].astype("Int64")
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark(8, app_name="selfcheck", shuffle_partitions=8)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        a, b = normalize(sdf), normalize(odf)
        dt_a = {c: str(sdf[c].dtype) for c in sdf.columns}
        dt_b = {c: str(odf[c].dtype) for c in odf.columns}
        dtw = [
            f"{c}:{dt_a[c]}|{dt_b.get(c)}"
            for c in dt_a
            if c in dt_b and dt_a[c] != dt_b[c]
        ]
        if dtw:
            print(f"warn  {name}: raw dtype drift {dtw}")
        status = []
        if len(a) != len(b):
            status.append(f"rowcount {len(a)} vs {len(b)}")
        if list(a.columns) != list(b.columns):
            status.append(f"columns {list(a.columns)} vs {list(b.columns)}")
        if not status:
            if not a.equals(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                bad_cols = [c for c in a.columns if neq[c].any()]
                status.append(f"values differ in {bad_cols}")
                for c in bad_cols[:2]:
                    i = neq[c].idxmax()
                    status.append(f"  {c}[{i}]: {a[c][i]!r} vs {b[c][i]!r}")
        if status:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(status))
        else:
            print(f"OK    {name}: {len(a)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
