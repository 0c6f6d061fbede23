"""Driver-contract correctness inside the pytest gate: every
``queries()`` entry with an oracle must match DuckDB at sf0.001
(row count + columns + order-insensitive values) — the same comparison
the driver's CORRECTNESS gate runs at sf0.01."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod
from selfcheck import TABLES, normalize

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


ORACLED = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ducks, name):
    sdf = entry_mod.queries()[name](spark, SF_DIR).toPandas()
    odf = ducks.execute(entry_mod.oracle_sql()[name]).fetchdf()
    a, b = normalize(sdf), normalize(odf)
    assert len(a) == len(b), f"rowcount {len(a)} vs {len(b)}"
    assert list(a.columns) == list(b.columns)
    assert a.equals(b), f"values differ for {name}"


def test_every_query_runs(spark):
    """rows-only entries (no oracle) must at least execute and return a
    stable schema."""
    for name, fn in entry_mod.queries().items():
        if name in entry_mod.oracle_sql():
            continue
        df = fn(spark, SF_DIR)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "cluster_id"}
