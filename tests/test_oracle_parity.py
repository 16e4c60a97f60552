"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet, compare row-count + columns + order-insensitive
values. Runs at sf0.001 by default (driver uses sf0.01 — run
``SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 pytest tests/test_oracle_parity.py``
before relying on a green gate).

DRIVER-STRICT since round 2: DuckDB results are fetched through
pandas (HUGEINT → float64, exactly what the driver sees) and values
canonicalize with scripts/oracle_check.py's full-precision canon — a
query that passes here but would hash-FAIL at the driver was the
round-1 failure mode this closes."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

import __spark_entry__ as entry_mod

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from oracle_check import canon, table_hash  # noqa: E402  (driver-strict canon)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_parity(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    # driver canon sort_values a pandas frame — list/dict cells crash
    # it (CORRECTNESS_r03); registered outputs must be scalar columns
    nested = [
        f.name
        for f in sdf.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    assert not nested, f"{name}: nested output columns {nested} break driver canon"
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    # pandas fetch = the driver's dtype-faithful path (HUGEINT→float64)
    opdf = duck.execute(ORACLES[name]).df()
    dcols = list(opdf.columns)
    drows = [tuple(r) for r in opdf.itertuples(index=False, name=None)]

    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols), (
        f"{name}: column mismatch spark={scols} duck={dcols}"
    )
    assert len(srows) == len(drows), f"{name}: rowcount spark={len(srows)} duck={len(drows)}"
    sc = _canon_rows(srows, [c.lower() for c in scols])
    dc = _canon_rows(drows, [c.lower() for c in dcols])
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert not mismatches, f"{name}: first diffs {mismatches[:5]}"
    # and the exact artifact the driver records
    assert table_hash(srows, [c.lower() for c in scols]) == table_hash(
        drows, [c.lower() for c in dcols]
    )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0
