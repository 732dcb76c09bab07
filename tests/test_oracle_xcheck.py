"""Cross-check every registry query against its DuckDB oracle at sf0.001 —
a local mirror of the driver's CORRECTNESS gate (row count + schema + values,
order-insensitive)."""

from __future__ import annotations

import math

import duckdb
import pytest

from rossete_rdf_spark.registry import QUERIES, oracle_sql

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns

    odf = duck.sql(oracle_sql()[name])
    ocols = list(odf.columns)
    orows = odf.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), (
        f"{name}: row count {len(srows)} vs oracle {len(orows)}"
    )
    got = _rows_multiset(scols, [[r[c] for c in scols] for r in srows])
    exp = _rows_multiset(ocols, orows)
    mism = [(g, e) for g, e in zip(got, exp) if g != e][:5]
    assert got == exp, f"{name}: first mismatches {mism}"
