"""Mimic the driver's correctness gate: run every queries() entry and its
oracle_sql() DuckDB twin at a small scale factor and compare row count,
column names, and (order-insensitively) values.

This is the same comparison CORRECTNESS_r{N}.json records, run locally
so regressions surface in pytest first.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

ORACLED = sorted(entrymod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(ORACLED))


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(v):
    """EXACT canonicalization — no rounding.

    r4 post-mortem (VERDICT "What's wrong" #4): the old ``round(v, 9)``
    here was looser than the driver's value hash, so five dtype/rounding
    divergences sailed through an "82/82 green" local sweep and surfaced
    only in CORRECTNESS_r04.json. The driver hashes pandas-materialized
    values, where representation matters: int64 != float64, Decimal !=
    float, scale-12 Decimal != scale-0 Decimal. Mirror that by keying on
    (type, exact repr) so pytest fails exactly where the driver fails."""
    if v is None:
        return "\x00<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return ("float", repr(v))
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, (str, bytes)):
        return v
    return (type(v).__name__, str(v))


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # key=repr: canon values are heterogeneous (str / tuple / int), which
    # Python won't order directly in a NULL-and-number column.
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in data), key=repr
    )


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    spark_cols = df.columns
    spark_rows = _rows(spark_cols, df.collect())

    res = duck.execute(entrymod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = _rows(duck_cols, res.fetchall())

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    if spark_rows != duck_rows:
        diffs = [(a, b) for a, b in zip(spark_rows, duck_rows) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert df.schema


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
