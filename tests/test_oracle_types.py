"""Registry-wide guard: no oracle may emit a driver-hostile result schema.

The round-1 driver proved that its pandas-based canonicalization (a) turns
DuckDB HUGEINT — the result of any bare integer ``sum()`` — into a value
that hashes differently from Spark's BIGINT, and (b) crashes outright on
list/struct/map-typed output columns (``unhashable type: 'list'``).

This test runs EVERY registered oracle against the smallest test-data SF
on DuckDB alone (no Spark session — it stays fast) and asserts the result
schema contains no such type, making the whole defect class impossible to
reintroduce when adding queries.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_correctness import TABLES, duckdb_type_problems

SF_DIR = os.environ.get("SPARK_GRAFT_TINY_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"test data {SF_DIR} missing"
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def test_every_query_has_oracle_or_declared_rows_only():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs), "oracle without a query"
    missing = sorted(set(qs) - set(oracles))
    # Rows-only entries are allowed but must stay a deliberate, short list.
    assert len(missing) <= 8, f"too many rows-only queries: {missing}"


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_oracle_result_schema_is_driver_safe(con, name):
    rel = con.sql(entrymod.oracle_sql()[name])
    problems = duckdb_type_problems(rel)
    assert not problems, f"{name}: " + "; ".join(problems)
