"""Driver-safety gate over every registered oracle SQL's OUTPUT TYPES.

Root cause of the six recurring r1/r2 CORRECTNESS hash-failures: DuckDB
``SUM(<integer>)`` returns HUGEINT (int128 → Arrow decimal128(38,0)),
which the driver's typed hasher renders differently from Spark's int64
even when every value matches.  The old local comparator went through
``fetchall()`` (Python ints), erasing the type — so the bug was
invisible locally and fatal under the driver.

This test binds every ``oracle_sql()`` entry in DuckDB (bind only — no
execution, so the whole 90+-query sweep is sub-second) and asserts each
output column's type is in the driver-safe allow-list.  Anyone who
writes a new uncast integer SUM, or a LIST/STRUCT output column, fails
here immediately.
"""

from __future__ import annotations

import os

import pytest

from ingest_pipeline_spark import queries as q
from tests.oracle_utils import ALLOWED_DUCK_TYPES, duckdb_conn

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def conn():
    c = duckdb_conn(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(q.oracle_sql()))
def test_oracle_output_types_driver_safe(conn, name):
    sql = q.oracle_sql()[name]
    rel = conn.sql(sql)
    bad = [
        (col, str(t))
        for col, t in zip(rel.columns, rel.types)
        if str(t).upper() not in ALLOWED_DUCK_TYPES
    ]
    assert not bad, (
        f"{name}: driver-unsafe oracle output types {bad} — "
        f"CAST integer SUMs to BIGINT, stringify LIST columns"
    )
