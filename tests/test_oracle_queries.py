"""The local correctness gate: every registered query vs its oracle.

Mirrors the driver's per-query DuckDB comparison at sf0.001 so a
failure here predicts a CORRECTNESS_r{N}.json failure.
"""

import pytest

from ingest_pipeline_spark.queries import oracle_sql, queries
from tests.oracle_utils import compare_to_oracle

ORACLES = oracle_sql()
ALL = sorted(queries().items())


@pytest.mark.parametrize("name,fn", ALL, ids=[n for n, _ in ALL])
def test_query_matches_oracle(name, fn, spark, sf_dir):
    df = fn(spark, sf_dir)
    if name in ORACLES:
        compare_to_oracle(df, ORACLES[name], sf_dir)
    else:
        # rows-only check (non-SQL-expressible op)
        assert df.count() >= 0
        assert len(df.schema.fields) > 0
