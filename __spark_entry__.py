"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query on /root/testdata/sf0.001 (smoke).
queries()      — one callable per implemented operator (SURVEY.md §2).
oracle_sql()   — DuckDB-equivalent ANSI SQL per query for the
                 sf0.01 hash-match correctness gate.

Implementation lives in the ingest_pipeline_spark package; this module
is a thin adapter kept import-light so the driver can load it from any
working directory.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from ingest_pipeline_spark import queries as _q  # noqa: E402
from ingest_pipeline_spark.session import pin_session_conf  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: checksum-manifest pipeline on sf0.001 (SURVEY §7.1)."""
    pin_session_conf(spark)
    fns = _q.queries()
    return fns["checksum_manifest"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
