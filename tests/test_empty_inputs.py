"""Empty-input robustness: EVERY registered query must run (0+ rows,
no exception) when all tables are empty — the local stand-in for the
quiet-day / empty-incremental-partition case a 100 TB pipeline hits
routinely.  Driver-side math (1/n_nodes, index builds) is where this
bites; plan-side Spark handles empty relations natively."""

import os
import shutil

import pytest

from ingest_pipeline_spark.queries import queries


@pytest.fixture(scope="module")
def empty_dir(spark, sf_dir, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sf_empty"))
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet"):
            spark.read.parquet(f"{sf_dir}/{f}").limit(0).write.mode(
                "overwrite"
            ).parquet(f"{dst}/{f}")
    yield dst
    shutil.rmtree(dst, ignore_errors=True)


def test_every_query_survives_empty_tables(spark, empty_dir):
    fails = []
    for name, fn in sorted(queries().items()):
        try:
            n = fn(spark, empty_dir).count()
            assert n >= 0
        except Exception as e:  # noqa: BLE001 — collecting the full list
            fails.append((name, type(e).__name__, str(e).splitlines()[0][:120]))
    assert not fails, f"queries crashing on empty input: {fails}"
