"""SparkSession factory.

Local test profile: one JVM, N threads, AQE on, shuffle partitions
sized to cores (not the 200 default), UTC session timezone so results
compare bit-for-bit against the DuckDB oracle.  On a real cluster the
same builder works — only master/memory change; AQE + adaptive
coalescing keep shuffle sizing sane at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # Harmless for current timestamp[us] testdata (only applies to NANOS
    # columns); kept so older TIMESTAMP(NANOS) testdata still loads — see
    # tables.load_table, which normalizes both shapes.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(app_name: str = "ingest_pipeline_spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    for k, v in _DEFAULTS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def pin_session_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable defaults to an externally-provided session.

    The correctness driver hands us its own SparkSession; timezone and
    AQE flags are runtime-settable, so pin them here for oracle parity.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    # back-compat for TIMESTAMP(NANOS) testdata; no-op on timestamp[us] —
    # see tables.load_table, which normalizes both shapes
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # size shuffles to cores (the 200 default over-parallelizes local runs)
    spark.conf.set(
        "spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    return spark
