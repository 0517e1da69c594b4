"""Canonical table loader for the driver-generated TPC-H-ish test data.

Tables (one parquet each): region nation customer supplier part orders
lineitem events documents embeddings.  All queries load through here so
filters/projections push down to the parquet scan and small dimensions
are marked broadcast-able once, in one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import pin_session_conf

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at any scale factor the schema
# implies (region=5, nation=25 rows always; supplier scales slowly).
BROADCAST_DIMS = frozenset({"region", "nation"})


def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize one timestamp column to session-tz TimestampType.

    Handles both testdata generations: parquet timestamp[us] with no UTC
    flag (Spark reads TIMESTAMP_NTZ — cast; session tz is pinned UTC so
    values are unchanged and match DuckDB), and the older TIMESTAMP(NANOS)
    which under spark.sql.legacy.parquet.nanosAsLong arrives as a
    nanosecond long (truncate to micros — DuckDB does the same ns→us
    truncation).  Works on batch and streaming DataFrames.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    field = df.schema[ts_col]
    if isinstance(field.dataType, T.LongType):
        return df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` div 1000"))
        )
    if isinstance(field.dataType, T.TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # Normalize every timestamp-ish column (ts / o_orderdate / l_shipdate)
    # regardless of which testdata generation wrote it; see
    # normalize_event_ts for both shapes.
    from pyspark.sql import types as T

    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = normalize_event_ts(df, "ts")
        elif isinstance(field.dataType, T.TimestampNTZType):
            df = normalize_event_ts(df, field.name)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    pin_session_conf(spark)
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


# (session, app, sf_dir) -> loaded tables.  DataFrames are immutable
# logical plans over static testdata, so reuse across queries is safe and
# cuts ~10 footer reads + ~25 Py4J round trips off EVERY query — at 54
# bench queries that fixed cost dominated the sf0.1 headline.  Keyed by
# the Python session object id (held alive by the cached DataFrames'
# session refs, so the id can't be recycled while the entry exists) plus
# applicationId so a restarted JVM can never serve stale plans.
_TABLE_CACHE: dict[tuple[int, str, str], dict[str, DataFrame]] = {}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL API) and return them.

    Cached per (session, sf_dir): the first call loads + registers, later
    calls only re-pin the runtime conf (timezone / AQE — cheap, and the
    external driver may flip confs between queries).
    """
    key = (id(spark), spark.sparkContext.applicationId, sf_dir)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        pin_session_conf(spark)
        return dict(cached)
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    _TABLE_CACHE[key] = dfs
    return dict(dfs)
