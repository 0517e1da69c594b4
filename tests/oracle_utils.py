"""Local replica of the driver's Spark-vs-DuckDB comparison.

Canonicalizes both result sets (columns sorted by name, rows sorted,
every value rendered to a canonical string) and asserts equality —
an order-insensitive value-hash match, like CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime
import math

import duckdb

from ingest_pipeline_spark.tables import TABLE_NAMES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for t in TABLE_NAMES:
        conn.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return conn


def canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (datetime.datetime,)):
        return v.isoformat()
    if isinstance(v, (datetime.date,)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_value(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


# The driver's hasher canonicalizes TYPED values (Arrow). DuckDB HUGEINT
# (uncast integer SUM) arrives as decimal128(38,0) != int64 and hash-fails
# even when every value is equal — the root cause of the six recurring r1/r2
# CORRECTNESS failures. List/struct outputs crash its canonicalizer.  So the
# local gate now refuses any oracle output column outside this allow-list.
ALLOWED_DUCK_TYPES = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN", "TIMESTAMP", "DATE",
}

ALLOWED_SPARK_TYPES = {
    "bigint", "int", "smallint", "tinyint",
    "double", "float", "string", "boolean", "timestamp", "date",
    # the driver's typed hasher canonicalizes NTZ timestamps fine (q3,
    # window_latest_order etc. were driver-green as NTZ in r3) — keep the
    # local gate no stricter than the driver
    "timestamp_ntz",
}


def assert_driver_safe_types(duck_rel, spark_df=None) -> None:
    """Fail on output types the driver's typed hasher can't canonicalize.

    Catches DuckDB HUGEINT/DECIMAL (uncast integer SUM), LIST/STRUCT
    columns, and Spark array/map outputs before they reach the driver.
    """
    for name, t in zip(duck_rel.columns, duck_rel.types):
        ts = str(t).upper()
        assert ts in ALLOWED_DUCK_TYPES, (
            f"oracle column {name!r} has driver-unsafe DuckDB type {ts} "
            f"(cast it: e.g. CAST(SUM(...) AS BIGINT), array_join lists)"
        )
    if spark_df is not None:
        for f in spark_df.schema.fields:
            st = f.dataType.simpleString()
            assert st in ALLOWED_SPARK_TYPES, (
                f"spark column {f.name!r} has driver-unsafe type {st} "
                f"(stringify arrays/maps, cast decimals)"
            )
            # an NTZ output only equals DuckDB's TIMESTAMP because the
            # session tz is pinned UTC; if a query bypassed
            # tables.load_table under a non-UTC session, values would
            # silently drift — make that failure mode loud here
            if st == "timestamp_ntz":
                tz = spark_df.sparkSession.conf.get("spark.sql.session.timeZone")
                assert tz in ("UTC", "Etc/UTC", "GMT"), (
                    f"NTZ column {f.name!r} compared under session tz "
                    f"{tz!r}; NTZ parity with DuckDB requires UTC"
                )


def compare_to_oracle(spark_df, sql: str, sf_dir: str) -> None:
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(r) for r in spark_df.collect()]

    conn = duckdb_conn(sf_dir)
    rel = conn.sql(sql)
    assert_driver_safe_types(rel, spark_df)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()
    conn.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = canon_rows(spark_cols, spark_rows)
    d = canon_rows(duck_cols, duck_rows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(f"value mismatch; first diffs: {diffs}")
