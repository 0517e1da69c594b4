"""Sinks: TSV / JSON writers (SURVEY §2.1 S14-S15).

Single-file TSV (the reference's manifest.tsv shape,
dags/launch_checksums.py:179,260) uses coalesce(1) — correct for
report-sized outputs; bulk outputs keep their partitioning and write
one file per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_tsv(df: DataFrame, path: str, single_file: bool = False, mode: str = "overwrite") -> None:
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode(mode)
        .option("sep", "\t")
        .option("header", True)
        .csv(path)
    )


def write_json(df: DataFrame, path: str, single_file: bool = False, mode: str = "overwrite") -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).json(path)
