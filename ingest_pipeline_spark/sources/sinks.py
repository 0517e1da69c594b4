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


def rest_batch_sink(
    df: DataFrame,
    post_fn,
    batch_size: int = 100,
    num_partitions: int | None = None,
    rate_limit_sleep_s: float = 0.0,
) -> None:
    """Batched remote-mutation sink (SURVEY §2.1 S17, §2.6 O4).

    The reference POSTs uuid/checksum records in fixed blocks with
    throttling (dags/launch_checksums.py:34,192-226 RECS_PER_BLOCK=100;
    tools/split_and_create.py:509-522 10-per-30 s).  Spark restatement:
    foreachPartition with client-side chunking + optional sleep;
    ``post_fn(list_of_row_dicts)`` is the transport (HTTP client in
    production, a recorder in tests).  Partition count bounds request
    concurrency — the cluster-wide analog of the reference's "lanes".
    """
    import time as _time

    if num_partitions is not None:
        df = df.repartition(num_partitions)

    def send(partition) -> None:
        buf: list[dict] = []
        for row in partition:
            buf.append(row.asDict())
            if len(buf) >= batch_size:
                post_fn(buf)
                buf = []
                if rate_limit_sleep_s:
                    _time.sleep(rate_limit_sleep_s)
        if buf:
            post_fn(buf)

    df.foreachPartition(send)
