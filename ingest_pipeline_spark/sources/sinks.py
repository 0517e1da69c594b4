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


def pipe_partitions(df: DataFrame, command: list[str], to_line=None):
    """Opaque external-process task (SURVEY §2.11 F6).

    The reference shells out to cwltool/docker per pipeline stage
    (dags/utils.py:274-335, salmon_rnaseq.py:257-295); the engine
    models such stages as partition-wise pipes: each partition's rows
    are serialized to lines, streamed through `command`'s stdin, and
    the process's stdout lines come back as an RDD[str].  The
    bioinformatics inside stays opaque — the engine provides transport,
    parallelism, and provenance (record the command in the run
    manifest).

    to_line: row → str serializer (default: tab-joined str values).
    Returns an RDD of output lines; wrap with spark.read/createDataFrame
    downstream as needed.  checkCode=True: a non-zero exit fails the
    task loudly — the default (silently yielding zero rows on a crashed
    process) is data loss.
    """
    import shlex

    if to_line is None:
        def to_line(row):
            return "\t".join("" if v is None else str(v) for v in row)

    # shlex.join: rdd.pipe re-tokenizes with shlex.split, so args with
    # spaces/quotes (awk programs, sed exprs) must be quoted to survive
    return df.rdd.map(to_line).pipe(shlex.join(command), checkCode=True)


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
