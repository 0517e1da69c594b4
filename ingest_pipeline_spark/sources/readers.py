"""Sources: TSV/CSV/JSON/YAML/text/binary + distributed directory listing.

Mirrors the reference's source surface (SURVEY §2.1 S1-S13):

- TSV with delimiter-error detection (reference
  md/data_file_types/tsv_metadata_file.py:14-31): untyped strings,
  header row, a post-read malformed-row check.
- JSON documents (md/data_file_types/json_metadata_file.py).
- YAML documents (md/data_file_types/yaml_metadata_file.py) — parsed
  driver-side per file (YAML is a control-file format here, never a
  100 TB data format), then parallelized.
- gz text logs (dags/generate_usage_report.py:70-151) —
  spark.read.text handles the codec natively.
- Recursive listing (dags/utils.py:717-767): one row per file with
  rel_path/size/mtime.  Local implementation walks on the driver and
  parallelizes; at cluster scale swap in the binaryFile source which
  distributes the listing (path/length/modificationTime come from the
  file index, not file reads).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_tsv(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """Header'd TSV → untyped string columns (cast on demand)."""
    reader = spark.read.option("sep", "\t").option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_json_docs(spark: SparkSession, path: str, multiline: bool = True) -> DataFrame:
    return spark.read.option("multiLine", multiline).json(path)


def read_yaml_docs(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Parse YAML control files driver-side → one JSON-string row each.

    YAML appears in the reference only as small control/metadata files
    (rslt.yml, test.yml); never bulk data — driver-side parse + Spark
    JSON inference is the right scale tradeoff.
    """
    import json

    try:
        import yaml  # type: ignore
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError("pyyaml not installed in this environment") from exc

    rows = []
    for p in paths:
        with open(p) as f:
            rows.append(json.dumps(yaml.safe_load(f)))
    return spark.read.json(spark.sparkContext.parallelize(rows))


def read_yaml_sidecars(
    spark: SparkSession, path_glob: str, recursive: bool = False
) -> DataFrame:
    """Distributed YAML ingest: many small sidecar files → one DataFrame
    of ``(path, doc_json)`` rows.

    The reference carries one ``rslt.yml`` per dataset
    (dags/scan_and_begin_processing.py:77-81); at 100× scale that is
    millions of sidecars, which must be read where they live: a
    ``binaryFile`` scan distributes both the listing and the reads
    across executors (driver never loops over files), and
    ``mapInPandas`` parses each Arrow batch of (path, bytes) with
    ``yaml.safe_load``.  Docs come back as canonical JSON strings
    (sorted keys) so downstream schema inference / ``from_json`` stays
    engine-portable.  Import-gated on pyyaml like read_yaml_docs.
    """
    try:
        import yaml  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError("pyyaml not installed in this environment") from exc

    reader = spark.read.format("binaryFile")
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    bin_df = reader.load(path_glob).select("path", "content")

    def parse(batches):
        import json

        import pandas as pd
        import yaml as _yaml

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "doc_json": [
                        json.dumps(
                            _yaml.safe_load(content.decode("utf-8")),
                            sort_keys=True,
                        )
                        for content in pdf["content"]
                    ],
                }
            )

    return bin_df.mapInPandas(parse, "path string, doc_json string")


def read_text_logs(spark: SparkSession, glob: str) -> DataFrame:
    """Line-wise log source; .gz transparently decompressed."""
    return spark.read.text(glob)


def read_excel(spark: SparkSession, path: str, sheet: str | int = 0) -> DataFrame:
    """Excel source (survey input shape, reference tools/survey.py:836).

    Excel is a report-input format, never bulk data — driver-side
    pandas parse then parallelize.  Import-gated: raises
    NotImplementedError when no Excel engine is installed.
    """
    import pandas as pd

    try:
        pdf = pd.read_excel(path, sheet_name=sheet)
    except ImportError as exc:  # openpyxl/xlrd not in this container
        raise NotImplementedError(
            "no Excel engine installed; install openpyxl to enable read_excel"
        ) from exc
    return spark.createDataFrame(pdf)


def tsv_delimiter_report(df: DataFrame) -> dict:
    """Delimiter-error detection for a header'd TSV read.

    Mirrors the reference's checks (md/data_file_types/
    tsv_metadata_file.py:14-31): a wrong delimiter shows up as (a)
    unnamed/auto-generated header columns (`_c0`…) or empty header
    names, (b) a lone column whose header embeds another delimiter
    (the whole header failed to split), or (c) rows where every
    declared column is null.  Returns {"bad_header_cols": [...],
    "suspected_delimiter": str|None, "n_all_null_rows": int,
    "n_rows": int} — one aggregation pass.
    """
    bad_header = [
        c for c in df.columns if c is None or c.strip() == "" or c.startswith("_c")
    ]
    suspected = None
    if len(df.columns) == 1:
        for cand in (",", ";", "|"):
            if cand in df.columns[0]:
                suspected = cand
                break
    all_null = None
    for c in df.columns:
        cond = F.col(c).isNull()
        all_null = cond if all_null is None else (all_null & cond)
    agg = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(all_null, 1).otherwise(0)).alias("n_all_null"),
    ).first()
    return {
        "bad_header_cols": bad_header,
        "suspected_delimiter": suspected,
        "n_all_null_rows": int(agg.n_all_null or 0),
        "n_rows": int(agg.n_rows),
    }


def listing(
    spark: SparkSession,
    root: str,
    num_partitions: int = 32,
) -> DataFrame:
    """Distributed-shaped recursive listing → files DataFrame.

    Schema: (rel_path, abs_path, size, mtime).  Top-level dirs are
    enumerated on the driver, then each partition walks its subtrees in
    parallel — the walk (the expensive part at 100 TB file counts)
    is distributed; only the fan-out seed list is driver-side.
    """
    schema = T.StructType(
        [
            T.StructField("rel_path", T.StringType(), False),
            T.StructField("abs_path", T.StringType(), False),
            T.StructField("size", T.LongType(), False),
            T.StructField("mtime", T.TimestampType(), False),
        ]
    )

    root = os.path.abspath(root)
    try:
        seeds = sorted(
            os.path.join(root, d) for d in os.listdir(root)
        )
    except FileNotFoundError:
        return spark.createDataFrame([], schema)

    def walk(paths):
        import datetime

        # tz-aware UTC: naive datetimes would be re-interpreted in the
        # worker's OS timezone by TimestampType.toInternal, shifting
        # every mtime on non-UTC hosts
        def mtime_utc(st):
            return datetime.datetime.fromtimestamp(
                st.st_mtime, tz=datetime.timezone.utc
            )

        for p in paths:
            if os.path.isfile(p):
                st = os.stat(p)
                yield (os.path.relpath(p, root), p, st.st_size, mtime_utc(st))
            else:
                for dirpath, _dirnames, filenames in os.walk(p):
                    for fn in sorted(filenames):
                        fp = os.path.join(dirpath, fn)
                        st = os.stat(fp)
                        yield (
                            os.path.relpath(fp, root),
                            fp,
                            st.st_size,
                            mtime_utc(st),
                        )

    rdd = spark.sparkContext.parallelize(seeds, max(1, min(num_partitions, len(seeds) or 1)))
    return spark.createDataFrame(rdd.mapPartitions(walk), schema)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Columnar ORC source — Spark-native (no extra package), with the
    same predicate-pushdown / column-pruning surface as parquet.  ORC
    is the interchange format warehouse stacks (Hive/Trino) hand us;
    reading it natively avoids a convert-to-parquet staging hop."""
    return spark.read.orc(path)


def read_parquet_dir(spark: SparkSession, path: str) -> DataFrame:
    """Plain parquet directory scan (non-table data; the canonical
    tables go through tables.load_table for NTZ normalization)."""
    return spark.read.parquet(path)


def read_json_with_deadletter(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines ingest that never drops OR poisons a batch: rows
    parse PERMISSIVE against the expected schema, malformed lines land
    whole in a ``_corrupt_record`` column, and the caller gets
    (good_rows, dead_letters) — route the latter to a quarantine sink
    instead of failing the job (the 100 TB reality: some fraction of
    any crawl is malformed, and a fail-fast reader turns one bad line
    into a dead pipeline).
    """
    full = schema.add("_corrupt_record", T.StringType())
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # materializing before the split is required: Spark's JSON parser
    # may otherwise re-parse per branch and corrupt-record pushdown
    # rules forbid filtering on the corrupt column alone over a fresh
    # scan.  localCheckpoint (not cache): its blocks are released by
    # the ContextCleaner when the DataFrames are dropped, whereas a
    # cache() entry would pin executor memory for the whole session
    # across repeated ingests unless every caller remembered to
    # unpersist.
    df = df.localCheckpoint(eager=True)
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    return good, bad
