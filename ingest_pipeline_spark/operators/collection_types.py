"""Collection-type inference from directory shape (SURVEY §2.11 F2 / §2.1 S2).

The reference probes each dataset directory against every registered
DataCollection subclass — a type matches when ALL its expected file
patterns match at least one file — and picks the highest
``match_priority`` match (reference md/metadata_extract.py:24-47 scan
loop; md/data_collection_types/akoya_codex_data_collection.py:70-122
``expected_files`` + ``test_match``).

Spark restatement, distributed over MANY datasets at once (the
reference runs one directory per process; at 100 TB the listing has
millions of files across thousands of uploads):

1. broadcast the tiny probe table and theta-join it to the listing on
   ``rel_path rlike probe`` — a BroadcastNestedLoopJoin whose inner
   side is ~tens of rows, so cost stays linear in listing size;
2. count DISTINCT matched probes per (dataset, type); a type is fully
   matched when every one of its probes hit (one shuffle, map-side
   partial agg);
3. pick the winner per dataset with a priority window (desc priority,
   name tiebreak) — WindowGroupLimit prunes to one row per dataset.

Datasets matching no type produce no row (the reference raises
MetadataError there; callers can anti-join to find them).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass(frozen=True)
class CollectionType:
    """One registered data-collection type: name, priority, probe regexes.

    ``probes`` are regexes over the file's path relative to the dataset
    root (the reference uses globs; regex is the Spark-native form).
    ALL probes must match somewhere in the dataset for the type to match.
    """

    name: str
    priority: float
    probes: tuple[str, ...] = field(default_factory=tuple)


# modeled on the reference's data_collection_types registry
# (akoya_codex_data_collection.py:76-80 expected_files and siblings)
DEFAULT_TYPES: tuple[CollectionType, ...] = (
    CollectionType(
        "AKOYA_CODEX",
        1.0,
        (r".*-metadata\.tsv$", r"(^|/)experiment\.json$", r"(^|/)segmentation\.json$"),
    ),
    CollectionType("IMS", 0.6, (r".*\.imzML$",)),
    CollectionType("OME_TIFF_COLLECTION", 0.5, (r".*\.ome\.tiff?$",)),
    CollectionType("FASTQ", 0.4, (r".*\.fastq(\.gz)?$",)),
    CollectionType("GENERIC_METADATATSV", 0.0, (r".*-metadata\.tsv$",)),
)


def probes_df(spark: SparkSession, types: tuple[CollectionType, ...]) -> DataFrame:
    rows = [
        (t.name, float(t.priority), p, len(t.probes))
        for t in types
        for p in t.probes
    ]
    return spark.createDataFrame(
        rows, "type_name string, priority double, probe string, n_probes int"
    )


def infer_collection_types(
    listing: DataFrame,
    spark: SparkSession,
    types: tuple[CollectionType, ...] = DEFAULT_TYPES,
    id_col: str = "dataset_id",
    path_col: str = "rel_path",
) -> DataFrame:
    """(dataset_id, collection_type) — best fully-matched type per dataset."""
    probes = F.broadcast(probes_df(spark, types))
    hits = listing.join(probes, F.expr(f"`{path_col}` rlike probe"))
    full = (
        hits.groupBy(id_col, "type_name", "priority", "n_probes")
        .agg(F.count_distinct("probe").alias("n_hit"))
        .filter(F.col("n_hit") == F.col("n_probes"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("priority"), F.asc("type_name"))
    return (
        full.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, F.col("type_name").alias("collection_type"))
    )
