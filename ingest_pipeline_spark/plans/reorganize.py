"""Two-phase checkpointed reorganize job (SURVEY §3.2).

Restates the reference's split_and_create.reorganize stop/unstop
protocol (misc/tools/split_and_create.py:460-552): the biggest
dataflow in the reference —

  phase 1 ("stop"):  read the upload's metadata table, canonicalize
      assay types (fallback dictionary), mint one child-dataset id per
      row, apply regex-gated special-case rewrites, then FREEZE the
      result to a checkpoint table (the reference's frozen_source_df
      TSV).
  phase 2 ("unstop"): re-read the frozen table and emit per-child
      manifests / status updates.

The checkpoint between phases is the point: phase 2 is re-runnable
(operator restart, human approval gate) without re-minting ids.  At
scale the frozen table is a parquet directory partitioned like the
downstream shuffle, so phase 2 starts co-located.

Id minting here is deterministic (md5 of upload id + row key →
32-hex uuid) — the Spark-native replacement for the reference's
throttled REST minting loop (10-per-30 s), which becomes a
rest_batch_sink call when a real uuid service is in play.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..rules.engine import map_fallback

# bad assay-name fallback map (split_and_create.py:37-43 shape)
ASSAY_FALLBACKS = {
    "snare2": "SNARE-seq2",
    "scrna": "scRNAseq-10xGenomics-v3",
}


def phase1_freeze(
    metadata: DataFrame,
    upload_id: str,
    checkpoint_path: str,
    assay_col: str = "assay_type",
    key_col: str = "data_path",
) -> None:
    """Canonicalize, mint child ids, rewrite, freeze to checkpoint."""
    canon = metadata.withColumn(
        "canonical_assay_type", map_fallback(F.col(assay_col), ASSAY_FALLBACKS)
    )
    minted = canon.withColumn(
        "new_uuid", F.md5(F.concat(F.lit(upload_id + ":"), F.col(key_col)))
    )
    # special-case rewrite: '+'-separated read formats → '/' when the
    # pattern matches (split_and_create.py:52-81 shape)
    fixed = minted.withColumn(
        "sequencing_read_format",
        F.when(
            F.col("sequencing_read_format").rlike(r"^\d+\+\d+\+\d+\+\d+$"),
            F.regexp_replace(F.col("sequencing_read_format"), r"\+", "/"),
        ).otherwise(F.col("sequencing_read_format")),
    ) if "sequencing_read_format" in metadata.columns else minted
    fixed.write.mode("overwrite").parquet(checkpoint_path)


def phase2_emit(spark: SparkSession, checkpoint_path: str) -> DataFrame:
    """Re-read the frozen table; emit one child-manifest row per dataset."""
    frozen = spark.read.parquet(checkpoint_path)
    return frozen.select(
        F.col("new_uuid").alias("child_uuid"),
        "canonical_assay_type",
        *[c for c in frozen.columns if c not in ("new_uuid", "canonical_assay_type")],
    ).withColumn("status", F.lit("new"))


def reorganize_two_phase(
    spark: SparkSession,
    metadata: DataFrame,
    upload_id: str,
    checkpoint_path: str,
) -> DataFrame:
    """Run both phases; phase 2 alone is re-runnable from the checkpoint."""
    phase1_freeze(metadata, upload_id, checkpoint_path)
    return phase2_emit(spark, checkpoint_path)
