"""Upload reorganization phase 2: per-child file operations (SURVEY §3).

The reference's split_and_create ``populate`` builds each child
dataset from the upload (misc/tools/split_and_create.py:184-300):
single-row ``{uuid}-metadata.tsv``, contributors/antibodies copied
into ``extras/``, upload-level ``extras/`` copied through, then —
shared uploads (``global``+``non_global`` dirs, :204-236) — the
``global`` tree plus the child's listed ``non_global_files``, or —
non-shared — the child's whole ``data_path`` moved in.

Spark restatement in two phases:

1. PLAN (pure DataFrame, distributed): ``plan_reorganize`` joins the
   child metadata (control-plane sized → broadcast) against the
   upload listing (the 100 TB side) and emits one row per file
   operation: (new_uuid, op, src_rel, dest_rel).  The plan is data —
   inspectable, diffable, and the frozen checkpoint the execution
   retries from.  Consistency invariants (the reference's asserts)
   come back as a violations DataFrame, not process aborts.
2. EXECUTE (side-effecting): ``execute_file_ops`` runs the plan via
   foreachPartition — executor-side copy/move against the shared
   filesystem, idempotent (copy overwrites; move falls back to copy
   when the source is already gone and the dest exists).

``write_child_metadata`` emits each child's single-row metadata.tsv
driver-side (child count is control-plane sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHARED_DIRS = frozenset({"global", "non_global"})


def is_shared_upload(listing: DataFrame, path_col: str = "rel_path") -> bool:
    """Reference :204-209 — BOTH global and non_global dirs present."""
    tops = {
        r.top
        for r in listing.select(
            F.split(F.col(path_col), "/").getItem(0).alias("top")
        )
        .filter(F.col("top").isin(*sorted(SHARED_DIRS)))
        .distinct()
        .collect()
    }
    return tops == SHARED_DIRS


def shared_upload_violations(
    meta: DataFrame, shared: bool, uuid_col: str = "new_uuid"
) -> DataFrame:
    """The reference's two asserts (:214-236) as data:
    - non_global_files set but the upload is not shared;
    - shared upload but a child has no non_global_files."""
    has_ng = F.col("non_global_files").isNotNull() & (
        F.trim(F.col("non_global_files")) != ""
    )
    if shared:
        bad = meta.filter(~has_ng).select(
            F.col(uuid_col).alias("uuid"),
            F.lit("shared_upload_missing_non_global_files").alias("violation"),
        )
    else:
        bad = meta.filter(has_ng).select(
            F.col(uuid_col).alias("uuid"),
            F.lit("non_global_files_without_shared_dirs").alias("violation"),
        )
    return bad


def plan_reorganize(
    meta: DataFrame,
    listing: DataFrame,
    shared: bool,
    uuid_col: str = "new_uuid",
    path_col: str = "rel_path",
) -> DataFrame:
    """One row per file operation: (new_uuid, op, src_rel, dest_rel).

    All joins are broadcast(meta) × listing prefix predicates — the
    listing side streams; nothing is collected.
    """
    m = F.broadcast(
        meta.select(
            F.col(uuid_col).alias("new_uuid"),
            "data_path",
            "contributors_path",
            "antibodies_path",
            "non_global_files",
        )
    )
    files = listing.select(F.col(path_col).alias("src_rel"))
    basename = F.element_at(F.split(F.col("src_rel"), "/"), -1)

    # upload-level extras/ -> child extras/ (copy, every child)
    extras = files.filter(F.col("src_rel").startswith("extras/")).join(
        m.select("new_uuid"), F.lit(True)
    ).select(
        "new_uuid",
        F.lit("copy").alias("op"),
        "src_rel",
        F.col("src_rel").alias("dest_rel"),
    )

    # contributors/antibodies -> extras/<basename> (copy)
    cpaths = (
        m.select("new_uuid", F.col("contributors_path").alias("p"))
        .unionByName(m.select("new_uuid", F.col("antibodies_path").alias("p")))
        .filter(F.col("p").isNotNull() & (F.trim(F.col("p")) != ""))
    )
    contribs = cpaths.join(files, cpaths.p == files.src_rel).select(
        "new_uuid",
        F.lit("copy").alias("op"),
        "src_rel",
        F.concat(F.lit("extras/"), basename).alias("dest_rel"),
    )

    if shared:
        # global/** -> ./** for every child (copy)
        glob = files.filter(F.col("src_rel").startswith("global/")).join(
            m.select("new_uuid"), F.lit(True)
        ).select(
            "new_uuid",
            F.lit("copy").alias("op"),
            "src_rel",
            F.expr("substring(src_rel, length('global/') + 1)").alias("dest_rel"),
        )
        # each child's listed non_global files (';'-separated, :218-229)
        ng = (
            m.select(
                "new_uuid",
                F.explode(F.split(F.col("non_global_files"), ";")).alias("f"),
            )
            .select("new_uuid", F.trim(F.col("f")).alias("f"))
            .filter(F.col("f") != "")
        )
        ng_ops = ng.join(
            files, F.concat(F.lit("non_global/"), ng.f) == files.src_rel, "left"
        ).select(
            "new_uuid",
            # a listed-but-missing source is a plan-time violation row,
            # not an executor crash (reference asserts existence :225-229)
            F.when(F.col("src_rel").isNotNull(), F.lit("copy"))
            .otherwise(F.lit("missing_source"))
            .alias("op"),
            F.coalesce(F.col("src_rel"), F.concat(F.lit("non_global/"), F.col("f"))).alias(
                "src_rel"
            ),
            F.col("f").alias("dest_rel"),
        )
        data_ops = glob.unionByName(ng_ops)
    else:
        # whole data_path moves into the child root (:296-299)
        data_ops = m.join(
            files,
            files.src_rel.startswith(F.concat(m.data_path, F.lit("/"))),
        ).select(
            "new_uuid",
            F.lit("move").alias("op"),
            "src_rel",
            F.expr("substring(src_rel, length(data_path) + 2)").alias("dest_rel"),
        )

    return extras.unionByName(contribs).unionByName(data_ops)


def execute_file_ops(
    ops: DataFrame, upload_root: str, dest_root: str
) -> None:
    """Run the plan: copy/move each file to <dest_root>/<uuid>/<dest_rel>.

    foreachPartition — executor-side against the shared filesystem.
    Idempotent per op: copies overwrite; a move whose source vanished
    but whose destination exists is treated as already done (retry
    safety).  'missing_source' rows raise — run
    ``shared_upload_violations`` / inspect the plan first.
    """

    def run(partition) -> None:
        import os
        import shutil

        for row in partition:
            if row.op == "missing_source":
                raise FileNotFoundError(
                    f"{row.new_uuid}: listed non_global file missing: {row.src_rel}"
                )
            src = os.path.join(upload_root, row.src_rel)
            dst = os.path.join(dest_root, row.new_uuid, row.dest_rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            if row.op == "copy":
                shutil.copy2(src, dst)
            elif row.op == "move":
                if not os.path.exists(src):
                    if os.path.exists(dst):
                        continue  # retried move, already done
                    raise FileNotFoundError(f"{row.new_uuid}: {src}")
                shutil.move(src, dst)
            else:
                raise ValueError(f"unknown op {row.op!r}")

    ops.foreachPartition(run)


def write_child_metadata(
    meta: DataFrame, dest_root: str, uuid_col: str = "new_uuid"
) -> None:
    """Single-row {uuid}-metadata.tsv per child (reference :240-249:
    data_path rewritten to '.', contributors/antibodies to extras/).

    foreachPartition — executor-side against the shared filesystem,
    same dataflow as execute_file_ops: a 100×-scale reorganize has
    thousands of children and must not serialize writes through the
    driver.  Idempotent (each child's file is rewritten whole)."""
    cols = [c for c in meta.columns if c != uuid_col]

    def run(partition) -> None:
        import csv
        import os

        for row in partition:
            d = row.asDict()
            uuid = d.pop(uuid_col)
            d["data_path"] = "."
            for k in ("contributors_path", "antibodies_path"):
                if d.get(k):
                    d[k] = f"extras/{d[k].rsplit('/', 1)[-1]}"
            child = os.path.join(dest_root, uuid)
            os.makedirs(child, exist_ok=True)
            path = os.path.join(child, f"{uuid}-metadata.tsv")
            with open(path, "w", newline="") as f:
                wr = csv.DictWriter(f, fieldnames=cols, delimiter="\t")
                wr.writeheader()
                wr.writerow({k: ("" if d.get(k) is None else d[k]) for k in cols})

    meta.foreachPartition(run)


def reorganized_integrity(
    ops: DataFrame, dest_listing: DataFrame
) -> DataFrame:
    """Declared-vs-actual check (V7 on the reorganized output): every
    planned (uuid, dest_rel) must exist in the destination listing
    (uuid, rel_path).  Returns missing rows (empty == success)."""
    expected = ops.filter(F.col("op") != "missing_source").select(
        "new_uuid", "dest_rel"
    )
    actual = dest_listing.select(
        F.col("uuid").alias("new_uuid"), F.col("rel_path").alias("dest_rel")
    )
    return expected.join(actual, ["new_uuid", "dest_rel"], "left_anti")
