"""Export-and-backup plugin battery (SURVEY §2.1 S14-S16 composition).

Restates the reference's export_and_backup DAG
(dags/export_and_backup.py:94-146 find_plugins/run_plugins): an
(entity_type, status) → plugin-list map (dags/export_and_backup_map.yml)
selects which export/backup plugins fire for each entity, plugins are
ordered by ``order_of_application`` and each produces an artifact
(dags/export_and_backup/export_and_backup_plugin.py:29-60; concrete
plugins under export_and_backup/plugins/).

Engine restatement:

- plugin **selection** is a broadcast rules join (entities ×
  map-rows), not a per-uuid driver loop — at 100 TB the entity table
  is a DataFrame and selection stays distributed;
- plugin **execution** is a driver-side loop over the handful of
  selected plugin names (the reference's run_plugins is likewise
  driver-side); each plugin receives the already-filtered partition of
  entities and writes through the standard sinks (write_tsv /
  write_json), keeping the heavy I/O distributed.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sources.sinks import write_json, write_tsv


@dataclass(frozen=True)
class ExportPlugin:
    """One export/backup behavior, selected by (entity_type, status).

    ``run`` takes the filtered entity DataFrame and an output
    directory, writes its artifact(s), and returns the artifact path —
    the engine analog of ExportAndBackupPlugin.run_plugin().
    """

    name: str
    entity_type: str
    status: str
    run: Callable[[DataFrame, str], str]
    order_of_application: float = 1.0
    description: str = ""


def _tsv_manifest(df: DataFrame, out_dir: str, name: str) -> str:
    path = f"{out_dir}/{name}.tsv"
    write_tsv(df, path, single_file=True)
    return path


def _json_dump(df: DataFrame, out_dir: str, name: str) -> str:
    path = f"{out_dir}/{name}.json"
    write_json(df, path, single_file=True)
    return path


def default_export_plugins() -> list[ExportPlugin]:
    """The concrete battery (reference plugins/dataset_published.py,
    plugins/dataset_error.py, plus the upload_reorganized map entry):

    - published datasets  → TSV manifest snapshot (backup staging)
    - errored datasets    → JSON entity dump (diagnostic export)
    - reorganized uploads → TSV manifest of the reorganized children
    """
    return [
        ExportPlugin(
            "dataset_published",
            "dataset",
            "published",
            lambda df, out: _tsv_manifest(df, out, "published_manifest"),
            order_of_application=1.0,
            description="published datasets → TSV manifest snapshot",
        ),
        ExportPlugin(
            "dataset_error",
            "dataset",
            "error",
            lambda df, out: _json_dump(df, out, "error_entities"),
            order_of_application=2.0,
            description="errored datasets → JSON entity dump",
        ),
        ExportPlugin(
            "upload_reorganized",
            "upload",
            "reorganized",
            lambda df, out: _tsv_manifest(df, out, "reorganized_manifest"),
            order_of_application=3.0,
            description="reorganized uploads → TSV manifest",
        ),
    ]


def find_plugins(
    entities: DataFrame, plugins: list[ExportPlugin] | None = None
) -> DataFrame:
    """Distributed restatement of find_plugins (export_and_backup.py:
    94-118): broadcast the (entity_type, status, plugin) map and join.

    Output: entities + ``plugin`` column, one row per (entity, plugin)
    match; entities matching no plugin are absent (the reference's
    empty plugin list).
    """
    plugins = plugins if plugins is not None else default_export_plugins()
    spark = entities.sparkSession
    rules = spark.createDataFrame(
        [(p.entity_type, p.status, p.name) for p in plugins],
        "entity_type string, status string, plugin string",
    )
    joined = entities.withColumn(
        "__et", F.lower(F.col("entity_type"))
    ).withColumn("__st", F.lower(F.col("status")))
    return (
        joined.join(
            F.broadcast(rules),
            (joined["__et"] == rules["entity_type"])
            & (joined["__st"] == rules["status"]),
        )
        .drop(rules["entity_type"])
        .drop(rules["status"])
        .drop("__et", "__st")
    )


def run_export_backup(
    entities: DataFrame,
    out_dir: str,
    plugins: list[ExportPlugin] | None = None,
) -> dict[str, str]:
    """Run every selected plugin in order_of_application order.

    Returns {plugin_name: artifact_path} for plugins whose selection
    was non-empty.  Each plugin sees only its (entity_type, status)
    partition; the filter is pushed into the scan, so a plugin over
    'published' never reads the rest of a 100 TB entity table's
    row-groups (predicate pushdown on the status column).
    """
    plugins = plugins if plugins is not None else default_export_plugins()
    results: dict[str, str] = {}
    for p in sorted(plugins, key=lambda p: (p.order_of_application, p.name)):
        part = entities.filter(
            (F.lower(F.col("entity_type")) == p.entity_type)
            & (F.lower(F.col("status")) == p.status)
        )
        if part.limit(1).count() == 0:
            continue
        results[p.name] = p.run(part, out_dir)
    return results
