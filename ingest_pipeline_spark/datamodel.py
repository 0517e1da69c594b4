"""StructType registry for the engine's core table shapes (SURVEY §1.1).

One canonical schema per abstraction the reference passes around as
dicts/pandas frames; every producer/consumer in the engine builds
against these:

- file_manifest: one row per file (reference dags/utils.py:717-767,
  schemata/file_info_schema.yml)
- metadata_record: one row per dataset from *metadata.tsv — untyped
  strings by design, cast on demand (md/data_file_types/
  tsv_metadata_file.py:14-31)
- metadata_document: the nested per-dataset doc (dags/utils.py:
  1586-1710, schemata/dataset_metadata_schema.yml)
- entity / edge: provenance graph tables (tools/survey.py:150-635)
- status_update: the state-machine input (dags/status_change/)
- rule: routing/classification rules (workflow_map/resource_map)
- checksum_record / checksum_manifest: DRS manifest rows
  (dags/launch_checksums.py:130-179,273-354)
"""

from __future__ import annotations

from pyspark.sql import types as T

FILE_MANIFEST = T.StructType(
    [
        T.StructField("rel_path", T.StringType(), False),
        T.StructField("type", T.StringType(), True),
        T.StructField("size", T.LongType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField("edam_term", T.StringType(), True),
        T.StructField("is_qa_qc", T.BooleanType(), True),
        T.StructField("is_data_product", T.BooleanType(), True),
    ]
)

METADATA_RECORD = T.StructType(
    [
        T.StructField("assay_type", T.StringType(), True),
        T.StructField("data_path", T.StringType(), True),
        T.StructField("contributors_path", T.StringType(), True),
        T.StructField("antibodies_path", T.StringType(), True),
        T.StructField("tissue_id", T.StringType(), True),
    ]
)

CONTRIBUTOR = T.StructType(
    [
        T.StructField("name", T.StringType(), True),
        T.StructField("affiliation", T.StringType(), True),
        T.StructField("orcid_id", T.StringType(), True),
    ]
)

METADATA_DOCUMENT = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("contributors", T.ArrayType(CONTRIBUTOR), True),
        T.StructField("antibodies", T.ArrayType(T.MapType(T.StringType(), T.StringType())), True),
        T.StructField("files", T.ArrayType(FILE_MANIFEST), True),
        T.StructField("dag_provenance_list", T.ArrayType(T.StringType()), True),
    ]
)

ENTITY = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), False),
        T.StructField("status", T.StringType(), True),
        T.StructField("group_name", T.StringType(), True),
        T.StructField("last_modified", T.TimestampType(), True),
    ]
)

EDGE = T.StructType(
    [
        T.StructField("parent_uuid", T.StringType(), False),
        T.StructField("child_uuid", T.StringType(), False),
    ]
)

STATUS_UPDATE = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("new_status", T.StringType(), True),
        T.StructField("run_id", T.StringType(), False),
    ]
)

RULE = T.StructType(
    [
        T.StructField("pattern", T.StringType(), False),
        T.StructField("payload", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), False),
    ]
)

CHECKSUM_RECORD = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("size", T.LongType(), False),
        T.StructField("parent_uuid", T.StringType(), False),
        T.StructField("base_path", T.StringType(), True),
        T.StructField("sha256_checksum", T.StringType(), True),
        T.StructField("md5_checksum", T.StringType(), True),
    ]
)

CHECKSUM_MANIFEST = T.StructType(
    [
        T.StructField("parent_uuid", T.StringType(), False),
        T.StructField("n_files", T.LongType(), False),
        T.StructField("total_bytes", T.LongType(), False),
        T.StructField("content_digest", T.StringType(), True),
    ]
)

SCHEMAS: dict[str, T.StructType] = {
    "file_manifest": FILE_MANIFEST,
    "metadata_record": METADATA_RECORD,
    "metadata_document": METADATA_DOCUMENT,
    "entity": ENTITY,
    "edge": EDGE,
    "status_update": STATUS_UPDATE,
    "rule": RULE,
    "checksum_record": CHECKSUM_RECORD,
    "checksum_manifest": CHECKSUM_MANIFEST,
}
