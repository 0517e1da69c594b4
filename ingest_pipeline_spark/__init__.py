"""ingest_pipeline_spark — a PySpark-native analytics engine.

Brand-new engine with the query / data-processing capabilities of the
reference ingest pipeline (hubmapconsortium/ingest-pipeline, studied at
/root/reference), re-expressed Spark-first: DataFrame/SQL logical plans,
Catalyst optimization, Pandas UDFs only where built-ins cannot express
the semantics.  Designed for 100 TB scale: broadcast small dims, push
filters to the parquet scan, keep expressions inside whole-stage
codegen, avoid driver-side loops.

Layout:
  session     SparkSession factory tuned for local[N] and cluster runs
  tables      canonical test-table loader (TPC-H-ish star schema)
  functions   scalar column-function library (strings, time, bool, hash)
  rules       first-match regex rules engine (routing / classification)
  operators   dedup, similarity, text analysis, graph, windows, sessions
  validate    data-quality constraint checks + error reports
  sources     TSV/CSV/JSON/YAML/listing readers, TSV/JSON sinks
  streaming   Structured Streaming wrappers (windowed aggs, dedup, state)
  reports     survey-style wide report builders
"""

__version__ = "0.1.0"
