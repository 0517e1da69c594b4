"""Orchestration shell: request intake → dedup → routing → job dispatch.

Restates the reference's ingest entry point (SURVEY §3.1):
plugins/hubmap_api/endpoint.py:312-390 parses a request, mints
run_id = "{submission}_{process}_{ts}", dedups against existing runs,
and triggers the DAG selected by the ingest/workflow map; the
downstream fan-out joins (collectiontype, assay_type) against
workflow_map.yml (dags/utils.py:1924-1938).

Spark restatement — a pure DataFrame pipeline, batch or foreachBatch:

  requests(provider, submission_id, process, ts)
    → run_id minting (deterministic md5 — idempotent under retry)
    → dropDuplicates(run_id)            (T2 exactly-once)
    → first-match routing join          (P11 rules engine)
    → job rows (run_id, dag_id, queue)  → dispatcher sink

The same `route_requests` runs inside a Structured-Streaming
foreachBatch for continuous intake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rules.engine import Rule, first_match_case

# process-name → DAG routing rules (ingest_map shape, first match wins)
DEFAULT_PROCESS_RULES: list[Rule] = [
    Rule(r"^mock\.", "mock_ingest"),
    Rule(r"\.rnaseq$", "salmon_rnaseq"),
    Rule(r"\.codex$", "codex_cytokit"),
    Rule(r"^scan\.", "scan_and_begin_processing"),
]

# queue routing per dag (resource_map shape)
DEFAULT_QUEUE_RULES: list[Rule] = [
    Rule(r"^codex", "gpu000_q1"),
    Rule(r".*", "general"),
]


def mint_run_ids(requests: DataFrame) -> DataFrame:
    """Deterministic run ids: md5(provider:submission:process:ts).

    Identical redelivered requests mint identical ids — the dedup key
    for exactly-once intake (the reference asks "The request happened
    twice?" by querying existing DagRuns; here it's a dropDuplicates).
    """
    return requests.withColumn(
        "run_id",
        F.md5(
            F.concat_ws(
                ":",
                F.col("provider"),
                F.col("submission_id"),
                F.col("process"),
                F.col("ts").cast("string"),
            )
        ),
    )


def seal_requests(
    requests: DataFrame, auth_key: str, mode: str = "GCM"
) -> DataFrame:
    """Attach the intake auth token: AES-sealed provider:submission:process.

    The engine-side analog of the reference minting an encrypted
    submission token for the ingest endpoint (dags/utils.py:1941-1950,
    Fernet = AES-CBC + HMAC).  Default GCM: authenticated encryption —
    a tampered token fails the AEAD tag check and routes to the 401
    path.  Tokens are then non-deterministic (random IV, like Fernet),
    which is fine for retry idempotence: dedup keys on the minted
    run_id (payload-derived), never on token bytes.  mode="ECB" exists
    solely for deterministic oracle fixtures.
    """
    from .functions.scalars import encrypt_token

    payload = F.concat_ws(
        ":", F.col("provider"), F.col("submission_id"), F.col("process")
    )
    return requests.withColumn(
        "auth_token", encrypt_token(payload, auth_key, mode)
    )


def route_requests(
    requests: DataFrame,
    process_rules: list[Rule] | None = None,
    queue_rules: list[Rule] | None = None,
    auth_key: str | None = None,
    auth_mode: str = "GCM",
    pre_minted: bool = False,
) -> DataFrame:
    """Full intake pipeline → dispatchable job rows.

    Output: (run_id, provider, submission_id, process, dag_id, queue);
    requests whose process matches no rule get dag_id='unroutable' and
    should flow to the error sink, mirroring the reference's 400
    response for unknown process types.

    With ``auth_key`` set, each request's ``auth_token`` column is
    opened before routing (the reference decrypts the intake token at
    plugins/hubmap_api/endpoint.py:354-355): a token that fails to
    decrypt OR whose payload does not match the request fields routes
    to dag_id='unauthorized' — the 401 path as an error-sink row, never
    a thrown exception mid-batch.

    ``pre_minted=True`` (r14) skips the mint + exactly-once dedup for a
    caller that already holds a minted, run_id-deduplicated relation —
    a multi-key audit (token_crypto_roundtrip opens the same sealed
    batch under two keys) then pays the dedup shuffle once instead of
    once per key.  Routing semantics are unchanged: minting is
    idempotent (run_id is payload-derived md5) and dropDuplicates on an
    already-unique run_id relation is a no-op, so the flag only removes
    redundant work, never rows.
    """
    minted = (
        requests
        if pre_minted
        else mint_run_ids(requests).dropDuplicates(["run_id"])
    )
    authorized = None
    if auth_key is not None:
        from .functions.scalars import decrypt_token

        expected = F.concat_ws(
            ":", F.col("provider"), F.col("submission_id"), F.col("process")
        )
        authorized = (
            decrypt_token(F.col("auth_token"), auth_key, auth_mode) == expected
        )
    process_rules = process_rules or DEFAULT_PROCESS_RULES
    queue_rules = queue_rules or DEFAULT_QUEUE_RULES
    lowered = F.lower(F.col("process"))
    dag = first_match_case(lowered, process_rules, default="unroutable")
    if authorized is not None:
        dag = F.when(~F.coalesce(authorized, F.lit(False)), "unauthorized").otherwise(dag)
    routed = minted.withColumn("dag_id", dag).withColumn(
        "queue", first_match_case(F.col("dag_id"), queue_rules, default="general")
    )
    return routed.select(
        "run_id", "provider", "submission_id", "process", "dag_id", "queue"
    )


# (collection_type_regex, assay_type_regex, workflow) — the reference's
# workflow_map.yml shape (dags/workflow_map.yml; lookup semantics
# dags/utils.py:1922-1936 downstream_workflow_iter: ALL matching rows
# fire, regexes anchored at the start via re.match)
DEFAULT_WORKFLOW_MAP: tuple[tuple[str, str, str], ...] = (
    ("test_only", ".*", "test_workflow"),
    ("devtest", ".*", "devtest_step2"),
    (".*", "CODEX", "codex_cytokit"),
    (".*", "Slide-seq", "salmon_rnaseq_slideseq"),
    ("rnaseq_10x", "scRNAseq-10xGenomics", "salmon_rnaseq_10x"),
)


def downstream_workflows(
    datasets: DataFrame,
    workflow_map: tuple[tuple[str, str, str], ...] = DEFAULT_WORKFLOW_MAP,
    ct_col: str = "collectiontype",
    at_col: str = "assay_type",
) -> DataFrame:
    """Fan each dataset out to EVERY matching workflow (T3 semantics —
    unlike first-match routing, one dataset can trigger several DAGs).

    The map is static config, so the whole lookup compiles to one
    projection: per entry a literal-anchored-rlike flag (codegen; no
    probe-table join, no shuffle), then explode + drop the non-matches.
    Output: input columns + ``workflow``, one row per (dataset, match).
    """
    arms = [
        F.when(
            F.coalesce(F.col(ct_col), F.lit("")).rlike(f"^(?:{ct_re})")
            & F.coalesce(F.col(at_col), F.lit("")).rlike(f"^(?:{at_re})"),
            F.lit(wf),
        )
        for ct_re, at_re, wf in workflow_map
    ]
    return (
        datasets.withColumn("workflow", F.explode(F.array(*arms)))
        .filter(F.col("workflow").isNotNull())
    )
