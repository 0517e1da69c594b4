"""Messaging sinks: status-change notifications (SURVEY §2.1 S18).

The reference's StatusChanger fans each entity status change out to
per-channel managers — Slack (status_change/slack_manager.py:30-122,
``status_to_class`` main-class + tested subclasses), email
(email_manager.py:17-90, recipients/templates by status family), and
the ingest-board — with env-dependent channel routing
(dags/utils.py:2017-2045 ``post_to_slack_notify`` /
``env_appropriate_slack_channel``) and recipient policies
(utils.py:2070-2122 ``send_email`` prod_only fallback).

Spark restatement:

- ``MessageRule`` registry = the status→class table: per status a
  rendering template, plus optional higher-priority subclass rules
  gated on a row predicate (the ``test`` hook).  Dispatch and
  rendering compile to ONE chained-CASE projection — a million status
  changes render in a single codegen pass, no per-row Python.
- ``render_messages`` produces the payload DataFrame
  (uuid, status, rule, channel, subject, body); channel routing
  implements the env rule (non-prod → test channel).
- ``email_recipients`` applies the reference's recipient policy
  (internal curation list for errors, submitter+cc for good statuses,
  prod_only fallback to config recipients).
- ``Emitter`` is the transport seam: ``emit`` takes a payload batch
  (list of dicts).  ``send_messages`` ships a payload DataFrame
  through any emitter via the batched foreachPartition sink (same
  shape as rest_batch_sink) — an HTTP client in production, a
  recorder in tests.  No network happens in this repo.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sources.sinks import rest_batch_sink

DEFAULT_TEST_CHANNEL = "test-notifications"


@dataclass(frozen=True)
class MessageRule:
    """One message class: which status it serves, an optional gate
    predicate (the reference subclass ``test``), and how to render."""

    name: str
    status: str
    subject: Column
    body: Column
    channel: str
    gate: Column | None = None  # None = main class for the status


def _s(col: str) -> Column:
    return F.coalesce(F.col(col).cast("string"), F.lit(""))


# mirrors slack_manager.status_to_class: main class per status, tested
# subclasses first (higher priority).  Built lazily — Column
# expressions need an active SparkContext, so a module-level tuple
# would break importing this module before session start.
def default_rules() -> tuple[MessageRule, ...]:
    return (
    MessageRule(
        "dataset_error_processing",
        "error",
        F.concat(F.lit("Dataset processing error: "), _s("uuid")),
        F.concat(_s("uuid"), F.lit(" failed during pipeline processing (run "),
                 _s("run_id"), F.lit(")")),
        "pipeline-alerts",
        gate=F.col("reject_reason").isNull(),
    ),
    MessageRule(
        "dataset_error",
        "error",
        F.concat(F.lit("Dataset error: "), _s("uuid")),
        F.concat(_s("uuid"), F.lit(" entered error state: "),
                 F.coalesce(_s("reject_reason"), F.lit("unknown"))),
        "pipeline-alerts",
    ),
    MessageRule(
        "dataset_invalid",
        "invalid",
        F.concat(F.lit("Dataset invalid: "), _s("uuid")),
        F.concat(_s("uuid"), F.lit(" marked invalid")),
        "curation",
    ),
    MessageRule(
        "dataset_qa",
        "qa",
        F.concat(F.lit("Dataset ready for QA: "), _s("uuid")),
        F.concat(_s("uuid"), F.lit(" passed processing and awaits QA")),
        "curation",
    ),
    MessageRule(
        "upload_reorganized",
        "reorganized",
        F.concat(F.lit("Upload reorganized: "), _s("uuid")),
        F.concat(_s("uuid"), F.lit(" split into "),
                 F.coalesce(_s("n_children"), F.lit("0")), F.lit(" datasets")),
        "ingest",
    ),
    MessageRule(
        "rejected_update",
        "rejected",
        F.concat(F.lit("Status update rejected: "), _s("uuid")),
        F.concat(F.lit("update to '"), _s("new_status"), F.lit("' rejected: "),
                 _s("reject_reason")),
        "pipeline-alerts",
    ),
    )


def render_messages(
    events: DataFrame,
    rules: tuple[MessageRule, ...] | None = None,
    status_col: str = "status",
    env: str = "dev",
) -> DataFrame:
    """Dispatch + render in one projection: (uuid, status, rule,
    channel, subject, body).

    First matching rule wins (subclass gates before the main class,
    preserving registry order — the reference's subclass-``test``-then-
    main lookup).  Rows whose status has no rule are dropped, matching
    the reference's "no messaging rules; no message will be sent".
    Non-prod environments route every message to the test channel
    (utils.py:2040-2045).
    """
    if rules is None:
        rules = default_rules()
    # the payload contract's optional columns: templates may reference
    # any of them; normalize absent ones to NULL so a rule for one
    # event shape doesn't break rendering another
    for c in ("reject_reason", "run_id", "n_children", "new_status"):
        if c not in events.columns:
            events = events.withColumn(c, F.lit(None).cast("string"))
    rule_name = F.lit(None).cast("string")
    subject = F.lit(None).cast("string")
    body = F.lit(None).cast("string")
    channel = F.lit(None).cast("string")
    for r in reversed(rules):
        cond = F.col(status_col) == r.status
        if r.gate is not None:
            cond = cond & r.gate
        rule_name = F.when(cond, F.lit(r.name)).otherwise(rule_name)
        subject = F.when(cond, r.subject).otherwise(subject)
        body = F.when(cond, r.body).otherwise(body)
        channel = F.when(cond, F.lit(r.channel)).otherwise(channel)
    if env != "prod":
        channel = F.when(
            channel.isNotNull(), F.lit(DEFAULT_TEST_CHANNEL)
        ).otherwise(channel)
    return (
        events.withColumn("rule", rule_name)
        .filter(F.col("rule").isNotNull())
        .select(
            "uuid",
            F.col(status_col).alias("status"),
            "rule",
            channel.alias("channel"),
            subject.alias("subject"),
            body.alias("body"),
        )
    )


CURATION_CONTACTS = ("curation-team",)  # reference utils.py CURATION_CONTACTS
GOOD_STATUSES = frozenset({"qa", "published", "reorganized"})


def email_recipients(
    payloads: DataFrame,
    submitter_col: str | None = "submitter_email",
    env: str = "dev",
    config_recipients: tuple[str, ...] = ("pipeline-notifications",),
) -> DataFrame:
    """Recipient policy column (reference email_manager.py:17-60 +
    utils.py send_email prod_only): errors go to the internal curation
    list; good statuses go to the submitter cc curation; outside prod
    everything falls back to the config recipients."""
    if env != "prod":
        to = F.array(*[F.lit(x) for x in config_recipients])
    else:
        curation = F.array(*[F.lit(x) for x in CURATION_CONTACTS])
        submitter = (
            F.array(F.col(submitter_col))
            if submitter_col is not None
            else F.array().cast("array<string>")
        )
        to = (
            F.when(F.col("status").isin(*GOOD_STATUSES),
                   F.array_union(submitter, curation))
            .otherwise(curation)
        )
    return payloads.withColumn("recipients", to)


class Emitter:
    """Transport seam: subclass and implement emit(batch_of_dicts)."""

    def emit(self, batch: list[dict]) -> None:  # pragma: no cover - interface
        raise NotImplementedError


class CollectingEmitter(Emitter):
    """In-memory recorder (tests / dry-run preview)."""

    def __init__(self) -> None:
        self.batches: list[list[dict]] = []

    def emit(self, batch: list[dict]) -> None:
        self.batches.append(batch)

    @property
    def messages(self) -> list[dict]:
        return [m for b in self.batches for m in b]


class CallableEmitter(Emitter):
    """Wraps a transport callable (e.g. an HTTP poster) — the
    production shape: post_to_slack_notify / airflow_send_email."""

    def __init__(self, fn: Callable[[list[dict]], None]) -> None:
        self.fn = fn

    def emit(self, batch: list[dict]) -> None:
        self.fn(batch)


def send_messages(
    payloads: DataFrame,
    emitter: Emitter,
    batch_size: int = 100,
    local: bool = True,
) -> None:
    """Ship payload rows through the emitter in fixed-size batches.

    local=True (default) streams batches on the DRIVER via
    toLocalIterator — notification volume is report-sized and
    stateful emitters (recorders, authenticated clients) stay in one
    process.  local=False fans out via foreachPartition (the
    rest_batch_sink/S17 shape) for bulk fan-out; the emitter is then
    pickled per executor, so it must be process-safe transport.
    """
    if local:
        buf: list[dict] = []
        for row in payloads.toLocalIterator():
            buf.append(row.asDict())
            if len(buf) >= batch_size:
                emitter.emit(buf)
                buf = []
        if buf:
            emitter.emit(buf)
    else:
        rest_batch_sink(payloads, emitter.emit, batch_size=batch_size)


def reject_stream_messages(
    rejected: DataFrame,
    rules: tuple[MessageRule, ...] | None = None,
    env: str = "dev",
) -> DataFrame:
    """Wire the status machine's reject output (operators
    .status_machine.apply_status_updates) straight into messaging:
    every rejected update becomes a 'rejected_update' payload."""
    return render_messages(
        rejected.withColumn("status", F.lit("rejected")),
        rules=rules,
        env=env,
    )
