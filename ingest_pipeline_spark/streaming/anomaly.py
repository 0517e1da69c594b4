"""Streaming CUSUM anomaly alerts: the batch change-point statistic
(queries.events_cusum_changepoint) restated as a continuously-updated
per-key control chart.

A monitoring pipeline wants the cumulative deviation S = Σ(x − μ) the
moment each observation arrives, not at end-of-day: state per key is
(n, S, peak|S|), updated by applyInPandasWithState and emitted every
micro-batch with an alert flag once peak|S| crosses the threshold.
Accumulation is Decimal (state travels as strings), so the streaming
path is bit-identical to the batch fallback's decimal sums — the same
stream==batch discipline as streaming/neardup.py and
stateful_user_counts.

Baselines (per-key expected value μ) are a BOUNDED dimension (one row
per monitored series) passed as a plain mapping and closed over — the
streaming analogue of a broadcast dim join.  State at 100 TB/day is
three scalars per key; bound key cardinality with a watermark/TTL in
production.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

OUT_SCHEMA = (
    "key string, n_obs long, cusum double, peak_abs double, alert boolean"
)
STATE_SCHEMA = "n long, s string, peak string"
_CENT = Decimal("0.01")


def _q2(v) -> Decimal:
    return Decimal(repr(float(v))).quantize(_CENT, rounding=ROUND_HALF_UP)


def cusum_stream(
    events: DataFrame,
    baselines: dict,
    threshold: float,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key CUSUM control chart over a stream of observations.

    Emits (key, n_obs, cusum, peak_abs, alert) after every
    micro-batch; ``alert`` latches once peak|S| ≥ threshold.  Rows
    within a batch fold in deterministic (ts, id) order.  On a batch
    DataFrame, falls back to the order-free identities
    (S_final = Σx − n·μ; peak via a keyed window over the same
    deterministic order) with identical decimal arithmetic.
    """
    mus = {str(k): _q2(v) for k, v in baselines.items()}

    if not events.isStreaming:
        x = F.col(value_col).cast("decimal(18,2)")
        mu_map = F.create_map(
            *[c for k, v in sorted(mus.items()) for c in (F.lit(k), F.lit(str(v)))]
        )
        mu = mu_map[F.col(key_col).cast("string")].cast("decimal(18,2)")
        w = (
            Window.partitionBy(key_col)
            .orderBy(ts_col, id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        d = (
            events.where(F.col(key_col).cast("string").isin(*mus.keys()))
            .withColumn("__dev", x - mu)
            .withColumn("__cum", F.sum("__dev").over(w))
        )
        return d.groupBy(F.col(key_col).cast("string").alias("key")).agg(
            F.count("*").alias("n_obs"),
            F.sum("__dev").cast("double").alias("cusum"),
            F.max(F.abs(F.col("__cum"))).cast("double").alias("peak_abs"),
            (
                F.max(F.abs(F.col("__cum"))).cast("double")
                >= F.lit(float(threshold))
            ).alias("alert"),
        )

    import pandas as pd

    thr = Decimal(repr(float(threshold)))

    def update(key, pdfs, state):
        k = str(key[0])
        mu = mus.get(k)
        if mu is None:
            return
        n, s, peak = state.get if state.exists else (0, "0", "0")
        acc, pk = Decimal(s), Decimal(peak)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, id_col])
        for v in rows[value_col]:
            acc += _q2(v) - mu
            n += 1
            if abs(acc) > pk:
                pk = abs(acc)
        state.update((n, str(acc), str(pk)))
        yield pd.DataFrame(
            {
                "key": [k],
                "n_obs": [n],
                "cusum": [float(acc)],
                "peak_abs": [float(pk)],
                "alert": [pk >= thr],
            }
        )

    return (
        events.withColumn("__k", F.col(key_col).cast("string"))
        .groupBy("__k")
        .applyInPandasWithState(
            update, OUT_SCHEMA, STATE_SCHEMA, "update", "NoTimeout"
        )
    )
