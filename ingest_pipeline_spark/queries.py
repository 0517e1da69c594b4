"""Query registry: every operator exposed through the driver contract.

Each entry pairs a Spark DataFrame callable ``(spark, sf_dir) -> DF``
with the ANSI-SQL oracle DuckDB runs on the same parquet tables.  The
driver hash-compares values order-insensitively, so:

- every computed column is aliased identically on both sides;
- float aggregation is decimal-exact internally (sum over
  DECIMAL(18,2), cast to DOUBLE at the end) so accumulation order can
  never flip a bit;
- LIMIT/top-k always carries a full deterministic ORDER BY tiebreak;
- hashes use md5/sha2 (identical in every engine), never murmur3.

Operator IDs in each docstring refer to SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .tables import register_views
from .functions.scalars import expand_slice_ids
from .functions.text import (
    LANG_MARKERS,
    fingerprint_md5,
    langid_best,
    normalize_text,
    quality_features,
    token_count,
)
from .operators.dedup import (
    exact_dedup,
    fingerprint_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from .operators.sessionize import sessionize
from .operators.similarity import cosine
from .rules.engine import Rule, first_match_case, map_fallback
from .validate.checks import Check, violation_counts

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


def _t(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return register_views(spark, sf_dir)


def dsum(col: Column, scale: int = 2) -> Column:
    """Accumulation-order-proof sum: exact decimal internally, double out."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


# ---------------------------------------------------------------------------
# Relational core (SURVEY §2.2-2.7): scans, filters, joins, aggs, windows
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary (A1/A2/A5; P4 date filter).

    Scan-side: the shipdate filter and 6-column projection push to
    parquet; one shuffle on the 6-value group key with map-side
    partial agg — the canonical 100 TB-safe aggregate.
    """
    li = _t(spark, sf_dir)["lineitem"]
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped top-10 revenue orders (J2 multi-join; O3 top-N).

    customer is the small side → broadcast hint; lineitem↔orders is the
    big join and shuffles on orderkey only.  LIMIT carries a full
    deterministic tiebreak (revenue is decimal-exact → same order in
    any engine).
    """
    t = _t(spark, sf_dir)
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .hint("broadcast")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped local-supplier revenue (J2 chain + broadcast dims).

    nation/region are broadcast (always tiny); the only real shuffles
    are lineitem↔orders and the final small groupBy.
    """
    t = _t(spark, sf_dir)
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
    )


@register(
    "agg_value_counts",
    """
    SELECT event_type, COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def agg_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """value_counts + distinct-agg (A3/A6/A7): status-digest shape."""
    ev = _t(spark, sf_dir)["events"]
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        dsum(F.col("value")).alias("sum_value"),
    )


@register(
    "agg_rollup_orders",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (free Catalyst machinery over A1/A2)."""
    o = _t(spark, sf_dir)["orders"]
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("total_price"),
    )


@register(
    "pivot_event_value",
    """
    SELECT user_id % 10 AS user_bucket,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
    FROM events GROUP BY user_id % 10
    """,
)
def pivot_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation) by event type."""
    ev = _t(spark, sf_dir)["events"]
    return (
        ev.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", ["click", "purchase", "view"])
        .agg(dsum(F.col("value")))
    )


@register(
    "window_latest_order",
    """
    SELECT o_custkey, o_orderkey, o_orderdate FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders) WHERE rn = 1
    """,
)
def window_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-revision-per-parent window dedup (J10/W2)."""
    o = _t(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


@register(
    "window_topk_overflow",
    """
    SELECT o_orderstatus, o_orderkey, rn,
           group_total - LEAST(group_total, 3) AS n_overflow
    FROM (
      SELECT o_orderstatus, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS group_total
      FROM orders) WHERE rn <= 3
    """,
)
def window_topk_overflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group with "…N more" overflow marker (W3/O3)."""
    o = _t(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_all = Window.partitionBy("o_orderstatus")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .withColumn("group_total", F.count("*").over(w_all))
        .filter(F.col("rn") <= 3)
        .select(
            "o_orderstatus",
            "o_orderkey",
            "rn",
            (F.col("group_total") - F.least(F.col("group_total"), F.lit(3))).alias(
                "n_overflow"
            ),
        )
    )


@register(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate window (decimal-exact cumulative sum)."""
    o = _t(spark, sf_dir)["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@register(
    "join_semi_customers",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def join_semi_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (J7): customers having a finished order."""
    t = _t(spark, sf_dir)
    finished = t["orders"].filter(F.col("o_orderstatus") == "F")
    return t["customer"].join(
        finished, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti_customers",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (J6): customers with no orders at all."""
    t = _t(spark, sf_dir)
    return t["customer"].join(
        t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_broadcast_region",
    """
    SELECT r_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_broadcast_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim-join chain (J5): dims ride map-side, zero dim shuffle."""
    t = _t(spark, sf_dir)
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            dsum(F.col("c_acctbal")).alias("total_acctbal"),
        )
    )


@register(
    "join_left_coalesce",
    """
    SELECT n_nationkey, n_name,
           COALESCE(c.n_cust, 0) AS n_cust,
           COALESCE(s.n_supp, 0) AS n_supp
    FROM nation
      LEFT JOIN (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
             ON c_nationkey = n_nationkey
      LEFT JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
             ON s_nationkey = n_nationkey
    """,
)
def join_left_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join + null coalescing (J3/J4/P14): survey-note enrichment shape."""
    t = _t(spark, sf_dir)
    n_cust = t["customer"].groupBy("c_nationkey").agg(F.count("*").alias("n_cust"))
    n_supp = t["supplier"].groupBy("s_nationkey").agg(F.count("*").alias("n_supp"))
    return (
        t["nation"]
        .join(n_cust, F.col("c_nationkey") == F.col("n_nationkey"), "left")
        .join(n_supp, F.col("s_nationkey") == F.col("n_nationkey"), "left")
        .select(
            "n_nationkey",
            "n_name",
            F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
            F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
        )
    )


@register(
    "join_contains_keywords",
    """
    WITH kw(keyword) AS (VALUES ('spark'), ('join'), ('filter'), ('window'), ('merge'))
    SELECT keyword, COUNT(*) AS n_docs
    FROM documents, kw
    WHERE text LIKE '%' || keyword || '%'
    GROUP BY keyword
    """,
)
def join_contains_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contains/theta join (J9): log-line × task-id mining shape.

    Small side is literal → BroadcastNestedLoopJoin, the documented
    strategy for the reference's substring join
    (dags/generate_usage_report.py:156-199).
    """
    docs = _t(spark, sf_dir)["documents"]
    kw = spark.createDataFrame(
        [("spark",), ("join",), ("filter",), ("window",), ("merge",)], "keyword string"
    )
    return (
        docs.join(F.broadcast(kw), F.col("text").contains(F.col("keyword")))
        .groupBy("keyword")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "setop_except_intersect",
    """
    SELECT 'cust_only' AS op, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'both' AS op, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT SELECT s_nationkey FROM supplier)
    """,
)
def setop_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops (U1-U3): EXCEPT + INTERSECT + UNION ALL in one result."""
    t = _t(spark, sf_dir)
    cust = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    supp = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    cust_only = cust.subtract(supp).select(
        F.lit("cust_only").alias("op"), "nationkey"
    )
    both = cust.intersect(supp).select(F.lit("both").alias("op"), "nationkey")
    return cust_only.unionByName(both)


# ---------------------------------------------------------------------------
# Scalar surface (SURVEY §2.8) + flagship checksum manifest (§7.1)
# ---------------------------------------------------------------------------


@register(
    "checksum_manifest",
    """
    SELECT source,
           COUNT(*) AS n_files,
           SUM(n_chars) AS total_chars,
           MD5(STRING_AGG(MD5(text), '' ORDER BY MD5(text))) AS content_digest
    FROM documents
    GROUP BY source
    """,
)
def checksum_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: checksum-manifest pipeline (SURVEY §7.1).

    Restates the reference's launch_checksums dataflow
    (dags/launch_checksums.py:130-179,273-354): per-file digest →
    per-dataset rollup (count, total size, order-insensitive content
    digest).  One scan; one shuffle on the group key; the per-group
    digest sorts each group's file hashes so the rollup is
    deterministic under any partitioning.
    """
    docs = _t(spark, sf_dir)["documents"]
    return (
        docs.select("source", "n_chars", F.md5(F.col("text")).alias("h"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("n_chars").alias("total_chars"),
            F.md5(F.concat_ws("", F.array_sort(F.collect_list("h")))).alias(
                "content_digest"
            ),
        )
    )


@register(
    "hash_functions",
    """
    SELECT doc_id, MD5(text) AS md5_hex, SHA256(text) AS sha256_hex
    FROM documents WHERE doc_id < 100
    """,
)
def hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/crypto surface (§2.8): md5 + sha256 per document."""
    docs = _t(spark, sf_dir)["documents"]
    return docs.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.md5(F.col("text")).alias("md5_hex"),
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
    )


@register(
    "string_functions",
    """
    SELECT doc_id,
           UPPER(source) AS source_upper,
           LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS n_tokens,
           SUBSTR(text, 1, 20) AS prefix20,
           CONCAT_WS('|', lang, source) AS lang_source,
           REPLACE(lang, 'e', 'E') AS lang_repl,
           STARTS_WITH(source, 'src1') AS is_src1
    FROM documents WHERE doc_id < 200
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface (§2.8/P13): split/trim/case/concat/substr/startswith."""
    docs = _t(spark, sf_dir)["documents"]
    return docs.filter(F.col("doc_id") < 200).select(
        "doc_id",
        F.upper(F.col("source")).alias("source_upper"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        F.substring(F.col("text"), 1, 20).alias("prefix20"),
        F.concat_ws("|", F.col("lang"), F.col("source")).alias("lang_source"),
        F.regexp_replace(F.col("lang"), "e", "E").alias("lang_repl"),
        F.col("source").startswith("src1").alias("is_src1"),
    )


@register(
    "regex_extract_classify",
    """
    SELECT doc_id,
           CAST(REGEXP_EXTRACT(source, '([0-9]+)$', 1) AS BIGINT) AS src_num,
           CASE WHEN REGEXP_MATCHES(text, 'stream|window') THEN 'streaming'
                WHEN REGEXP_MATCHES(text, 'join|merge')     THEN 'relational'
                WHEN REGEXP_MATCHES(text, 'scan|filter')    THEN 'scan'
                ELSE 'other' END AS doc_class
    FROM documents WHERE doc_id < 200
    """,
)
def regex_extract_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface + first-match classifier (P10/W1 via rules engine)."""
    docs = _t(spark, sf_dir)["documents"]
    rules = [
        Rule("stream|window", "streaming"),
        Rule("join|merge", "relational"),
        Rule("scan|filter", "scan"),
    ]
    return docs.filter(F.col("doc_id") < 200).select(
        "doc_id",
        F.regexp_extract(F.col("source"), r"([0-9]+)$", 1)
        .cast("bigint")
        .alias("src_num"),
        first_match_case(F.col("text"), rules, default="other").alias("doc_class"),
    )


@register(
    "date_functions",
    """
    SELECT DATE_TRUNC('hour', ts) AS hour_start,
           DAYOFWEEK(ts) AS dow,
           COUNT(*) AS n,
           MIN(EPOCH_MS(ts)) AS first_epoch_ms
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts <  TIMESTAMP '2024-01-07 00:00:00'
    GROUP BY 1, 2
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface (§2.8): trunc, day-of-week, epoch-millis.

    DuckDB DAYOFWEEK is 0=Sunday..6; Spark dayofweek is 1=Sunday..7 —
    normalized here to DuckDB's convention via -1.
    """
    ev = _t(spark, sf_dir)["events"]
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-05 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-07 00:00:00").cast("timestamp"))
        )
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            (F.dayofweek(F.col("ts")) - 1).alias("dow"),
        )
        .agg(
            F.count("*").alias("n"),
            F.min(F.unix_millis(F.col("ts"))).alias("first_epoch_ms"),
        )
    )


@register(
    "json_extract_props",
    """
    SELECT CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) % 10 AS k_mod,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured surface (§2.8 map/json): JSON path extraction."""
    ev = _t(spark, sf_dir)["events"]
    return (
        ev.withColumn(
            "k_mod", F.get_json_object(F.col("props"), "$.k").cast("bigint") % 10
        )
        .groupBy("k_mod")
        .agg(F.count("*").alias("n"), dsum(F.col("value")).alias("sum_value"))
    )


@register(
    "map_fallback_lang",
    """
    SELECT CASE lang WHEN 'zh' THEN 'chinese' WHEN 'de' THEN 'german'
                     ELSE lang END AS lang_full,
           COUNT(*) AS n
    FROM documents GROUP BY 1
    """,
)
def map_fallback_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary translation with identity fallback (P12)."""
    docs = _t(spark, sf_dir)["documents"]
    return (
        docs.select(
            map_fallback(F.col("lang"), {"zh": "chinese", "de": "german"}).alias(
                "lang_full"
            )
        )
        .groupBy("lang_full")
        .agg(F.count("*").alias("n"))
    )


@register(
    "slice_id_expansion",
    """
    WITH ids(id) AS (VALUES ('S-1_3'), ('X-7'), ('T-10_12')),
    parts AS (
      SELECT id,
             REGEXP_EXTRACT(id, '^(.*)-(\\d+)_(\\d+)$', 1) AS base,
             TRY_CAST(REGEXP_EXTRACT(id, '^(.*)-(\\d+)_(\\d+)$', 2) AS INT) AS lo,
             TRY_CAST(REGEXP_EXTRACT(id, '^(.*)-(\\d+)_(\\d+)$', 3) AS INT) AS hi
      FROM ids)
    SELECT id, base || '-' || CAST(n AS VARCHAR) AS expanded_id
      FROM parts, UNNEST(GENERATE_SERIES(lo, hi)) AS t(n) WHERE lo IS NOT NULL
    UNION ALL
    SELECT id, id AS expanded_id FROM parts WHERE lo IS NULL
    """,
)
def slice_id_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator/UDTF shape (F5): BASE-n1_n2 → one row per slice id.

    Reference: dags/utils.py:63,1221-1230 (_generate_slices).
    """
    ids = spark.createDataFrame([("S-1_3",), ("X-7",), ("T-10_12",)], "id string")
    return ids.select(
        "id", F.explode(expand_slice_ids(F.col("id"))).alias("expanded_id")
    )
