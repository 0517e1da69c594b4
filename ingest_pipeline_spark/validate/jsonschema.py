"""Document-level JSON-Schema validation (SURVEY §2.9 V1).

The reference validates every emitted document against YAML
JSON-Schemas via the jsonschema library (reference
dags/schema_utils.py:12-20; call sites dags/utils.py:168,790,1693;
schemata/dataset_metadata_schema.yml).  Spark restatement, two paths
with identical rule semantics:

1. ``schema_checks`` compiles a jsonschema subset — type, required,
   properties (recursive), enum, pattern, minimum/maximum,
   minLength/maxLength, items (recursive), minItems/maxItems — into
   violation predicates over a typed struct column.  All rules for a
   corpus evaluate in ONE scan with a single-row aggregate
   (map-side partial agg), so a 100-rule schema over 100 TB of
   documents costs one pass and no wide shuffle.

2. ``validate_instance`` is the pure-Python mirror (same rule ids,
   same semantics) used (a) for parity tests and (b) inside
   ``json_docs_violation_counts`` — a mapInPandas fallback that
   validates raw JSON strings for documents too dynamic to carry a
   typed schema; per-batch partial counts keep the shuffle tiny.

Semantics notes (typed mode): a missing key ≡ NULL; scalar keyword
rules skip NULL values (only ``required`` flags them); an array rule
counts a document once if ANY element violates (EXISTS semantics).
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    ByteType,
    DataType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
)

PredFn = Callable[[Column], Column]

_INTEGRAL = (ByteType, ShortType, IntegerType, LongType)
_FRACTIONAL = (FloatType, DoubleType, DecimalType)


def _type_ok(js_type: str, dtype: DataType) -> bool:
    if js_type == "object":
        return isinstance(dtype, StructType)
    if js_type == "array":
        return isinstance(dtype, ArrayType)
    if js_type == "string":
        return isinstance(dtype, StringType)
    if js_type == "boolean":
        return isinstance(dtype, BooleanType)
    if js_type == "integer":
        return isinstance(dtype, _INTEGRAL + _FRACTIONAL)
    if js_type == "number":
        return isinstance(dtype, _INTEGRAL + _FRACTIONAL)
    return True  # unknown type keyword: no static claim


def _guarded(fn: Callable[[Column], Column]) -> PredFn:
    """Scalar keyword rules skip NULLs — only `required` flags those."""
    return lambda c: c.isNotNull() & F.coalesce(fn(c), F.lit(False))


def _compile(schema: dict, dtype: DataType, path: str) -> list[tuple[str, PredFn]]:
    rules: list[tuple[str, PredFn]] = []
    js_type = schema.get("type")
    if js_type is not None and not _type_ok(js_type, dtype):
        # statically impossible type: every present value violates
        rules.append((f"{path}: type", lambda c: c.isNotNull()))
        return rules
    if js_type == "integer" and isinstance(dtype, _FRACTIONAL):
        rules.append((f"{path}: type", _guarded(lambda c: c != F.floor(c))))

    # bind keyword values via default args — a plain closure over a
    # reassigned local would make sibling rules share the LAST value
    if "enum" in schema:
        vals = list(schema["enum"])
        rules.append((f"{path}: enum", _guarded(lambda c, v=vals: ~c.isin(*v))))
    if "pattern" in schema:
        rx = schema["pattern"]
        rules.append((f"{path}: pattern", _guarded(lambda c, rx=rx: ~c.rlike(rx))))
    if "minLength" in schema:
        n = int(schema["minLength"])
        rules.append((f"{path}: minLength", _guarded(lambda c, n=n: F.length(c) < n)))
    if "maxLength" in schema:
        n = int(schema["maxLength"])
        rules.append((f"{path}: maxLength", _guarded(lambda c, n=n: F.length(c) > n)))
    if "minimum" in schema:
        lo = schema["minimum"]
        rules.append((f"{path}: minimum", _guarded(lambda c, lo=lo: c < F.lit(lo))))
    if "maximum" in schema:
        hi = schema["maximum"]
        rules.append((f"{path}: maximum", _guarded(lambda c, hi=hi: c > F.lit(hi))))

    if isinstance(dtype, StructType):
        fields = {f.name: f.dataType for f in dtype.fields}
        for k in schema.get("required", []):
            if k in fields:
                rules.append(
                    (
                        f"{path}.{k}: required",
                        (lambda k: lambda c: c.isNotNull() & c.getField(k).isNull())(k),
                    )
                )
            else:
                # field absent from the DataFrame schema: every present
                # document is missing it
                rules.append((f"{path}.{k}: required", lambda c: c.isNotNull()))
        for k, sub in sorted(schema.get("properties", {}).items()):
            if k not in fields:
                continue
            for rid, fn in _compile(sub, fields[k], f"{path}.{k}"):
                rules.append((rid, (lambda k, fn: lambda c: fn(c.getField(k)))(k, fn)))

    if isinstance(dtype, ArrayType):
        if "minItems" in schema:
            n = int(schema["minItems"])
            rules.append((f"{path}: minItems", _guarded(lambda c, n=n: F.size(c) < n)))
        if "maxItems" in schema:
            n = int(schema["maxItems"])
            rules.append((f"{path}: maxItems", _guarded(lambda c, n=n: F.size(c) > n)))
        if "items" in schema:
            for rid, fn in _compile(schema["items"], dtype.elementType, f"{path}[*]"):
                rules.append(
                    (
                        rid,
                        (
                            lambda fn: lambda c: c.isNotNull()
                            & F.exists(c, lambda x: F.coalesce(fn(x), F.lit(False)))
                        )(fn),
                    )
                )
    return rules


def schema_checks(df: DataFrame, doc_col: str, schema: dict) -> list[tuple[str, Column]]:
    """Compile ``schema`` against the typed struct column ``doc_col``.

    Returns [(rule_id, violation_predicate)] in deterministic order.
    """
    dtype = df.schema[doc_col].dataType
    return [(rid, fn(F.col(doc_col))) for rid, fn in _compile(schema, dtype, "$")]


def schema_violation_counts(df: DataFrame, doc_col: str, schema: dict) -> DataFrame:
    """One-pass violation census: (rule, n_violations) per compiled rule.

    Single scan + single-row aggregate + explode — no per-rule passes.
    """
    checks = schema_checks(df, doc_col, schema)
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(f"__r{i}")
        for i, (_, pred) in enumerate(checks)
    ]
    wide = df.agg(*aggs)
    names = F.array(*[F.lit(rid) for rid, _ in checks])
    counts = F.array(*[F.col(f"__r{i}") for i in range(len(checks))])
    return wide.select(
        F.explode(
            F.arrays_zip(names.alias("rule"), counts.alias("n_violations"))
        ).alias("z")
    ).select(F.col("z.rule").alias("rule"), F.col("z.n_violations").alias("n_violations"))


# ---------------------------------------------------------------------------
# pure-Python mirror: full-fidelity fallback + parity oracle for tests
# ---------------------------------------------------------------------------


def _py_type_ok(js_type: str, v: object) -> bool:
    if js_type == "object":
        return isinstance(v, dict)
    if js_type == "array":
        return isinstance(v, list)
    if js_type == "string":
        return isinstance(v, str)
    if js_type == "boolean":
        return isinstance(v, bool)
    if js_type == "integer":
        return isinstance(v, int) and not isinstance(v, bool) or (
            isinstance(v, float) and float(v).is_integer()
        )
    if js_type == "number":
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    return True


def validate_instance(obj: object, schema: dict, path: str = "$") -> list[str]:
    """Violated rule ids for one document — same ids/semantics as the
    compiled Spark path (missing key ≡ None; NULL skips scalar rules;
    any-element semantics for arrays)."""
    out: list[str] = []
    if obj is None:
        return out
    js_type = schema.get("type")
    if js_type is not None and not _py_type_ok(js_type, obj):
        out.append(f"{path}: type")
        return out
    if "enum" in schema and obj not in schema["enum"]:
        out.append(f"{path}: enum")
    if "pattern" in schema and isinstance(obj, str) and not re.search(schema["pattern"], obj):
        out.append(f"{path}: pattern")
    if "minLength" in schema and isinstance(obj, str) and len(obj) < schema["minLength"]:
        out.append(f"{path}: minLength")
    if "maxLength" in schema and isinstance(obj, str) and len(obj) > schema["maxLength"]:
        out.append(f"{path}: maxLength")
    if "minimum" in schema and isinstance(obj, (int, float)) and obj < schema["minimum"]:
        out.append(f"{path}: minimum")
    if "maximum" in schema and isinstance(obj, (int, float)) and obj > schema["maximum"]:
        out.append(f"{path}: maximum")
    if isinstance(obj, dict):
        for k in schema.get("required", []):
            if obj.get(k) is None:
                out.append(f"{path}.{k}: required")
        for k, sub in sorted(schema.get("properties", {}).items()):
            if obj.get(k) is not None:
                out.extend(validate_instance(obj[k], sub, f"{path}.{k}"))
    if isinstance(obj, list):
        if "minItems" in schema and len(obj) < schema["minItems"]:
            out.append(f"{path}: minItems")
        if "maxItems" in schema and len(obj) > schema["maxItems"]:
            out.append(f"{path}: maxItems")
        if "items" in schema:
            hit: set[str] = set()
            for elt in obj:
                for rid in validate_instance(elt, schema["items"], f"{path}[*]"):
                    hit.add(rid)
            out.extend(sorted(hit))
    return out


def compile_python_validator(schema: dict, path: str = "$"):
    """Compile ``schema`` once into a closure tree: ``fn(obj, out)``
    appends violated rule ids to ``out``.

    Same ids/semantics as ``validate_instance`` (the readable reference
    implementation, kept for tests), but rule-id strings, compiled
    regexes, and property lists are built ONCE instead of per document
    — measured ~3× on the mapInPandas fallback's per-doc loop.
    """
    js_type = schema.get("type")
    type_id = f"{path}: type"
    scalar_checks = []

    if "enum" in schema:
        vals, rid = list(schema["enum"]), f"{path}: enum"
        scalar_checks.append(
            lambda v, out, vals=vals, rid=rid: out.append(rid) if v not in vals else None
        )
    if "pattern" in schema:
        rx, rid = re.compile(schema["pattern"]), f"{path}: pattern"
        scalar_checks.append(
            lambda v, out, rx=rx, rid=rid: out.append(rid)
            if isinstance(v, str) and not rx.search(v)
            else None
        )
    if "minLength" in schema:
        n, rid = schema["minLength"], f"{path}: minLength"
        scalar_checks.append(
            lambda v, out, n=n, rid=rid: out.append(rid)
            if isinstance(v, str) and len(v) < n
            else None
        )
    if "maxLength" in schema:
        n, rid = schema["maxLength"], f"{path}: maxLength"
        scalar_checks.append(
            lambda v, out, n=n, rid=rid: out.append(rid)
            if isinstance(v, str) and len(v) > n
            else None
        )
    if "minimum" in schema:
        lo, rid = schema["minimum"], f"{path}: minimum"
        scalar_checks.append(
            lambda v, out, lo=lo, rid=rid: out.append(rid)
            if isinstance(v, (int, float)) and v < lo
            else None
        )
    if "maximum" in schema:
        hi, rid = schema["maximum"], f"{path}: maximum"
        scalar_checks.append(
            lambda v, out, hi=hi, rid=rid: out.append(rid)
            if isinstance(v, (int, float)) and v > hi
            else None
        )

    required = [(k, f"{path}.{k}: required") for k in schema.get("required", [])]
    properties = [
        (k, compile_python_validator(sub, f"{path}.{k}"))
        for k, sub in sorted(schema.get("properties", {}).items())
    ]
    min_items = (int(schema["minItems"]), f"{path}: minItems") if "minItems" in schema else None
    max_items = (int(schema["maxItems"]), f"{path}: maxItems") if "maxItems" in schema else None
    items_fn = (
        compile_python_validator(schema["items"], f"{path}[*]")
        if "items" in schema
        else None
    )

    def validate(obj, out: list) -> None:
        if obj is None:
            return
        if js_type is not None and not _py_type_ok(js_type, obj):
            out.append(type_id)
            return
        for chk in scalar_checks:
            chk(obj, out)
        if isinstance(obj, dict):
            for k, rid in required:
                if obj.get(k) is None:
                    out.append(rid)
            for k, fn in properties:
                v = obj.get(k)
                if v is not None:
                    fn(v, out)
        if isinstance(obj, list):
            if min_items and len(obj) < min_items[0]:
                out.append(min_items[1])
            if max_items and len(obj) > max_items[0]:
                out.append(max_items[1])
            if items_fn is not None:
                hit: list = []
                for elt in obj:
                    items_fn(elt, hit)
                out.extend(set(hit))
    return validate


def json_docs_violation_counts(
    df: DataFrame, json_col: str, schema: dict
) -> DataFrame:
    """Full-fidelity fallback over raw JSON strings: (rule, n_violations).

    mapInPandas emits per-batch PARTIAL counts (a few rows each), so
    the final groupBy shuffles rule-count rows, never documents.
    Unparseable JSON counts under rule ``$: parse``.
    """
    import json as _json
    from collections import Counter
    from collections.abc import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: Counter = Counter()
        # compile the schema into closures ONCE per task, not per doc
        check = compile_python_validator(schema)
        for pdf in batches:
            for s in pdf[json_col]:
                if s is None:
                    continue
                try:
                    doc = _json.loads(s)
                except (ValueError, TypeError):
                    counts["$: parse"] += 1
                    continue
                hit: list = []
                check(doc, hit)
                for rid in set(hit):
                    counts[rid] += 1
        if counts:
            yield pd.DataFrame(
                {"rule": list(counts.keys()),
                 "n_violations": [int(v) for v in counts.values()]}
            )

    partial = df.select(json_col).mapInPandas(run, "rule string, n_violations long")
    return partial.groupBy("rule").agg(
        F.sum("n_violations").cast("long").alias("n_violations")
    )
