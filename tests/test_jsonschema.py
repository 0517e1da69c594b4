"""Document-level JSON-Schema validation (V1): three-way parity.

The compiled Spark predicates, the pure-Python validator, and the
mapInPandas JSON-string fallback must agree rule-for-rule on the same
documents.
"""

import json

import pytest

from pyspark.sql import functions as F

from ingest_pipeline_spark.validate.jsonschema import (
    json_docs_violation_counts,
    schema_checks,
    schema_violation_counts,
    validate_instance,
)

SCHEMA = {
    "type": "object",
    "required": ["name", "tags"],
    "properties": {
        "name": {"type": "string", "minLength": 2, "pattern": "^[a-z]"},
        "score": {"type": "number", "minimum": 0, "maximum": 10},
        "level": {"type": "integer"},
        "kind": {"enum": ["a", "b"]},
        "tags": {
            "type": "array",
            "minItems": 1,
            "maxItems": 3,
            "items": {"type": "string", "minLength": 1},
        },
        "owner": {
            "type": "object",
            "required": ["email"],
            "properties": {"email": {"pattern": "@"}},
        },
    },
}

DOCS = [
    {"name": "alpha", "score": 5.0, "level": 1, "kind": "a",
     "tags": ["x", "y"], "owner": {"email": "a@b"}},
    {"name": "B", "score": -1.0, "level": 2, "kind": "z",
     "tags": [], "owner": {"email": "nope"}},          # name len+case, score min, enum, minItems, owner pattern
    {"score": 11.0, "level": 2.5, "tags": ["", "x", "y", "z"]},  # required name, score max, level frac, items minLength, maxItems
    {"name": "gamma", "tags": ["ok"], "owner": {}},     # owner.email required
]


def _docs_df(spark):
    rows = [(json.dumps(d),) for d in DOCS]
    raw = spark.createDataFrame(rows, "js string")
    doc_type = (
        "struct<name:string, score:double, level:double, kind:string, "
        "tags:array<string>, owner:struct<email:string>>"
    )
    return raw.select(F.from_json("js", doc_type).alias("doc"), "js")


def _py_counts():
    from collections import Counter

    c = Counter()
    for d in DOCS:
        for rid in set(validate_instance(d, SCHEMA)):
            c[rid] += 1
    return dict(c)


def test_python_validator_rules():
    got = _py_counts()
    assert got == {
        "$.name: required": 1,
        "$.name: minLength": 1,
        "$.name: pattern": 1,
        "$.score: minimum": 1,
        "$.score: maximum": 1,
        "$.level: type": 1,
        "$.kind: enum": 1,
        "$.tags: minItems": 1,
        "$.tags: maxItems": 1,
        "$.tags[*]: minLength": 1,
        "$.owner.email: required": 1,
        "$.owner.email: pattern": 1,
    }


def test_compiled_matches_python(spark):
    df = _docs_df(spark)
    got = {
        r.rule: r.n_violations
        for r in schema_violation_counts(df, "doc", SCHEMA).collect()
    }
    py = _py_counts()
    # compiled path emits every rule (zero-count included); python path
    # only emits hits — compare on the union
    for rule, n in py.items():
        assert got[rule] == n, rule
    for rule, n in got.items():
        assert py.get(rule, 0) == n, rule


def test_json_fallback_matches_python(spark):
    df = _docs_df(spark)
    got = {
        r.rule: r.n_violations
        for r in json_docs_violation_counts(df, "js", SCHEMA).collect()
    }
    assert got == _py_counts()


def test_static_type_mismatch_flags_all_present():
    # schema says integer, column is string: every present value violates
    from ingest_pipeline_spark.session import get_spark

    spark = get_spark("ingest_pipeline_spark_tests")
    df = spark.createDataFrame(
        [("x",), (None,)], "v string"
    ).select(F.struct(F.col("v").alias("v")).alias("doc"))
    rules = dict(schema_checks(df, "doc", {"properties": {"v": {"type": "integer"}}}))
    assert "$.v: type" in rules
    n = df.select(F.sum(F.when(rules["$.v: type"], 1).otherwise(0)).alias("n")).first().n
    assert n == 1


def test_parse_error_counted(spark):
    df = spark.createDataFrame([("{bad json",), ('{"name":"ok","tags":["t"]}',)], "js string")
    got = {
        r.rule: r.n_violations
        for r in json_docs_violation_counts(df, "js", SCHEMA).collect()
    }
    assert got == {"$: parse": 1}
