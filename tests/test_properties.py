"""Property-based tests (hypothesis) for invariants the oracle can't state.

The reference has no property tests (SURVEY §5); these go beyond its
strategy: algebraic invariants that must hold for ANY input, not just
the synthetic tables.
"""

import re

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

WORD = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8)
SENTENCES = st.lists(WORD, min_size=0, max_size=30)

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(words=SENTENCES)
@_SETTINGS
def test_fingerprint_permutation_invariant(spark, words):
    """fingerprint_md5 is invariant under token order and duplication."""
    from ingest_pipeline_spark.functions.text import fingerprint_md5

    text = " ".join(words)
    text_rev = " ".join(reversed(words))
    text_dup = " ".join(words + words)
    df = spark.createDataFrame(
        [(text,), (text_rev,), (text_dup,)], "text string"
    )
    fps = [r.fp for r in df.select(fingerprint_md5(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] == fps[2]


@given(words=st.lists(WORD, min_size=3, max_size=25))
@_SETTINGS
def test_minhash_identical_docs_identical_sigs(spark, words):
    """Identical docs always produce identical signatures; signatures
    are insensitive to shingle duplication (set semantics)."""
    from ingest_pipeline_spark.operators.dedup import minhash_signatures

    text = " ".join(words)
    doubled = " ".join(words + words[:1])  # same shingle set? no — guard below
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    sigs = {r.id: tuple(r.signature) for r in minhash_signatures(df, "text", "doc_id").collect()}
    assert sigs[1] == sigs[2]


@given(vals=st.lists(st.sampled_from(["TRUE", "t", " yes ", "1", "no", "FALSE", "x", ""]), min_size=1, max_size=8))
@_SETTINGS
def test_parse_bool_matches_python_reference(spark, vals):
    from ingest_pipeline_spark.functions.scalars import parse_bool

    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = [r.b for r in df.select(parse_bool(F.col("s")).alias("b")).collect()]
    expected = [v.strip().upper() in ("TRUE", "T", "1", "Y", "YES") for v in vals]
    assert got == expected


@given(ids=st.lists(st.tuples(WORD, st.integers(0, 20), st.integers(0, 20)), min_size=1, max_size=6))
@_SETTINGS
def test_slice_expansion_cardinality(spark, ids):
    """BASE-lo_hi expands to exactly hi-lo+1 rows when lo<=hi."""
    from ingest_pipeline_spark.functions.scalars import expand_slice_ids

    rows = [(f"{base}-{lo}_{lo + extra}",) for base, lo, extra in ids]
    df = spark.createDataFrame(rows, "id string")
    out = df.select("id", F.size(expand_slice_ids(F.col("id"))).alias("n")).collect()
    expected = {f"{base}-{lo}_{lo + extra}": extra + 1 for base, lo, extra in ids}
    for r in out:
        assert r.n == expected[r.id], r


# ---------------------------------------------------------------------------
# JSON-Schema compiler parity: compiled Spark predicates == pure-Python
# validator for ANY (schema, doc corpus) this generator can produce.
# Docs are type-correct per field (from_json would null wrong-typed
# values, which is the documented missing≡NULL semantics, while the
# python validator would flag them) — so the property covers value-level
# rules: required / enum / bounds / lengths / minItems / maxItems.
# ---------------------------------------------------------------------------

_FIELD_KINDS = st.sampled_from(["int_bounded", "str_len", "str_enum", "arr_str"])


@st.composite
def _schema_and_docs(draw):
    n_fields = draw(st.integers(1, 3))
    props, ddl_parts = {}, []
    kinds = {}
    for i in range(n_fields):
        name = f"f{i}"
        kind = draw(_FIELD_KINDS)
        kinds[name] = kind
        if kind == "int_bounded":
            lo = draw(st.integers(-5, 0))
            hi = draw(st.integers(1, 9))
            props[name] = {"type": "integer", "minimum": lo, "maximum": hi}
            ddl_parts.append(f"{name} long")
        elif kind == "str_len":
            props[name] = {"type": "string", "minLength": 2, "maxLength": 5}
            ddl_parts.append(f"{name} string")
        elif kind == "str_enum":
            props[name] = {"type": "string", "enum": ["a", "b"]}
            ddl_parts.append(f"{name} string")
        else:
            props[name] = {
                "type": "array", "minItems": 1, "maxItems": 3,
                "items": {"type": "string", "minLength": 1},
            }
            ddl_parts.append(f"{name} array<string>")
    required = draw(st.lists(st.sampled_from(sorted(props)), unique=True, max_size=n_fields))
    schema = {"type": "object", "required": required, "properties": props}
    ddl = "struct<" + ", ".join(ddl_parts) + ">"

    def field_value(kind):
        if kind == "int_bounded":
            return draw(st.one_of(st.none(), st.integers(-10, 15)))
        if kind == "str_len":
            return draw(st.one_of(st.none(), st.text("xy", min_size=0, max_size=8)))
        if kind == "str_enum":
            return draw(st.one_of(st.none(), st.sampled_from(["a", "b", "c", ""])))
        return draw(
            st.one_of(
                st.none(),
                st.lists(st.text("pq", min_size=0, max_size=3), max_size=5),
            )
        )

    docs = []
    for _ in range(draw(st.integers(1, 6))):
        docs.append({k: field_value(kinds[k]) for k in props})
    return schema, ddl, docs


@given(case=_schema_and_docs())
@_SETTINGS
def test_jsonschema_compiled_matches_python_any_schema(spark, case):
    import json
    from collections import Counter

    from ingest_pipeline_spark.validate.jsonschema import (
        schema_violation_counts,
        validate_instance,
    )

    schema, ddl, docs = case
    py = Counter()
    for d in docs:
        for rid in set(validate_instance(d, schema)):
            py[rid] += 1

    # the compiled-closure python validator must agree with the
    # interpreted reference on every doc
    from ingest_pipeline_spark.validate.jsonschema import compile_python_validator

    check = compile_python_validator(schema)
    comp = Counter()
    for d in docs:
        hit = []
        check(d, hit)
        for rid in set(hit):
            comp[rid] += 1
    assert comp == py, (schema, docs)
    df = spark.createDataFrame(
        [(json.dumps(d),) for d in docs], "js string"
    ).select(F.from_json("js", ddl).alias("doc"))
    got = {
        r.rule: r.n_violations
        for r in schema_violation_counts(df, "doc", schema).collect()
    }
    for rule, n in got.items():
        assert py.get(rule, 0) == n, (rule, schema, docs)
    for rule, n in py.items():
        assert got.get(rule, 0) == n, (rule, schema, docs)


# ---------------------------------------------------------------------------
# Round-5 operator invariants
# ---------------------------------------------------------------------------

_KEYS = st.integers(0, 9)


@given(
    tgt=st.dictionaries(_KEYS, st.integers(-100, 100), max_size=8),
    src=st.dictionaries(_KEYS, st.tuples(st.integers(-100, 100), st.booleans()), max_size=8),
)
@_SETTINGS
def test_merge_upsert_key_algebra(spark, tgt, src):
    """Output keys == (target - matched-deleted) ∪ source-only, and the
    _merge_action census matches the set algebra exactly."""
    from ingest_pipeline_spark.operators.merge import merge_upsert

    tdf = spark.createDataFrame(
        [(k, float(v)) for k, v in tgt.items()] or [(None, None)],
        "key long, v double",
    ).filter(F.col("key").isNotNull())
    sdf = spark.createDataFrame(
        [(k, float(v), d) for k, (v, d) in src.items()] or [(None, None, None)],
        "key long, v double, del boolean",
    ).filter(F.col("key").isNotNull())
    out = merge_upsert(tdf, sdf, ["key"], delete_col="del").collect()

    matched = set(tgt) & set(src)
    deleted = {k for k in matched if src[k][1]}
    expect_keys = (set(tgt) - deleted) | (set(src) - set(tgt))
    assert {r["key"] for r in out} == expect_keys
    actions = {r["key"]: r["_merge_action"] for r in out}
    for k in expect_keys:
        if k in matched:
            assert actions[k] == "updated" and k not in deleted
        elif k in src:
            assert actions[k] == "inserted"
        else:
            assert actions[k] == "kept"
    # matched rows take the source value
    vals = {r["key"]: r["v"] for r in out}
    for k in matched - deleted:
        assert vals[k] == float(src[k][0])


@given(rows=st.lists(st.tuples(st.sampled_from("abc"), st.integers(-50, 50)), min_size=1, max_size=40))
@_SETTINGS
def test_salted_agg_equals_plain_agg(spark, rows):
    """salted_agg is result-identical to the plain groupBy for any data
    and any salt assignment (algebraic merge)."""
    from ingest_pipeline_spark.operators.skew import salted_agg

    df = spark.createDataFrame(rows, "k string, v long")
    salted = {
        (r["k"]): (r["n"], r["s"])
        for r in salted_agg(
            df, ["k"],
            stage1={"n": F.count("*"), "s": F.sum("v")},
            stage2={"n": F.sum("n"), "s": F.sum("s")},
            salt_buckets=7,
        ).collect()
    }
    plain = {
        (r["k"]): (r["n"], r["s"])
        for r in df.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()
    }
    assert salted == plain


@given(vals=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=60))
@_SETTINGS
def test_cms_never_underestimates_any_multiset(spark, vals):
    """CMS point estimates are >= true frequency for ANY input."""
    from collections import Counter

    from ingest_pipeline_spark.operators.sketches import cms_counters, cms_estimate

    df = spark.createDataFrame([(v,) for v in vals], "k long")
    counters = cms_counters(df, "k", d=3, w=16)
    est = {
        r["k"]: r["est_count"]
        for r in cms_estimate(counters, df.distinct(), "k", d=3, w=16).collect()
    }
    truth = Counter(vals)
    assert set(est) == set(truth)
    for k, n in truth.items():
        assert est[k] >= n


@given(
    members=st.sets(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=40),
    probes=st.sets(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=40),
)
@_SETTINGS
def test_bloom_never_false_negative_any_sets(spark, members, probes):
    from ingest_pipeline_spark.operators.sketches import bloom_bits, bloom_probe

    b = spark.createDataFrame([(v,) for v in members], "k long")
    p = spark.createDataFrame([(v,) for v in probes], "k long")
    bits = bloom_bits(b, "k", k=3, m=256)
    out = {r["k"]: r["is_candidate"] for r in bloom_probe(p, "k", bits, k=3, m=256).collect()}
    for v in probes & members:
        assert out[v], f"false negative on {v}"


@given(vals=st.sets(st.text(alphabet="abcdef012345", min_size=1, max_size=10), min_size=1, max_size=50))
@_SETTINGS
def test_hll_merge_identity_any_split(spark, vals):
    """finalize(max-merge(registers(A), registers(B))) == hll(A∪B) for
    ANY value set and ANY split of it."""
    from ingest_pipeline_spark.operators.sketches import (
        hll_distinct,
        hll_estimate,
        hll_registers,
    )

    vs = sorted(vals)
    half = len(vs) // 2
    a = spark.createDataFrame([("g", v) for v in vs[:half]] or [("g", vs[0])], "grp string, v string")
    b = spark.createDataFrame([("g", v) for v in vs[half:]], "grp string, v string")
    direct = hll_distinct(a.union(b), "grp", "v").collect()[0]
    merged_regs = (
        hll_registers(a, "grp", "v")
        .union(hll_registers(b, "grp", "v"))
        .groupBy("grp", "bucket")
        .agg(F.max("mj").alias("mj"))
    )
    merged = hll_estimate(merged_regs, "grp").collect()[0]
    assert direct["est_distinct"] == merged["est_distinct"]


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 50), st.integers(-1000, 1000)),
        min_size=1,
        max_size=60,
    )
)
@_SETTINGS
def test_prefix_scans_match_python_fold_any_input(spark, rows):
    """running_sum / running_max_exclusive / global_row_number equal a
    pure-Python fold over the sorted rows, for ANY multiset of values
    (duplicate sort values included — the id tiebreak totalizes)."""
    from ingest_pipeline_spark.operators.prefix import (
        global_row_number,
        running_max_exclusive,
        running_sum,
    )

    df = spark.createDataFrame(
        [(i, v, x) for i, (v, x) in enumerate(rows)], "id long, v long, x long"
    ).localCheckpoint()
    order = [F.asc("v"), F.asc("id")]
    key = sorted((v, i) for i, (v, _) in enumerate(rows))
    xs = {i: x for i, (_, x) in enumerate(rows)}

    cum, mx, ref_cum, ref_max, ref_rn = 0, None, {}, {}, {}
    for rn, (_, i) in enumerate(key, start=1):
        ref_max[i] = mx
        cum += xs[i]
        mx = xs[i] if mx is None else max(mx, xs[i])
        ref_cum[i] = cum
        ref_rn[i] = rn

    got_cum = {r.id: r.c for r in running_sum(df, order, "x", "c").collect()}
    assert got_cum == ref_cum
    got_max = {
        r.id: r.m for r in running_max_exclusive(df, order, "x", "m").collect()
    }
    assert got_max == ref_max
    got_rn = {r.id: r.rn for r in global_row_number(df, order, "rn").collect()}
    assert got_rn == ref_rn


@given(
    base=st.dictionaries(st.integers(0, 20), st.integers(-99, 99), max_size=10),
    changes=st.lists(
        st.tuples(
            st.integers(0, 20),          # key
            st.integers(-99, 99),        # value
            st.booleans(),               # delete?
        ),
        max_size=15,
    ),
)
@_SETTINGS
def test_cdc_apply_matches_python_fold(spark, base, changes):
    """cdc_apply == replaying the change log in sequence order over a
    dict, for ANY base/changes (multiple changes per key, deletes on
    unseen keys, re-inserts after delete)."""
    from ingest_pipeline_spark.operators.merge import cdc_apply

    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(None, None)], "key long, v long"
    )
    if not base:
        base_df = base_df.filter(F.col("key").isNotNull())
    ch_df = spark.createDataFrame(
        [(k, v, seq, "D" if d else "U") for seq, (k, v, d) in enumerate(changes)]
        or [(None, None, None, None)],
        "key long, v long, seq long, op string",
    )
    if not changes:
        ch_df = ch_df.filter(F.col("key").isNotNull())

    state = dict(base)
    for k, v, d in changes:  # sequence order = list order
        if d:
            state.pop(k, None)
        else:
            state[k] = v

    got = {
        r.key: r.v for r in cdc_apply(base_df, ch_df, ["key"], ["seq"]).collect()
    }
    assert got == state


@given(
    st.binary(max_size=4000),
)
@settings(max_examples=200, deadline=None)
def test_lzw_roundtrip_property(data):
    """TIFF-variant LZW: decode(encode(x)) == x for ARBITRARY bytes —
    hypothesis shrinks any width-boundary / KwKwK / reset-path
    counterexample to a minimal failing string."""
    from ingest_pipeline_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    assert _lzw_decode(_lzw_encode(data)) == data
