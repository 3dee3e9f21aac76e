"""Columnar (pure-Column) tier: agreement with suite verdicts and with the
interpreter tier, end-to-end on Spark.

The FULL-suite sweep (every lowerable schema × every case) lives in
scripts/columnar_sweep.py — run per-round; here we test a deterministic
sample per draft plus targeted regressions from the round-1 ADVICE."""

import json

import pytest
import pyspark.sql.functions as F

from json_schemer_spark import compile_schema
from json_schemer_spark.schema.columnar import lowerable, validate_json_column_lowered
from json_schemer_spark.schema.dialects import DRAFT202012
from json_schemer_spark.schema.interpreter import Evaluator
from json_schemer_spark.schema.suite import iter_cases, make_evaluator


def _lowerable_schemas(draft, limit):
    by_schema = {}
    for c in iter_cases(draft):
        by_schema.setdefault(id(c.schema), (c.schema, []))[1].append(c)
    out = []
    total = 0
    for _, (schema, cases) in by_schema.items():
        total += 1
        dialect = make_evaluator(schema, draft).root_resource.dialect
        if lowerable(schema, dialect):
            out.append((schema, dialect, cases))
    # deterministic spread over the whole list
    step = max(1, len(out) // limit)
    return out[::step][:limit], len(out), total


@pytest.mark.parametrize(
    "draft", ["draft4", "draft6", "draft7", "draft2019-09", "draft2020-12"]
)
def test_columnar_matches_suite_sample(spark, draft):
    sample, n_lowerable, n_total = _lowerable_schemas(draft, limit=15)
    assert sample, "no lowerable schemas found"
    # the round-2 widening must not regress: most suite schemas lower
    assert n_lowerable / n_total >= 0.70, f"{draft}: only {n_lowerable}/{n_total} lowerable"
    for schema, dialect, cases in sample:
        df = spark.createDataFrame(
            [(c.valid, json.dumps(c.data)) for c in cases],
            "expected boolean, content string",
        )
        out = validate_json_column_lowered(df, "content", schema, dialect)
        bad = out.filter(F.col("valid") != F.col("expected")).collect()
        assert not bad, f"{draft} {json.dumps(schema)[:80]}: {bad[:3]}"


def test_tiers_agree_on_corpus(spark):
    from json_schemer_spark.sources.corpus import FLAGSHIP_SCHEMA, generate_corpus

    plan = compile_schema(FLAGSHIP_SCHEMA)
    assert plan.is_lowerable()
    corpus = generate_corpus(spark, 5_000)
    low = plan.validate_json_column(corpus, "content")
    interp = plan.validate_json_column(corpus, "content", force_interpreter=True)
    n_low = low.filter("valid").count()
    n_int = interp.filter("valid").count()
    assert n_low == n_int
    # violation keyword histograms match too
    hist = lambda df: {
        (r.keyword, r.instance_pointer): r["count"]
        for r in df.select(F.explode("violations").alias("v"))
        .select("v.keyword", "v.instance_pointer")
        .groupBy("keyword", "instance_pointer")
        .count()
        .collect()
    }
    assert hist(low) == hist(interp)


def test_violation_pointers(spark):
    plan = compile_schema(
        {
            "type": "object",
            "required": ["a"],
            "properties": {"a": {"type": "integer", "minimum": 3}},
        }
    )
    df = spark.createDataFrame([('{"a": 1}',), ('{}',), ('{"a": "x"}',)], "content string")
    rows = plan.validate_json_column(df, "content").select("violations").collect()
    flat = [(v.keyword, v.instance_pointer) for r in rows for v in r.violations]
    assert ("minimum", "/a") in flat
    assert ("required", "") in flat
    # single-type failures carry the expected type name (classic convention)
    assert ("integer", "/a") in flat


def test_dynamic_violation_pointers(spark):
    """additionalProperties / items violations carry per-key / per-index
    pointers built as Columns (round-2 _Multi machinery)."""
    plan = compile_schema(
        {"properties": {"a": {"type": "string"}},
         "additionalProperties": False,
         "patternProperties": {"^p": {"type": "integer"}}}
    )
    df = spark.createDataFrame([('{"a":"x","b":1,"p1":"no"}',)], "content string")
    rows = plan.validate_json_column(df, "content").select("violations").collect()
    flat = [(v.keyword, v.instance_pointer) for v in rows[0].violations]
    assert ("schema", "/b") in flat
    assert ("patternProperties", "/p1") in flat

    plan2 = compile_schema({"items": {"type": "integer"}})
    df2 = spark.createDataFrame([('[1, "x", 2, "y"]',)], "content string")
    rows2 = plan2.validate_json_column(df2, "content").select("violations").collect()
    flat2 = [(v.keyword, v.instance_pointer) for v in rows2[0].violations]
    assert ("items", "/1") in flat2 and ("items", "/3") in flat2


def _verdicts(spark, schema, datas, dialect=DRAFT202012):
    assert lowerable(schema, dialect)
    df = spark.createDataFrame([(json.dumps(d),) for d in datas], "content string")
    out = validate_json_column_lowered(df, "content", schema, dialect)
    got = [r.valid for r in out.select("valid").collect()]
    ev = Evaluator(schema, dialect=dialect)
    assert got == [ev.valid(d) for d in datas], f"tier disagreement on {schema}"
    return got


def test_advice_r1_key_collision(spark):
    # ADVICE r1 (high): nested property chains must not alias flat names
    got = _verdicts(
        spark,
        {"type": "object", "properties": {
            "a": {"type": "object", "properties": {"b": {"type": "string"}}},
            "a_p_b": {"type": "integer"}}},
        [{"a": {"b": "ok"}, "a_p_b": 1}, {"a": {"b": 2}, "a_p_b": 1}],
    )
    assert got == [True, False]


def test_advice_r1_bigint_precision(spark):
    # ADVICE r1 (medium): exact comparisons beyond 2^53
    assert _verdicts(spark, {"maximum": 9007199254740992},
                     [9007199254740993, 9007199254740992]) == [False, True]
    assert _verdicts(spark, {"const": 9007199254740993},
                     [9007199254740993, 9007199254740992]) == [True, False]
    assert _verdicts(spark, {"exclusiveMinimum": 9007199254740992},
                     [9007199254740993, 9007199254740992]) == [True, False]


def test_advice_r1_pattern_dollar(spark):
    # ADVICE r1 (medium): ECMA '$' ≠ Java '$' before trailing newline
    assert _verdicts(spark, {"pattern": "^foo$"}, ["foo", "foo\n"]) == [True, False]


def test_ref_inlining_and_new_keywords(spark):
    assert _verdicts(
        spark,
        {"$ref": "#/$defs/pos", "$defs": {"pos": {"type": "integer", "minimum": 1}}},
        [3, 0, "x"],
    ) == [True, False, False]
    assert _verdicts(
        spark,
        {"contains": {"type": "integer"}, "minContains": 2, "maxContains": 3},
        [[1, 2], ["a", 1], [1, 2, 3, 4]],
    ) == [True, False, False]
    assert _verdicts(spark, {"uniqueItems": True},
                     [[1, 2], [1, 1.0], [{"a": 1}, {"a": 1}], ["1", 1]]) == [
        True, False, False, True]
    assert _verdicts(spark, {"enum": [[1, 2], {"a": "x"}, "s"]},
                     [[1, 2], [2, 1], {"a": "x"}, "s", 4]) == [
        True, False, True, True, False]
    assert _verdicts(spark, {"dependentRequired": {"a": ["b"]}},
                     [{"a": 1, "b": 2}, {"a": 1}, {}]) == [True, False, True]
    assert _verdicts(spark, {"propertyNames": {"maxLength": 3}},
                     [{"abc": 1}, {"abcd": 1}]) == [True, False]
    assert _verdicts(
        spark,
        {"prefixItems": [{"type": "integer"}], "items": {"type": "string"}},
        [[1, "a"], [1, 2], ["x"]],
    ) == [True, False, False]
    assert _verdicts(
        spark,
        {"properties": {"a": {}}, "unevaluatedProperties": False},
        [{"a": 1}, {"a": 1, "b": 2}],
    ) == [True, False]


def test_interpreter_never_matching_pattern():
    # ADVICE r1 (low): ECMA-valid but Python-uncompilable patterns must not
    # crash — '[]' matches nothing in ECMA
    ev = Evaluator({"pattern": "a[]b"}, dialect=DRAFT202012)
    assert not ev.valid("anything")
    ev2 = Evaluator({"patternProperties": {"x[]y": {"type": "integer"}}}, dialect=DRAFT202012)
    assert ev2.valid({"k": "v"})


def test_format_assertion_lowering(spark):
    """Regex-exact formats (uuid/duration/json-pointer/...) lower under
    assertion; checker-backed formats (date-time) fall back."""
    from json_schemer_spark import compile_schema

    s = compile_schema(
        {"properties": {"id": {"format": "uuid"}, "ttl": {"format": "duration"}}},
        assert_formats=True,
    )
    assert s.is_lowerable()
    assert not compile_schema(
        {"properties": {"t": {"format": "date-time"}}}, assert_formats=True
    ).is_lowerable()
    rows = ['{"id": "123e4567-e89b-12d3-a456-426614174000", "ttl": "P1DT2H"}',
            '{"id": "nope", "ttl": "P1DT2H"}',
            '{"id": "123e4567-e89b-12d3-a456-426614174000", "ttl": "bogus"}',
            '{"id": 5}']
    df = spark.createDataFrame([(r,) for r in rows], "content string")
    out = s.validate_json_column(df, "content")
    assert [r.valid for r in out.select("valid").collect()] == [True, False, False, True]
    assert "MapInPandas" not in out._jdf.queryExecution().executedPlan().toString()


def test_huge_numeric_literals_fall_back(spark):
    """ADVICE r2 (medium): numeric schema literals beyond double/decimal
    range must route to the interpreter, not crash plan build with
    OverflowError or silently compare double-only."""
    from json_schemer_spark import compile_schema

    # 10**400 overflows float() at plan build — valid JSON, must not crash
    plan = compile_schema({"maximum": 10**400})
    assert not plan.is_lowerable()
    df = spark.createDataFrame([('5',), ('1e308',)], "content string")
    assert [r.valid for r in plan.validate_json_column(df, "content").collect()] == [
        True, True]

    # int in [1e26, 1.8e308] that does NOT round-trip double: const/enum
    # equality would be double-only on the columnar tier (false accepts)
    big = 10**27 + 1  # not representable as double
    for schema in ({"const": big}, {"enum": [big]}, {"minimum": big}):
        p = compile_schema(schema)
        assert not p.is_lowerable(), schema
    df2 = spark.createDataFrame([(str(10**27),), (str(big),)], "content string")
    out = compile_schema({"const": big}).validate_json_column(df2, "content")
    assert [r.valid for r in out.collect()] == [False, True]

    # even round-trippable huge ints (powers of two) must NOT lower: the
    # INSTANCE 2**100 + 1 rounds to the literal's double → false accept
    assert not compile_schema({"const": 2**100}).is_lowerable()
    df3 = spark.createDataFrame([(str(2**100),), (str(2**100 + 1),)], "content string")
    out3 = compile_schema({"const": 2**100}).validate_json_column(df3, "content")
    assert [r.valid for r in out3.collect()] == [True, False]

    # in-range literals keep lowering
    assert compile_schema({"const": 2**53 + 1}).is_lowerable()
    assert compile_schema({"maximum": 10**25}).is_lowerable()


def test_data_dependent_unevaluated_lowering(spark):
    """Round-4: data-dependent unevaluated* lowers to the columnar tier
    (SURVEY.md §2.6 general path — gated coverage contributions). Each
    schema exercises one gate kind; verdicts must match the interpreter
    exactly (semantics ref: draft202012/vocab/unevaluated.rb:6-100)."""
    schemas = [
        # anyOf: valid branches contribute names
        {"anyOf": [{"properties": {"foo": {"type": "string"}}, "required": ["foo"]},
                   {"properties": {"bar": {"type": "number"}}, "required": ["bar"]}],
         "unevaluatedProperties": False},
        # if/then/else: arm-dependent coverage
        {"if": {"properties": {"kind": {"const": "a"}}, "required": ["kind"]},
         "then": {"properties": {"x": {"type": "number"}}},
         "else": {"properties": {"y": {"type": "number"}}},
         "properties": {"kind": {"type": "string"}},
         "unevaluatedProperties": False},
        # dependentSchemas: presence-gated coverage
        {"properties": {"foo": True},
         "dependentSchemas": {"foo": {"properties": {"bar": True}}},
         "unevaluatedProperties": False},
        # oneOf + unevaluatedItems: prefix length depends on the branch
        {"oneOf": [{"prefixItems": [{"const": "a"}, {"const": "b"}]},
                   {"prefixItems": [{"const": "x"}]}],
         "unevaluatedItems": False},
        # gated `contains` contributes per-element item coverage
        {"anyOf": [{"contains": {"type": "string"}, "minContains": 2}],
         "unevaluatedItems": {"type": "number"}},
        # nested gates: anyOf inside anyOf (conjunction down the tree)
        {"anyOf": [{"anyOf": [{"properties": {"a": True}, "required": ["a"]}],
                    "properties": {"b": True}}],
         "unevaluatedProperties": False},
    ]
    instances = [
        {}, {"foo": "s"}, {"foo": 1}, {"bar": 2}, {"foo": "s", "bar": 2},
        {"foo": "s", "baz": 3}, {"kind": "a", "x": 1}, {"kind": "a", "y": 1},
        {"kind": "b", "y": 1}, {"kind": "b", "x": 1}, {"foo": 1, "bar": 2},
        {"a": 1, "b": 2}, {"a": 1, "c": 3}, {"b": 2},
        [], ["a"], ["a", "b"], ["a", "b", "c"], ["x"], ["x", "y"],
        ["s", "t", 3], ["s", 1], [1, 2], ["only"], 7, "scalar", None, True,
    ]
    for schema in schemas:
        plan = compile_schema(schema)
        assert plan.is_lowerable(), f"should lower: {json.dumps(schema)[:90]}"
        ev = Evaluator(schema, dialect=DRAFT202012)
        expected = [bool(ev.valid(v)) for v in instances]
        df = spark.createDataFrame(
            [(expected[i], json.dumps(v)) for i, v in enumerate(instances)],
            "expected boolean, content string",
        )
        out = plan.validate_json_column(df, "content")
        bad = out.filter(F.col("valid") != F.col("expected")).collect()
        assert not bad, f"{json.dumps(schema)[:90]}: {bad[:5]}"


def test_cyclic_ref_hybrid_routing(spark):
    """Round 5: cyclic $ref schemas lower via bounded unroll + per-row tier
    routing. Shallow instances get exact pure-Column verdicts; instances
    with data beyond the unrolled depth route to the interpreter — verdicts
    match the pure-interpreter run at EVERY depth, and the routing probe is
    visible as a split plan (one interpreter branch, one columnar branch)."""
    import json

    import pyspark.sql.functions as F

    from json_schemer_spark import compile_schema
    from json_schemer_spark.schema.columnar import (
        ROUTE_MARKER,
        build_route_probe,
        has_route_markers,
    )

    schema = {
        "$defs": {"node": {
            "type": "object",
            "required": ["val"],
            "properties": {
                "val": {"type": "integer"},
                "next": {"$ref": "#/$defs/node"},
            },
            "additionalProperties": False,
        }},
        "$ref": "#/$defs/node",
    }
    plan = compile_schema(schema)
    assert plan.is_lowerable()
    assert has_route_markers(plan._prepared_schema())
    assert build_route_probe(plan._prepared_schema(), plan.dialect) is not None

    def chain(n, bad_at=None):
        node = {"val": "BAD" if bad_at == n else n}
        for i in range(n - 1, -1, -1):
            node = {"val": "BAD" if bad_at == i else i, "next": node}
        return node

    rows = []
    for d in [0, 1, 2, 3, 4, 7]:
        rows.append((f"ok{d}", json.dumps(chain(d))))
        rows.append((f"tipbad{d}", json.dumps(chain(d, bad_at=d))))
    rows += [("midbad", json.dumps(chain(6, bad_at=4))),
             ("extra", json.dumps({"val": 1, "zzz": 2})),
             ("notobj", "[1,2]"), ("parsefail", "{nope"), ("nul", None)]
    df = spark.createDataFrame(rows, "name string, content string")
    hyb = {r.name: r.valid for r in plan.validate_json_column(df, "content").collect()}
    itp = {r.name: r.valid for r in plan.validate_json_column(
        df, "content", force_interpreter=True).collect()}
    assert hyb == itp, {k: (hyb[k], itp[k]) for k in itp if hyb[k] != itp[k]}
    assert hyb["ok7"] and not hyb["tipbad7"] and not hyb["midbad"]

    # the hybrid plan is a union: exactly ONE interpreter (Python) branch
    p = plan.validate_json_column(df, "content")._jdf.queryExecution().executedPlan().toString()
    assert p.count("MapInPandas") == 1

    # a cycle with NO instance progress between re-entries cannot unroll
    noprog = {"$defs": {"l": {"allOf": [{"$ref": "#/$defs/l"}]}},
              "$ref": "#/$defs/l"}
    assert not compile_schema(noprog).is_lowerable()

    # a cycle only inside UNUSED $defs no longer blocks lowering, and needs
    # no routing (the marker position is passive)
    unused = {"$defs": {"l": {"properties": {"x": {"$ref": "#/$defs/l"}}}},
              "type": "object"}
    uplan = compile_schema(unused)
    assert uplan.is_lowerable()
    assert build_route_probe(uplan._prepared_schema(), uplan.dialect) is None
    assert ROUTE_MARKER == {"x-jss-route-marker": True}


def test_dynamic_ref_scope_dependent_lowering(spark):
    """Round 5: genuinely scope-DEPENDENT $dynamicRef lowers via static
    scope tracking — after inlining, each occurrence has one evaluation
    path, so the runtime dynamic scope is statically known per occurrence
    (interpreter push rule mirrored in inline_refs). The canonical 2020-12
    strict-tree: the outer resource redefines the `node` anchor, so the
    recursive $dynamicRef inside the generic tree must land on the STRICT
    root (unevaluatedProperties: false) at every depth; cyclic resolution
    unrolls with route markers like plain $ref."""
    import json

    from json_schemer_spark import compile_schema
    from json_schemer_spark.schema.columnar import build_route_probe

    tree = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$id": "https://example.com/tree",
        "$dynamicAnchor": "node",
        "type": "object",
        "properties": {
            "data": True,
            "children": {"type": "array", "items": {"$dynamicRef": "#node"}},
        },
    }
    strict_tree = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$id": "https://example.com/strict-tree",
        "$dynamicAnchor": "node",
        "$ref": "tree",
        "unevaluatedProperties": False,
    }
    plan = compile_schema(
        strict_tree,
        ref_resolver=lambda uri: tree if "tree" in uri else None,
    )
    assert plan.is_lowerable()
    assert build_route_probe(plan._prepared_schema(), plan.dialect) is not None

    insts = [
        {"data": 1},
        {"data": 1, "children": [{"data": 2}]},
        # the scope-dependence: `daat` typo must FAIL at depth 1 because the
        # dynamicRef lands on strict-tree, not the permissive tree
        {"children": [{"daat": 1}]},
        # ... and at depth 4 (past the unroll budget -> routed rows)
        {"children": [{"children": [{"children": [{"children": [{"daat": 1}]}]}]}]},
        {"children": [{"children": [{"children": [{"children": [{"data": 1}]}]}]}]},
        {"typo": 1},
    ]
    df = spark.createDataFrame(
        [(i, json.dumps(v)) for i, v in enumerate(insts)], "i int, content string")
    hyb = {r.i: r.valid for r in plan.validate_json_column(df, "content").collect()}
    itp = {r.i: r.valid for r in plan.validate_json_column(
        df, "content", force_interpreter=True).collect()}
    assert hyb == itp, {k: (hyb[k], itp[k]) for k in itp if hyb[k] != itp[k]}
    assert hyb[0] and hyb[1] and hyb[4]
    assert not hyb[2] and not hyb[3] and not hyb[5]

    # without the outer redefinition the same instances validate loosely:
    # scope resolution must NOT leak strict semantics into the plain tree
    plain = compile_schema(tree, ref_resolver=lambda uri: None)
    assert plain.is_lowerable()
    out = {r.i: r.valid for r in plain.validate_json_column(df, "content").collect()}
    assert out[2] and out[3] and out[5]  # extra keys allowed in plain tree


def test_inline_refs_node_budget_stops_exponential_unroll():
    """Round-5 ADVICE: ~24 mutually-referencing defs, each inlined from two
    instance-edge positions, stay under the 48-frame depth cap while the
    materialized tree expands toward 2^24 nodes — stalling/OOMing the
    driver BEFORE the post-materialization _cost backstop runs. inline_refs
    now tracks a running node budget and raises Unsupported mid-walk; the
    plan falls back to the interpreter tier, which stays correct."""
    import time

    from json_schemer_spark import compile_schema

    n = 24
    defs = {}
    for i in range(n):
        nxt = f"#/$defs/d{i + 1}" if i + 1 < n else None
        child = {"$ref": nxt} if nxt else {"type": "integer"}
        # two instance-edge references per level -> 2^24 full expansion
        defs[f"d{i}"] = {"type": "object",
                         "properties": {"a": child, "b": dict(child)}}
    schema = {"$defs": defs, "$ref": "#/$defs/d0"}

    t0 = time.time()
    plan = compile_schema(schema)
    assert plan._prepared_schema() is None  # rejected, no stall/OOM
    took = time.time() - t0
    assert took < 30, f"node budget did not bound the walk ({took:.1f}s)"
    # interpreter fallback still answers correctly (properties are
    # optional, but any present one must be an object until depth 24)
    assert plan.valid_value({"a": {"b": {}}})
    assert not plan.valid_value({"a": {"a": 3}})


def test_vocab_restricted_metaschema_lowers(spark):
    """Round-6 (verdict ask #3): schemas under a custom metaschema whose
    $vocabulary restricts the keyword set — suite vocabulary.json via
    metaschema-no-validation / metaschema-optional-vocabulary (reference
    draft202012/vocab/core.rb:17-33 vocabulary selection) — now LOWER:
    inline_refs tracks the owning resource's dialect per node and strips
    validation-vocabulary keywords exactly where the interpreter's v_on
    gate ignores them. Closes the cross-dialect-resource tail (suite
    lowerability 99.0% -> 99.3%; remaining tail is only the
    complexity-capped meta-schema self-validations)."""
    from json_schemer_spark.schema.columnar import (
        build_route_probe,
        prepare,
    )

    hits = 0
    for draft in ("draft2019-09", "draft2020-12"):
        by_schema = {}
        for c in iter_cases(draft):
            by_schema.setdefault(id(c.schema), (c.schema, []))[1].append(c)
        for _, (schema, cases) in by_schema.items():
            ev = make_evaluator(schema, draft)
            dialect = ev.root_resource.dialect
            if dialect.enabled_vocabs is None:
                continue  # not a custom-vocabulary schema
            hits += 1
            # must lower now — this raised "cross-dialect $schema" pre-r6
            prepped = prepare(schema, dialect, registry=ev.registry)
            assert build_route_probe(prepped, dialect) is None
            df = spark.createDataFrame(
                [(i, c.valid, json.dumps(c.data)) for i, c in enumerate(cases)],
                "cidx int, expected boolean, content string",
            )
            out = validate_json_column_lowered(
                df, "content", prepped, dialect,
                registry=ev.registry, prepared=True, allow_markers=True,
            )
            for r in out.select("cidx", "expected", "valid").collect():
                assert r.valid == r.expected, (draft, r.cidx, schema)
                # and the lowered verdict agrees with the interpreter tier
                assert ev.validate(cases[r.cidx].data)["valid"] == r.expected
    assert hits == 4, f"expected the 4 suite vocabulary schemas, saw {hits}"


def test_cross_draft_resource_still_rejected():
    """The genuinely-cross-DRAFT case must keep falling back: a draft7
    resource embedded in a 2020-12 document has different keyword
    semantics and cannot inline into a single-draft lowering."""
    from json_schemer_spark.schema.columnar import Unsupported, prepare

    plan = compile_schema({
        "$id": "https://example.test/root",
        "properties": {
            "x": {"$ref": "https://example.test/sub"},
        },
        "$defs": {
            "sub": {
                "$id": "https://example.test/sub",
                "$schema": "http://json-schema.org/draft-07/schema#",
                "definitions": {"n": {"type": "integer"}},
                "allOf": [{"$ref": "#/definitions/n"}],
            },
        },
    })
    ev = plan._evaluator
    with pytest.raises(Unsupported, match="cross-dialect"):
        prepare(plan.schema, ev.root_resource.dialect, registry=ev.registry)
    # interpreter fallback stays correct
    assert plan.valid_value({"x": 3})
    assert not plan.valid_value({"x": "s"})


def test_expensive_leaf_cost_rejects_inline_blowup():
    """Round-6 (verdict ask #4 follow-through): element-context leaves that
    cannot share slots inside HOF lambdas (decimal multipleOf, enum canon,
    pattern) duplicate per reference — a nominal-1028-unit
    items×anyOf×multipleOf schema measured 30+ s of py4j Column build and
    OOM'd the default-heap driver JVM while the old cost model waved it
    through. The recalibrated _cost now rejects it instantly; the
    interpreter tier answers correctly."""
    import time

    def leaf():
        return {"oneOf": [
            {"type": "object", "properties": {
                "a": {"type": "string", "minLength": 1, "maxLength": 64,
                      "pattern": "^x"},
                "b": {"type": "integer", "minimum": 0, "maximum": 100}},
             "required": ["a"]},
            {"type": "array",
             "items": {"anyOf": [{"type": "number", "multipleOf": 2},
                                  {"enum": ["p", "q", None]}]},
             "minItems": 1, "maxItems": 9}]}

    schema = {"type": "object",
              "properties": {f"k{i}": leaf() for i in range(25)}}
    t0 = time.time()
    plan = compile_schema(schema)
    assert plan._prepared_schema() is None  # rejected -> interpreter tier
    assert time.time() - t0 < 10
    assert plan.valid_value({"k3": {"a": "xy"}})
    assert not plan.valid_value({"k3": {"b": 1}})      # required a
    assert plan.valid_value({"k3": [4.0, "p"]})
    assert not plan.valid_value({"k3": [3.0]})          # multipleOf
    # the same shape at HALF the width stays below the cap and lowers —
    # the surcharge prices the duplication, it doesn't ban the shape
    small = {"type": "object",
             "properties": {f"k{i}": leaf() for i in range(12)}}
    from json_schemer_spark.schema.columnar import prepare
    from json_schemer_spark.schema.dialects import DRAFT202012
    prepare(small, DRAFT202012)  # must not raise


def test_vocab_compatible_semantics():
    """_vocab_compatible must mirror _check's format-assertion definition:
    enabled_vocabs=None means DEFAULT vocabularies (annotate-only formats),
    so a standard resource nested in a custom-vocabulary document is
    compatible; only explicit format-assertion divergence (or any
    non-vocab field difference) rejects."""
    from dataclasses import replace

    from json_schemer_spark.schema.columnar import _vocab_compatible
    from json_schemer_spark.schema.dialects import DRAFT7, DRAFT202012

    custom = replace(DRAFT202012,
                     enabled_vocabs=frozenset({"applicator", "core"}))
    asserting = replace(DRAFT202012,
                        enabled_vocabs=frozenset({"core", "format-assertion"}))
    assert _vocab_compatible(DRAFT202012, DRAFT202012)
    assert _vocab_compatible(custom, DRAFT202012)      # restricted in std
    assert _vocab_compatible(DRAFT202012, custom)      # std in restricted
    assert _vocab_compatible(custom, replace(
        DRAFT202012, enabled_vocabs=frozenset({"validation", "core"})))
    assert not _vocab_compatible(asserting, DRAFT202012)   # assert vs annotate
    assert not _vocab_compatible(DRAFT7, DRAFT202012)      # different draft


def test_route_strategy_auto_tier_chooser(spark):
    """Round 6: the sampled-probe tier chooser BENCH.md documented as the
    knob for deep-heavy workloads. route_strategy='auto' probes a bounded
    sample at plan-build time: a deep-heavy input (routed fraction above
    the 0.4 threshold) skips the two-branch split and runs the interpreter
    on everything (no Union in the plan); a shallow input keeps the split.
    Verdicts are identical under every strategy."""
    import json

    import pytest as _pytest

    from json_schemer_spark import compile_schema

    schema = {
        "$defs": {"node": {
            "type": "object",
            "required": ["val"],
            "properties": {
                "val": {"type": "integer"},
                "next": {"$ref": "#/$defs/node"},
            },
            "additionalProperties": False,
        }},
        "$ref": "#/$defs/node",
    }
    plan = compile_schema(schema)

    def chain(n, bad=False):
        node = {"val": "BAD" if bad else n}
        for i in range(n - 1, -1, -1):
            node = {"val": i, "next": node}
        return json.dumps(node)

    deep_heavy = spark.createDataFrame(
        [(i, chain(7, bad=i % 3 == 0)) for i in range(40)]
        + [(100 + i, chain(1)) for i in range(8)],
        "id long, content string")
    shallow = spark.createDataFrame(
        [(i, chain(i % 3, bad=i % 5 == 0)) for i in range(48)],
        "id long, content string")

    def plan_str(df):
        return df._jdf.queryExecution().executedPlan().toString()

    # deep-heavy: auto chooses interpreter-everything -> single branch
    auto_deep = plan.validate_json_column(deep_heavy, "content",
                                          route_strategy="auto")
    assert "Union" not in plan_str(auto_deep)
    assert plan_str(auto_deep).count("MapInPandas") == 1
    # shallow: auto keeps the hybrid split -> union of two branches
    auto_shallow = plan.validate_json_column(shallow, "content",
                                             route_strategy="auto")
    assert "Union" in plan_str(auto_shallow)

    for df in (deep_heavy, shallow):
        a = {r.id: r.valid for r in plan.validate_json_column(
            df, "content", route_strategy="auto").collect()}
        s = {r.id: r.valid for r in plan.validate_json_column(
            df, "content").collect()}
        i = {r.id: r.valid for r in plan.validate_json_column(
            df, "content", force_interpreter=True).collect()}
        assert a == s == i

    # non-cyclic schemas: probe is None, auto changes nothing (still lazy,
    # identical plan up to expression ids)
    import re

    flat = compile_schema({"type": "object"})
    df = spark.createDataFrame([("{}",)], "content string")
    norm = lambda s: re.sub(r"(#|\bx_)\d+", r"\1", s)
    assert norm(plan_str(flat.validate_json_column(df, "content"))) == norm(
        plan_str(flat.validate_json_column(df, "content",
                                           route_strategy="auto")))

    with _pytest.raises(ValueError, match="route_strategy"):
        plan.validate_json_column(shallow, "content", route_strategy="bogus")
