"""compile_schema: JSON Schema document → CompiledSchema plan.

The plan is built ONCE on the driver (compile-once/validate-many, the
reference's core optimization — schema.rb:101,368-408) and then bound to
DataFrames. Two execution tiers:

1. **Columnar tier** — schemas whose constraints are expressible as pure
   Column expressions over ``from_json``-parsed structures run entirely
   JVM-side (whole-stage codegen, no Python in the hot path). See
   ``json_schemer_spark.schema.columnar``.
2. **Interpreter tier** — the general case: the Evaluator closure ships to
   executors inside ONE Arrow-batched ``mapInPandas`` stage (never one UDF
   per keyword; SURVEY.md §7.3.7).
"""

from __future__ import annotations

import json
from typing import Any, Callable, Optional

from json_schemer_spark.schema.dialects import DEFAULT_DIALECT, Dialect, dialect_for
from json_schemer_spark.schema.interpreter import Evaluator
from json_schemer_spark.schema.registry import DEFAULT_BASE_URI, Registry

VIOLATION_FIELDS = "keyword string, instance_pointer string, schema_pointer string, message string"
VIOLATION_DDL = f"array<struct<{VIOLATION_FIELDS.replace(' string', ': string').replace(', ', ', ')}>>"

_UNSET = object()  # sentinel for the memoized prepare() slot


class CompiledSchema:
    """A compiled constraint plan for one JSON Schema document."""

    # class-level default: subclasses with bespoke __init__ (OpenAPISchema)
    # inherit "no override" without having to set the instance attribute
    _unroll_budget: Optional[int] = None

    def __init__(
        self,
        schema: Any,
        dialect: Optional[Dialect] = None,
        ref_resolver: Optional[Callable[[str], Any]] = None,
        assert_formats: bool = False,
        base_uri: str = DEFAULT_BASE_URI,
        formats: Optional[dict[str, Callable]] = None,
        keywords: Optional[dict[str, Callable]] = None,
        # extension surface (reference configuration.rb / SURVEY.md §2.7)
        before_property_validation: Any = None,
        after_property_validation: Any = None,
        insert_property_defaults: bool = False,
        property_default_resolver: Optional[Callable] = None,
        regexp_resolver: Optional[Callable] = None,
        content_encodings: Optional[dict[str, Callable]] = None,
        content_media_types: Optional[dict[str, Callable]] = None,
        i18n_messages: Optional[dict[str, str]] = None,
        unroll_budget: Optional[int] = None,
    ) -> None:
        if isinstance(schema, str):
            schema = json.loads(schema)
        self.schema = schema
        self.assert_formats = assert_formats
        self.formats = formats
        self.keywords = keywords
        # kept for the executor-side Evaluator rebuild (_evaluator_factory):
        # without these, remote-$ref schemas resolved fine on the DRIVER but
        # the interpreter tier raised unresolvable-$ref on executors (latent
        # until round 5's hybrid routing sent rows there routinely)
        self._ref_resolver = ref_resolver
        self._base_uri = base_uri
        self._dialect_arg = dialect
        # Round 7 (optimization): callers that KNOW their corpus depth
        # distribution can deepen the cyclic-$ref unroll so more (or all)
        # rows get pure-Column verdicts instead of riding the interpreter
        # tier. Verdicts are tier-independent (differential-fuzz pinned);
        # only the routed fraction changes. None = columnar._UNROLL_BUDGET.
        self._unroll_budget = unroll_budget
        self._ext_opts = dict(
            before_property_validation=before_property_validation,
            after_property_validation=after_property_validation,
            insert_property_defaults=insert_property_defaults,
            property_default_resolver=property_default_resolver,
            regexp_resolver=regexp_resolver,
            content_encodings=content_encodings,
            content_media_types=content_media_types,
            i18n_messages=i18n_messages,
        )
        self._evaluator = Evaluator(
            schema,
            base_uri=base_uri,
            dialect=dialect or DEFAULT_DIALECT,
            ref_resolver=ref_resolver,
            assert_formats=assert_formats,
            formats=formats,
            keywords=keywords,
            **self._ext_opts,
        )
        # registry-derived: honors $schema dispatch incl. custom $vocabulary
        self.dialect = self._evaluator.root_resource.dialect
        self._prepared = _UNSET  # memoized prepare() result (None = interpreter)
        # ref()-subschema support: the root document the executor-side
        # factory rebuilds from, plus the chain of ref values to replay
        # (empty for a normal root plan)
        self._factory_root = schema
        self._sub_refs: list = []

    def ref(self, value: str) -> "CompiledSchema":
        """Parity with ``Schema#ref`` (reference `schema.rb:128-130`):
        resolve ``value`` (a ``$ref``-style URI or fragment pointer)
        against this schema's base URI and return a CompiledSchema over
        the resolved subschema, e.g. ``plan.ref("#/definitions/item")``.

        The parent's registry is SHARED, so refs pointing back into the
        parent document (and anchors / remote resources) keep resolving —
        including on executors: the interpreter factory rebuilds the
        parent document's registry there and replays the ref chain
        (``ref().ref()`` composes) instead of re-rooting the subschema
        JSON, which would break document-relative pointers."""
        ev = self._evaluator
        target, _resource = ev.registry.resolve_ref(value, ev.root_resource.uri)
        # Share the parent registry ONLY for targets it already knows
        # (registered schema nodes). Anything else — boolean subschemas
        # (no object identity in the _info map) and dict values in
        # non-schema positions (a pointer into enum/const/default data, an
        # unknown-keyword value) — would make Evaluator.__init__ call
        # add_document on the SHARED registry, overwriting the parent's
        # resource URI so later $ref resolution through the parent plan
        # silently resolves into the subschema document (review finding for
        # booleans; round-5 ADVICE generalized it to any unregistered
        # target). Detached targets still inherit the parent's resolved
        # dialect, matching Schema#ref's meta_schema inheritance
        # (reference schema.rb:128-130).
        sub_registry = ev.registry if ev.registry.info(target) is not None else None
        sub = object.__new__(CompiledSchema)
        sub.schema = target
        sub.assert_formats = self.assert_formats
        sub.formats = self.formats
        sub.keywords = self.keywords
        sub._ref_resolver = self._ref_resolver
        sub._base_uri = self._base_uri
        sub._dialect_arg = self._dialect_arg
        sub._ext_opts = self._ext_opts
        sub._factory_root = self._factory_root
        sub._sub_refs = self._sub_refs + [value]
        sub._evaluator = Evaluator(
            target, registry=sub_registry,
            dialect=ev.root_resource.dialect,
            assert_formats=self.assert_formats,
            formats=self.formats, keywords=self.keywords,
            **self._ext_opts,
        )
        sub.dialect = sub._evaluator.root_resource.dialect
        sub._prepared = _UNSET
        return sub

    # -- driver-side single-value API (tests / small data) -------------------

    def validate_value(self, instance: Any, output_format: str = "classic",
                       access_mode: Optional[str] = None) -> Any:
        """Single-value validation in one of the reference's output formats
        (result.rb:13-28): flag | classic | basic | detailed | verbose.

        - flag:     {"valid": bool}
        - classic:  list of error rows (default; empty when valid)
        - basic:    2019-09 output format — root unit with flat ``errors``
                    (invalid) / ``annotations`` (valid) lists; validates
                    against the suite's output-schema (output-tests replay)
        - detailed: the reference's pruned hierarchy (result.rb:136-150):
                    validity-mismatched branches dropped, single-matching-
                    child nodes collapsed into the child
        - verbose:  the full nested result tree (result.rb:152-160) — one
                    unit per schema application, nested keyword units under
                    ``errors``/``annotations`` per each unit's own validity
        """
        if output_format in ("detailed", "verbose"):
            from json_schemer_spark.schema.output_tree import TreeEvaluator, detailed

            if self._ext_opts.get("insert_property_defaults"):
                # run the flat evaluation first for its instance mutations
                # (defaults insertion / hooks), then build the tree over the
                # mutated instance
                self._evaluator.validate(instance, access_mode=access_mode)
            tree = TreeEvaluator(self._evaluator).tree(
                instance, access_mode=access_mode)
            return detailed(tree) if output_format == "detailed" else tree
        collect = output_format in ("basic",)
        res = self._evaluator.validate(
            instance, access_mode=access_mode, collect_annotations=collect
        )
        if output_format == "flag":
            return {"valid": res["valid"]}
        if output_format == "classic":
            return res["errors"]

        base_uri = self._evaluator.root_resource.uri

        type_names = {"null", "boolean", "number", "integer", "string", "array", "object"}

        def error_unit(e):
            # classic rows carry the expected TYPE NAME for single-type
            # failures; output units address the actual `type` keyword
            kw = "type" if e["keyword"] in type_names else e["keyword"]
            kloc = f"{e['schema_pointer']}/{kw}"
            return {
                "valid": False,
                "keywordLocation": kloc,
                "absoluteKeywordLocation": f"{base_uri}#{kloc}",
                "instanceLocation": e["instance_pointer"],
                "error": e["message"],
            }

        def ann_unit(a):
            return {
                "valid": True,
                "keywordLocation": a["schema_pointer"],
                "absoluteKeywordLocation": f"{base_uri}#{a['schema_pointer']}",
                "instanceLocation": a["instance_pointer"],
                "annotation": a["annotation"],
            }

        root = {"valid": res["valid"], "keywordLocation": "", "instanceLocation": ""}
        errors = [error_unit(e) for e in res["errors"]]
        annotations = [ann_unit(a) for a in res.get("annotations", [])]

        if output_format == "basic":
            if errors:
                root["errors"] = errors
            elif annotations:
                root["annotations"] = annotations
            return root
        raise ValueError(f"unknown output_format {output_format!r}")

    def valid_value(self, instance: Any, access_mode: Optional[str] = None) -> bool:
        return self._evaluator.validate(instance, access_mode=access_mode)["valid"]

    def pretty_errors(self, instance: Any, access_mode: Optional[str] = None) -> list:
        """Human-readable classic errors (reference Errors.pretty,
        errors.rb:7-30): each row enriched with its subschema and — for
        ``required`` — the concrete missing keys, then formatted."""
        from json_schemer_spark.errors import enrich, pretty

        return [
            pretty(enrich(e, self.schema, instance))
            for e in self.validate_value(instance, "classic", access_mode)
        ]

    # -- meta-schema self-validation (reference json_schemer.rb:125-133,
    #    schema.rb:120-126: the engine validates its own schema document
    #    with the same engine — SURVEY.md §1.2) ------------------------------

    def bundle(self) -> Any:
        """Self-contained compound document: every remote resource this
        schema references is embedded under the dialect's defs keyword,
        stamped with its absolute ``$id`` (reference Schema#bundle,
        schema.rb:223-270). The bundled document validates identically with
        NO ref_resolver — see tests/test_bundle.py's suite replay."""
        from json_schemer_spark.schema.bundle import bundle_document

        return bundle_document(
            self._evaluator.registry, self._evaluator.root_resource, self.schema
        )

    def valid_schema(self) -> bool:
        return meta_schemer(self.dialect).valid_value(self.schema)

    def validate_schema(self) -> list:
        return meta_schemer(self.dialect).validate_value(self.schema)

    # -- Spark API ------------------------------------------------------------

    def is_lowerable(self) -> bool:
        """True when the whole plan lowers to pure Column expressions.

        Custom keywords/formats, hooks, defaults insertion and pluggable
        resolvers force the interpreter tier — the lowering knows nothing
        about user callables. Format ASSERTION lowers when every asserted
        format is regex-exact in both tiers (uuid/duration/uri-template/
        json-pointer/relative-json-pointer); otherwise interpreter."""
        return self._prepared_schema() is not None

    def _prepared_schema(self):
        """Memoized ``columnar.prepare`` result — ref-inlining + the subset
        and cost walks run ONCE per plan, shared by is_lowerable() and
        every validate_json_column() call (round-2 ADVICE: the two used to
        each run the full pipeline, doubling driver-side compile work)."""
        if self._prepared is _UNSET:
            self._prepared = None
            if not self.keywords and not self.formats and not any(
                v for v in self._ext_opts.values()
            ):
                from json_schemer_spark.schema.columnar import Unsupported, prepare

                try:
                    self._prepared = prepare(
                        self.schema, self._lowering_dialect(),
                        registry=self._evaluator.registry,
                        unroll_budget=self._unroll_budget,
                    )
                except (Unsupported, OverflowError):
                    self._prepared = None
        return self._prepared

    def _route_probe(self):
        """Memoized ``columnar.build_route_probe`` over the memoized
        prepared tree (pure function of it — review finding: it used to
        re-walk the whole unrolled tree on every validate call)."""
        if getattr(self, "_probe", _UNSET) is _UNSET:
            from json_schemer_spark.schema.columnar import build_route_probe

            self._probe = build_route_probe(
                self._prepared_schema(), self._lowering_dialect())
        return self._probe

    _STD_VOCABS = frozenset({
        "core", "applicator", "unevaluated", "validation",
        "meta-data", "format-annotation", "content",
    })

    def _lowering_dialect(self) -> Dialect:
        """The dialect the columnar tier lowers under — format assertion is
        communicated via the format-assertion vocabulary flag."""
        if not self.assert_formats:
            return self.dialect
        import dataclasses

        vocabs = self.dialect.enabled_vocabs or self._STD_VOCABS
        return dataclasses.replace(
            self.dialect, enabled_vocabs=frozenset(vocabs) | {"format-assertion"}
        )

    # Sampled-probe tier chooser (round 6 — the knob BENCH.md's hybrid
    # scale measurement documented): at routed fraction ~0.5 the split
    # plan measured 0.79x of simply running the interpreter on everything
    # (ROUTED_r6.json), so past this threshold "auto" skips the split.
    # 0.4 sits below the measured crossover with margin for the probe
    # pass the split still pays (14-17% of wall).
    _ROUTE_AUTO_THRESHOLD = 0.4
    _ROUTE_SAMPLE_ROWS = 4096

    def validate_json_column(self, df, content_col: str, *, force_interpreter: bool = False,
                             prefilter=None, route_strategy: str = "split"):
        """Validate a JSON-string column → df + ``valid`` + ``violations``.

        Returns a DataFrame with two added columns:
        - ``valid: boolean``
        - ``violations: array<struct<keyword, instance_pointer, schema_pointer, message>>``

        ``prefilter`` (Column or SQL string over SOURCE columns) is applied
        BEFORE validation, so Catalyst pushes it into the scan. Filters
        written after validation cannot push down — the validator's outputs
        sit behind a deliberate non-deterministic pushdown barrier (see
        columnar.validate_json_column_lowered) because pushing them re-parses
        the document once per referenced alias (measured 15×).

        DETERMINISTIC-SOURCE REQUIREMENT (cyclic-$ref schemas only): when
        the schema routes per-row between tiers (hybrid split), ``df`` is
        evaluated twice as two filtered branches of one plan. A
        non-deterministic source — ``rand()``-derived columns, a
        non-deterministic UDF/mapInPandas, a re-read table mutated between
        scans — can satisfy the route probe differently per scan and be
        duplicated in or dropped from the union. ``persist()`` or
        ``localCheckpoint()`` such inputs first (or pass
        ``force_interpreter=True``). Non-cyclic schemas evaluate the source
        exactly once and are unaffected.

        ``route_strategy`` (cyclic-$ref schemas only; non-cyclic plans are
        byte-identical under every value):
        - ``"split"`` (default) — always build the two-branch hybrid plan.
          Lazy, no job runs at plan-build time; the right call when most
          rows are shallow (the production shape: ROUTED_r6.json measured
          0.1% routed ⇒ overhead = one pruned probe pass, 14-17% of wall).
        - ``"auto"`` — eagerly probe up to ``_ROUTE_SAMPLE_ROWS`` rows (one
          small Spark job NOW, against the head of ``df``) and skip the
          split in favor of interpreter-everything when the estimated
          routed fraction exceeds ``_ROUTE_AUTO_THRESHOLD`` (0.4 — at
          ~0.5 routed the split measured 0.79x of interpreter-all because
          both branches stay fat while the probe pass is still paid).
          Use when the depth distribution of the corpus is unknown."""
        if route_strategy not in ("split", "auto"):
            raise ValueError(
                f"route_strategy must be 'split' or 'auto', got {route_strategy!r}")
        if prefilter is not None:
            df = df.filter(prefilter)
        prepared = None if force_interpreter else self._prepared_schema()
        if prepared is not None:
            from json_schemer_spark.schema.columnar import (
                Unsupported,
                build_route_probe,
                validate_json_column_lowered,
            )

            try:
                # memoized: the probe is a pure function of the memoized
                # prepared tree, and build_route_probe walks the whole
                # unrolled tree — no reason to re-walk per call
                probe = self._route_probe()
                if probe is None:
                    return validate_json_column_lowered(
                        df, content_col, prepared, self._lowering_dialect(),
                        registry=self._evaluator.registry, prepared=True,
                    )
                # Hybrid per-row tier routing (round 5): the prepared tree is
                # a bounded unroll of a cyclic $ref — rows whose instances
                # have data beyond the unrolled depth (probe true) cannot be
                # decided by the pure-Column plan and ride the interpreter;
                # everything shallower gets exact columnar verdicts.
                #
                # Scale trade-off, considered deliberately: the split is two
                # filtered branches of ONE source, so a file source is
                # scanned twice — but the routed branch evaluates only the
                # probe (one variant parse) and typically filters ~all rows
                # out, so the overhead is ≈ one extra parse pass over the
                # content column. The alternatives are strictly worse at
                # scale: materializing the probe split through an exchange
                # turns the whole input into shuffle I/O (spill at 100 TB),
                # and running ONE mapInPandas over all rows pays Arrow
                # transfer + Python for the entire table instead of the deep
                # tail. Columnar-parquet re-scan with column pruning is the
                # cheapest second pass available.
                import pyspark.sql.functions as F

                if route_strategy == "auto":
                    # One bounded job over the head of the input: the
                    # sample is an estimate, not a contract, so limit()'s
                    # arbitrary-N-rows semantics are fine — and cheap
                    # (early-terminated scan, probe is pure-Column).
                    stats = (
                        df.select(probe(F.col(content_col)).alias("__r"))
                        .limit(self._ROUTE_SAMPLE_ROWS)
                        .agg(F.count(F.lit(1)).alias("n"),
                             F.sum(F.col("__r").cast("long")).alias("deep"))
                        .first()
                    )
                    n, deep = stats["n"], stats["deep"] or 0
                    if n and deep / n > self._ROUTE_AUTO_THRESHOLD:
                        return self._validate_with_interpreter(df, content_col)

                # collision-proof working column (review finding: a user
                # column literally named __jss_route__ used to be
                # overwritten and dropped)
                rcol = "__jss_route__"
                while rcol in df.columns:
                    rcol += "_"
                routed = df.withColumn(rcol, probe(F.col(content_col)))
                fast = validate_json_column_lowered(
                    routed.filter(~F.col(rcol)).drop(rcol), content_col,
                    prepared, self._lowering_dialect(),
                    registry=self._evaluator.registry, prepared=True,
                    allow_markers=True,
                )
                slow = self._validate_with_interpreter(
                    routed.filter(F.col(rcol)).drop(rcol), content_col
                )
                return fast.unionByName(slow)
            except (Unsupported, OverflowError):
                # belt + braces: anything the lowering rejects mid-build
                # (e.g. complexity backstops) falls back gracefully
                pass
        return self._validate_with_interpreter(df, content_col)

    def _evaluator_factory(self) -> Callable[[], Evaluator]:
        """Picklable zero-arg builder: reconstructs the Evaluator on each
        executor process from the schema document (cheap, memoized per
        process) rather than pickling live regex/registry state."""
        schema_json = json.dumps(self._factory_root)
        sub_refs = list(self._sub_refs)
        dialect_name = self._dialect_arg.name if self._dialect_arg is not None else None
        assert_formats = self.assert_formats
        base_uri = self._base_uri
        # user extension callables ride the pickled closure to executors
        # (cloudpickle handles lambdas/closures), incl. the ref_resolver —
        # omitting it made every remote-$ref interpreter run fail on the
        # executor with unresolvable-$ref
        ref_resolver = self._ref_resolver
        formats = self.formats
        keywords = self.keywords
        ext_opts = self._ext_opts

        def build() -> Evaluator:
            from json_schemer_spark.schema.dialects import (
                DEFAULT_DIALECT as _DD,
                DIALECTS_BY_NAME,
            )
            from json_schemer_spark.schema.interpreter import Evaluator as _Ev

            ev = _Ev(
                json.loads(schema_json),
                # mirror __init__'s Evaluator construction exactly
                dialect=DIALECTS_BY_NAME[dialect_name] if dialect_name else _DD,
                base_uri=base_uri,
                ref_resolver=ref_resolver,
                assert_formats=assert_formats,
                formats=formats,
                keywords=keywords,
                **ext_opts,
            )
            # ref()-subschema plan: replay the ref chain against the parent
            # document's registry so back-pointers keep resolving
            # (unregistered targets — booleans, refs into non-schema data —
            # detach with the parent's resolved dialect, mirroring ref();
            # see the registry-corruption note there)
            for rv in sub_refs:
                target, resource = ev.registry.resolve_ref(
                    rv, ev.root_resource.uri)
                ev = _Ev(
                    target,
                    registry=ev.registry if ev.registry.info(target) is not None else None,
                    dialect=ev.root_resource.dialect,
                    assert_formats=assert_formats,
                    formats=formats, keywords=keywords, **ext_opts,
                )
            return ev

        return build

    def _validate_with_interpreter(self, df, content_col: str):
        """General path: ONE mapInPandas stage running the compiled Evaluator."""
        import pandas as pd

        build = self._evaluator_factory()
        result_schema = _append_fields(df.schema)

        def run(batches):
            ev = build()
            for pdf in batches:
                contents = pdf[content_col]
                valids = []
                violations = []
                for raw in contents:
                    try:
                        value = json.loads(raw) if raw is not None else None
                    except (ValueError, TypeError):
                        valids.append(False)
                        violations.append(
                            [{"keyword": "$parse", "instance_pointer": "",
                              "schema_pointer": "", "message": "content is not valid JSON"}]
                        )
                        continue
                    res = ev.validate(value)
                    valids.append(res["valid"])
                    violations.append(res["errors"])
                out = pdf.copy()
                out["valid"] = pd.Series(valids, index=pdf.index, dtype="bool")
                out["violations"] = pd.Series(violations, index=pdf.index, dtype="object")
                yield out

        return df.mapInPandas(run, schema=result_schema)


def _append_fields(schema):
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        StringType,
        StructField,
        StructType,
    )

    violation_struct = StructType(
        [
            StructField("keyword", StringType()),
            StructField("instance_pointer", StringType()),
            StructField("schema_pointer", StringType()),
            StructField("message", StringType()),
        ]
    )
    return StructType(
        list(schema.fields)
        + [
            StructField("valid", BooleanType()),
            StructField("violations", ArrayType(violation_struct)),
        ]
    )


_META_PLANS: dict[str, "CompiledSchema"] = {}


def meta_schemer(dialect: Dialect) -> "CompiledSchema":
    """Memoized validator FOR schema documents of ``dialect`` (built from
    the embedded official meta-schemas — metaschemas.py). OpenAPI dialects
    use the reference's per-version schema-object metas (round-2 ADVICE):
    3.0 = draft4 ∧ (Schema|Reference) from the official OAS 3.0 document
    schema (openapi30/meta.rb:12-25); 3.1 = the OAS dialect meta
    (2020-12 ∧ oas/3.1/meta/base — openapi31/meta.rb:28-36)."""
    got = _META_PLANS.get(dialect.name)
    if got is None:
        from json_schemer_spark.schema.dialects import DRAFT4, DRAFT202012
        from json_schemer_spark.schema.metaschemas import METASCHEMAS

        def base_resolver(uri: str):
            return METASCHEMAS.get(uri) or METASCHEMAS.get(uri.rstrip("#"))

        if dialect.openapi == 30:
            from json_schemer_spark.schema.oas_documents import OAS30_DOCUMENT_SCHEMA

            meta = {
                "id": "json-schemer://openapi30/schema",
                "$schema": "http://json-schema.org/draft-04/schema#",
                "allOf": [
                    {"$ref": "http://json-schema.org/draft-04/schema#"},
                    {"oneOf": [
                        {"$ref": "https://spec.openapis.org/oas/3.0/schema/2021-09-28#/definitions/Schema"},
                        {"$ref": "https://spec.openapis.org/oas/3.0/schema/2021-09-28#/definitions/Reference"},
                    ]},
                ],
            }

            def resolver(uri: str):
                if uri.startswith("https://spec.openapis.org/oas/3.0/schema/2021-09-28"):
                    return OAS30_DOCUMENT_SCHEMA
                return base_resolver(uri)

            got = CompiledSchema(meta, dialect=DRAFT4,
                                 base_uri="json-schemer://openapi30/schema",
                                 ref_resolver=resolver)
        elif dialect.openapi == 31:
            from json_schemer_spark.schema.oas_documents import OAS31_META_BASE

            meta = {
                "$id": "https://spec.openapis.org/oas/3.1/dialect/base",
                "$schema": "https://json-schema.org/draft/2020-12/schema",
                "$dynamicAnchor": "meta",
                "allOf": [
                    {"$ref": "https://json-schema.org/draft/2020-12/schema"},
                    {"$ref": "https://spec.openapis.org/oas/3.1/meta/base"},
                ],
            }

            def resolver(uri: str):
                if uri.startswith("https://spec.openapis.org/oas/3.1/meta/base"):
                    return OAS31_META_BASE
                return base_resolver(uri)

            got = CompiledSchema(meta, dialect=DRAFT202012,
                                 base_uri="https://spec.openapis.org/oas/3.1/dialect/base",
                                 ref_resolver=resolver)
        else:
            meta = METASCHEMAS.get(dialect.uri) or METASCHEMAS.get(dialect.uri.rstrip("#"))
            got = CompiledSchema(
                meta,
                dialect=dialect,
                base_uri=dialect.uri.rstrip("#"),
                ref_resolver=base_resolver,
            )
        _META_PLANS[dialect.name] = got
    return got


def valid_schema(schema: Any, **options) -> bool:
    """Is ``schema`` itself a valid schema document? (JSONSchemer.valid_schema?)"""
    return compile_schema(schema, **options).valid_schema()


def validate_schema(schema: Any, **options) -> list:
    """Classic errors of ``schema`` against its meta-schema."""
    return compile_schema(schema, **options).validate_schema()


def compile_schema(schema: Any, **options) -> CompiledSchema:
    """Compile a JSON Schema document into a :class:`CompiledSchema` plan.

    Options mirror the reference's configuration surface
    (configuration.rb:3-31): dialect, ref_resolver, assert_formats, formats,
    keywords, before/after_property_validation, insert_property_defaults,
    property_default_resolver, regexp_resolver, content_encodings,
    content_media_types, base_uri. Options NOT passed fall back to the
    process-wide :func:`~json_schemer_spark.configuration.configure`
    defaults (reference json_schemer.rb:239-245)."""
    from json_schemer_spark.configuration import configuration

    merged = {**configuration().as_options(), **options}
    return CompiledSchema(schema, **merged)
