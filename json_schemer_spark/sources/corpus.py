"""Deterministic synthetic source-code corpus (the engine's primary input).

Shape per BASELINE.json input_hint / FIXTURES.md §1:
``(repo:string, path:string, commit:string, lang:string, content:string)``
plus a ``commits(repo, commit)`` dimension for referential checks.

Generation is pure Column expressions over ``spark.range`` — no driver-side
loops, no ``rand()`` (hash-of-id instead, so any row is reproducible at any
scale and any partitioning). Skew is built in: ~30% of rows land in 2
mega-repos to exercise salting (SURVEY.md §4.3).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# fraction of rows carrying each content defect (deterministic by row id)
N_ORGS = 40
N_REPOS_PER_ORG = 25
DANGLING_COMMIT_PCT = 3  # % of fact rows whose commit is not in the dimension
LANGS = ["json", "yaml", "py", "rb", "js", "go", "md"]

# The flagship validation schema the corpus payloads are generated against
# (shape mirrors the reference's benchmark `simple` schema
# test/performance/benchmark.rb:21-52 — a small object of typed properties —
# widened with array/nested cases so every lowered keyword class is hot).
FLAGSHIP_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "type": "object",
    "required": ["name", "size", "lang"],
    "properties": {
        "name": {"type": "string", "minLength": 3, "maxLength": 64, "pattern": "^[a-z][a-z0-9_]*$"},
        "size": {"type": "integer", "minimum": 0, "maximum": 1000000},
        "lang": {"enum": ["json", "yaml", "py", "rb", "js", "go", "md"]},
        "stars": {"type": "number", "minimum": 0},
        "tags": {"type": "array", "items": {"type": "string"}, "maxItems": 8},
        "meta": {
            "type": "object",
            "properties": {
                "license": {"type": "string", "minLength": 2},
                "forks": {"type": "integer", "minimum": 0},
            },
        },
    },
}


def _h(seed: str, *cols) -> F.Column:
    """Deterministic non-negative 63-bit hash of (seed, cols...)."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def generate_corpus(
    spark: SparkSession, n_rows: int, seed: str = "jss-corpus-v1", partitions: int | None = None
) -> DataFrame:
    """The fact table: (repo, path, commit, lang, content)."""
    df = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    rid = F.col("id")

    # --- repo: skewed distribution; ~30% of rows in 2 mega-repos ----------
    bucket = _h(seed + "repo", rid) % 100
    org = _h(seed + "org", rid) % N_ORGS
    rep = _h(seed + "rep", rid) % N_REPOS_PER_ORG
    repo = (
        F.when(bucket < 18, F.lit("megacorp/monorepo"))
        .when(bucket < 30, F.lit("bigorg/platform"))
        .otherwise(F.concat(F.lit("org"), org.cast("string"), F.lit("/repo"), rep.cast("string")))
    )

    # --- commit: drawn from 64 commits per repo; small % dangling ----------
    commit_slot = _h(seed + "cslot", rid) % 64
    dangling = (_h(seed + "dangle", rid) % 100) < DANGLING_COMMIT_PCT
    commit_src = F.when(dangling, F.concat(F.lit("orphan-"), repo, commit_slot.cast("string"), rid.cast("string"))) \
                  .otherwise(F.concat(repo, F.lit("@"), commit_slot.cast("string")))
    commit = F.sha1(commit_src)

    # --- lang ----------------------------------------------------------------
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]), (_h(seed + "lang", rid) % 7 + 1).cast("int"))

    # --- path ------------------------------------------------------------------
    path = F.concat(
        F.lit("src/"),
        (_h(seed + "dir", rid) % 20).cast("string"),
        F.lit("/file_"),
        rid.cast("string"),
        F.lit("."),
        lang,
    )

    # --- content: JSON payload with seeded defects ------------------------------
    defect = _h(seed + "defect", rid) % 100  # 0-99
    name_ok = F.concat(F.lit("pkg_"), (_h(seed + "nm", rid) % 100000).cast("string"))
    name_bad = F.lit("X")  # fails minLength+pattern
    size_ok = (_h(seed + "sz", rid) % 1000000).cast("long")
    size_bad = -(_h(seed + "szb", rid) % 1000).cast("long") - 1
    stars = (_h(seed + "st", rid) % 5000).cast("double") / 10.0
    tag = lambda i: F.concat(F.lit("t"), ((_h(seed + f"tag{i}", rid)) % 50).cast("string"))

    body = F.to_json(
        F.struct(
            F.when(defect.between(0, 4), name_bad).otherwise(name_ok).alias("name"),
            F.when(defect.between(5, 9), size_bad).otherwise(size_ok).alias("size"),
            F.when(defect.between(10, 12), F.lit("cobol")).otherwise(lang).alias("lang"),
            stars.alias("stars"),
            F.array(tag(1), tag(2), tag(3)).alias("tags"),
            F.struct(
                F.lit("mit").alias("license"),
                (_h(seed + "fk", rid) % 900).alias("forks"),
            ).alias("meta"),
        )
    )
    # defect 13: drop a required key; 14: malformed JSON; 15: non-object
    content = (
        F.when(defect == 13, F.regexp_replace(body, '"name":"[^"]*",', ""))
        .when(defect == 14, F.concat(F.lit("{corrupt::"), body))
        .when(defect == 15, F.lit("[1, 2, 3]"))
        .otherwise(body)
    )

    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


def generate_commits_dim(spark: SparkSession, seed: str = "jss-corpus-v1") -> DataFrame:
    """The commits dimension: every non-dangling (repo, commit) pair.

    Small (repos × 64 rows) → always broadcast-able for the referential
    anti-join (SURVEY.md §2.3).
    """
    repos = [f"org{o}/repo{r}" for o in range(N_ORGS) for r in range(N_REPOS_PER_ORG)]
    repos += ["megacorp/monorepo", "bigorg/platform"]
    df = spark.createDataFrame([(r,) for r in repos], "repo string")
    slots = spark.range(64).withColumnRenamed("id", "slot")
    return (
        df.crossJoin(slots)
        .select(
            F.col("repo"),
            F.sha1(F.concat(F.col("repo"), F.lit("@"), F.col("slot").cast("string"))).alias("commit"),
        )
    )
