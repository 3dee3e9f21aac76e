"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting. Pure Column expressions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# tiny stopword profiles for an n-gram-free language heuristic
_LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "que", "une", "pour"],
    "es": ["el", "la", "de", "que", "los", "es", "una", "por", "con", "para"],
}

STOPWORDS_EN = _LANG_PROFILES["en"] + ["a", "an", "as", "at", "be", "by", "on", "or", "was"]


def tokens(text):
    """Whitespace tokens of lowercased text; empty text → empty array."""
    t = F.split(F.trim(F.lower(text)), r"\s+")
    return F.filter(t, lambda x: x != "")


def token_count(text):
    return F.size(tokens(text))


# GPT-2-style pre-tokenizer alternation, restricted to RE2-safe constructs
# (no lookahead — the DuckDB oracle runs the IDENTICAL pattern): common
# English contractions, letter runs, digit runs, punctuation runs,
# whitespace runs. Each match ≈ one BPE pre-token.
BPE_TOKEN_RE = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def bpe_token_count(text):
    """BPE-ish pre-token count (pure Column; regexp_extract_all JVM-side).

    The whitespace-token count (``token_count``) underestimates LLM token
    budgets; this tracks a GPT-2-style pre-tokenization ~1:1."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Adds n_chars_measured, n_tokens, avg_token_len, punct_ratio,
    stopword_ratio, upper_ratio — the classic cheap quality signals.

    Tokens are staged as a named column first: interpreted HOF evaluation
    has no CSE, so every expression-tree reference to ``tokens(text)``
    would re-run split+filter per row (multi-referenced non-cheap aliases
    block CollapseProject, keeping the staging projection intact)."""
    text = F.col(text_col)
    df = df.withColumn("__toks", tokens(text))
    toks = F.col("__toks")
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    stop = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    n_punct = F.length(F.regexp_replace(text, r"[^\p{Punct}]", ""))
    n_upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    return df.withColumns(
        {
            "n_chars_measured": n_chars,
            "n_tokens": n_tokens,
            "avg_token_len": F.when(
                n_tokens > 0,
                (n_chars - (n_tokens - 1)).cast("double") / n_tokens,
            ).otherwise(F.lit(0.0)),
            "punct_ratio": F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0),
            "stopword_ratio": F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(0.0),
            "upper_ratio": F.when(n_chars > 0, n_upper.cast("double") / n_chars).otherwise(0.0),
        }
    ).drop("__toks")


def quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """A single [0,1] quality score from the features (heuristic weights)."""
    feat = quality_features(df, text_col)
    score = (
        F.least(F.col("n_tokens").cast("double") / 100.0, F.lit(1.0)) * 0.4
        + F.when(F.col("avg_token_len").between(3.0, 10.0), 0.3).otherwise(0.0)
        + F.when(F.col("punct_ratio") < 0.1, 0.15).otherwise(0.0)
        + F.when(F.col("stopword_ratio").between(0.1, 0.7), 0.15).otherwise(0.0)
    )
    return feat.withColumn("quality_score", F.round(score, 6))


def repetition_features(df: DataFrame, text_col: str) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, table A1 — the
    standard pre-training repetition filters): adds

    - ``dup_line_frac``  — EXTRA-occurrence fraction of non-blank lines,
      ``(n_lines - n_distinct_lines) / n_lines`` (the common Gopher
      reimplementation convention: 'x\\nx' scores 0.5, not 1.0 — each
      repeated line charges its repeats, not its first occurrence),
    - ``dup_word_frac``  — same extra-occurrence convention over tokens,
      ``(n_tokens - n_distinct_tokens) / n_tokens``,
    - ``top_bigram_frac`` — occurrence share of the most frequent word
      bigram (reported as a count fraction, so there is no mode tie-break
      nondeterminism).

    Pure Column expressions end to end — per-document array algebra, no
    shuffle, no Python; scales as a narrow map over the corpus. Arrays are
    staged as named columns because interpreted HOF evaluation has no CSE
    (every reference would re-tokenize per row)."""
    text = F.col(text_col)
    df = df.withColumn(
        "__lines", F.filter(F.split(text, "\n"), lambda x: F.trim(x) != "")
    )
    df = df.withColumn("__toks", tokens(text))
    lines, toks = F.col("__lines"), F.col("__toks")
    n_lines, n_toks = F.size(lines), F.size(toks)
    pair_len = F.greatest(n_toks - 1, F.lit(0))
    df = df.withColumn(
        "__g2",
        F.zip_with(
            F.slice(toks, F.lit(1), pair_len),
            F.slice(toks, F.lit(2), pair_len),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    )
    g2 = F.col("__g2")
    # max bigram count = longest equal-neighbour run in the SORTED bigram
    # array: O(n log n) + one O(n) aggregate. (Review finding: the first
    # version filtered the full array once per DISTINCT bigram — O(n·d)
    # interpreted string comparisons per document, ~20M for a 5k-token web
    # page.) The empty-string initial ``prev`` can never match a real
    # bigram (every bigram contains a space).
    def _run(acc, x):
        cur = F.when(x == acc.prev, acc.cur + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), cur.alias("cur"),
            F.greatest(acc.best, cur).alias("best"),
        )

    top = F.aggregate(
        F.array_sort(g2),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("cur"),
                 F.lit(0).alias("best")),
        _run,
        lambda acc: acc.best,
    )
    out = df.withColumns(
        {
            "dup_line_frac": F.when(
                n_lines > 0,
                (n_lines - F.size(F.array_distinct(lines))).cast("double") / n_lines,
            ).otherwise(F.lit(0.0)),
            "dup_word_frac": F.when(
                n_toks > 0,
                (n_toks - F.size(F.array_distinct(toks))).cast("double") / n_toks,
            ).otherwise(F.lit(0.0)),
            "top_bigram_frac": F.when(
                F.size(g2) > 0, top.cast("double") / F.size(g2)
            ).otherwise(F.lit(0.0)),
        }
    )
    return out.drop("__lines", "__toks", "__g2")


def repetition_filter(
    df: DataFrame,
    text_col: str,
    *,
    max_dup_line_frac: float = 0.30,
    max_dup_word_frac: float = 0.70,
    max_top_bigram_frac: float = 0.08,
) -> DataFrame:
    """Adds the repetition features plus a ``kept`` flag (True = document
    survives all thresholds). Callers filter on ``kept`` for the pipeline
    form; the flag is kept explicit so rejection reasons stay auditable."""
    feat = repetition_features(df, text_col)
    return feat.withColumn(
        "kept",
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_word_frac") <= max_dup_word_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac),
    )


# PII patterns, restricted to constructs with identical semantics in Java
# regex (Spark) and RE2 (the DuckDB oracle): explicit [0-9] classes (no
# Unicode-\d divergence), no lookaround, ASCII \b. Redaction order matters
# — emails first (their dotted domains could otherwise feed the dotted
# patterns), then IPs, then phones.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE_RE = r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"


def pii_features(df: DataFrame, text_col: str) -> DataFrame:
    """Adds PII-indicator counts — ``n_emails``, ``n_ipv4``, ``n_phones``
    (the standard pre-training scrub targets, e.g. the BigScience ROOTS
    pipeline's regex pass). Pure Column ``regexp_count``: JVM-side, narrow
    per-document map, no shuffle/Python."""
    text = F.col(text_col)
    return df.withColumns({
        "n_emails": F.regexp_count(text, F.lit(PII_EMAIL_RE)),
        "n_ipv4": F.regexp_count(text, F.lit(PII_IPV4_RE)),
        "n_phones": F.regexp_count(text, F.lit(PII_PHONE_RE)),
    })


def pii_scrub(df: DataFrame, text_col: str, out_col: str = "scrubbed") -> DataFrame:
    """PII redaction: adds the :func:`pii_features` counts (measured on the
    ORIGINAL text) plus ``out_col`` with emails → ``<EMAIL>``, IPv4s →
    ``<IP>``, phone numbers → ``<PHONE>``. One pass of chained JVM
    ``regexp_replace`` — the redacted corpus is a projection, never a
    shuffle, so the op composes with dedup/quality stages at any scale."""
    out = pii_features(df, text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), PII_EMAIL_RE, "<EMAIL>"),
            PII_IPV4_RE, "<IP>"),
        PII_PHONE_RE, "<PHONE>")
    return out.withColumn(out_col, scrubbed)


# C4's line-level heuristics (Raffel et al. 2020 §2.2 — public): keep lines
# that end in terminal punctuation and have >= 5 words; drop whole pages
# with < 3 surviving lines, any "lorem ipsum", or a curly brace.
C4_TERMINAL_PUNCT_RE = r'[.!?"]$'


def c4_line_features(df: DataFrame, text_col: str, *, min_words: int = 5,
                     min_kept_lines: int = 3) -> DataFrame:
    """C4-style line filtering as pure Column array algebra: adds

    - ``n_lines``        — non-blank line count,
    - ``n_kept_lines``   — lines ending in terminal punctuation
      (``[.!?"]`` after rtrim) with at least ``min_words`` words,
    - ``kept_line_frac`` — their ratio (0.0 for blank documents),
    - ``has_lorem_ipsum`` / ``has_curly_brace`` — page-level markers,
    - ``kept_text``      — the surviving lines re-joined, the actual
      training-corpus projection,
    - ``kept``           — page verdict: >= ``min_kept_lines`` surviving
      lines and neither marker.

    No shuffle, no Python — a narrow per-document map, same scale contract
    as :func:`repetition_features`."""
    text = F.col(text_col)
    df = df.withColumn(
        "__c4_lines", F.filter(F.split(text, "\n"), lambda x: F.trim(x) != ""))
    lines = F.col("__c4_lines")

    def _line_kept(x):
        words = F.size(F.filter(F.split(x, " "), lambda t: t != ""))
        return F.rtrim(x).rlike(C4_TERMINAL_PUNCT_RE) & (words >= min_words)

    df = df.withColumn("__c4_kept", F.filter(lines, _line_kept))
    kept = F.col("__c4_kept")
    n_lines, n_kept = F.size(lines), F.size(kept)
    out = df.withColumns({
        "n_lines": n_lines,
        "n_kept_lines": n_kept,
        "kept_line_frac": F.when(
            n_lines > 0, F.round(n_kept.cast("double") / n_lines, 6)
        ).otherwise(F.lit(0.0)),
        "has_lorem_ipsum": F.lower(text).contains("lorem ipsum"),
        "has_curly_brace": text.contains("{"),
        "kept_text": F.array_join(kept, "\n"),
    })
    out = out.withColumn(
        "kept",
        (F.col("n_kept_lines") >= min_kept_lines)
        & ~F.col("has_lorem_ipsum") & ~F.col("has_curly_brace"),
    )
    return out.drop("__c4_lines", "__c4_kept")


def boilerplate_line_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document boilerplate-line removal (RefinedWeb-style line
    dedup): a non-blank line whose normalized form (``lower(trim(...))``)
    appears in at least ``min_docs`` *distinct* documents is treated as
    boilerplate (nav bars, cookie banners, footers) and dropped from
    every document that carries it.

    Returns one row per input document: ``id_col``, ``n_lines`` (non-blank
    lines), ``n_removed`` (boilerplate lines dropped), and ``kept_text``
    (surviving lines re-joined in original order; ``''`` when everything
    was boilerplate or the document had no non-blank lines).

    Plan shape (100 TB contract): ``posexplode_outer`` of the non-blank
    lines (outer keeps empty documents alive without a join back to the
    source) → one partial-aggregated shuffle keyed on the normalized
    line computing the distinct-document count → one shuffle hash join
    of the lines against that per-line dimension → one hash aggregation
    back to one row per document, re-assembling ``kept_text`` via
    ``sort_array(collect_list(struct(pos, line)))``. The frequency
    branch re-reads the source (two pruned columnar scans total) — the
    deliberate trade against the single-scan alternative, which would
    have to ``collect_list`` every (doc, pos, line) occurrence PER LINE
    KEY and so would OOM a task on exactly the mega-boilerplate lines
    this operator exists to remove. Both shuffles key on the line text,
    so skew is bounded by the most common boilerplate line — AQE's
    skew-join handling applies. No Python anywhere; ``collect_list``
    per document is bounded by the document's own line count.
    """
    if min_docs < 1:
        raise ValueError("min_docs must be >= 1")
    lines_arr = F.filter(
        F.split(F.col(text_col), "\n"), lambda x: F.trim(x) != "")
    lines = df.select(
        F.col(id_col).alias("__bp_id"),
        F.posexplode_outer(lines_arr).alias("__bp_pos", "__bp_line"),
    ).withColumn("__bp_key", F.lower(F.trim(F.col("__bp_line"))))
    # distinct-document count per normalized line (partial aggregation
    # applies: bytes shuffled ~ distinct (line, doc) pairs)
    freq = (
        lines.filter(F.col("__bp_key").isNotNull())
        .groupBy("__bp_key")
        .agg(F.countDistinct("__bp_id").alias("__bp_docs"))
    )
    tagged = lines.join(freq, on="__bp_key", how="left").withColumn(
        "__bp_is_bp", F.coalesce(F.col("__bp_docs") >= min_docs, F.lit(False))
    )
    kept_struct = F.when(
        ~F.col("__bp_is_bp") & F.col("__bp_line").isNotNull(),
        F.struct(F.col("__bp_pos"), F.col("__bp_line")),
    )
    agg = tagged.groupBy("__bp_id").agg(
        F.sum(F.when(F.col("__bp_line").isNotNull(), 1).otherwise(0))
        .cast("int").alias("n_lines"),
        F.sum(F.when(F.col("__bp_is_bp"), 1).otherwise(0))
        .cast("int").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s["__bp_line"],
            ),
            "\n",
        ).alias("kept_text"),
    )
    return agg.withColumnRenamed("__bp_id", id_col)


def word_ngrams(text, n: int):
    """Sliding word ``n``-grams of lowercased whitespace tokens as a
    Column (array<string>); fewer than ``n`` tokens → empty array.
    Pure HOF algebra (sequence → slice → array_join), no Python."""
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = tokens(text)
    m = F.size(toks) - (n - 1)
    return F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_contamination(
    train_df: DataFrame,
    bench_df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 13,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix-C style): for every
    training document, count its distinct word ``n``-grams that also
    occur anywhere in the benchmark set. Returns one row per training
    document: ``id_col``, ``n_grams`` (distinct n-grams), ``n_contaminated``,
    ``contamination_frac``, ``contaminated`` (any overlap).

    Plan shape (100 TB contract): the benchmark side is contractually
    small (eval suites, not the crawl) — its distinct n-gram set builds
    once and broadcasts, so the train side is ONE explode → one distinct
    (id, gram) shuffle → broadcast hash join → one per-doc aggregation.
    Pass ``broadcast_bench=False`` to fall back to a shuffle join when
    the benchmark set is itself huge. Documents with fewer than ``n``
    tokens survive with ``n_grams = 0`` (explode_outer)."""
    gram = word_ngrams(F.col(text_col), n)
    bench_grams = (
        bench_df.select(F.explode(F.array_distinct(gram)).alias("__ct_gram"))
        .distinct()
        .withColumn("__ct_hit", F.lit(1))
    )
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    # Round 7 (guide §2.3): per-document gram dedup needs NO exchange — a
    # document's grams live in one array cell, so array_distinct() inside
    # the projection replaces the old corpus-wide DISTINCT(id, gram)
    # shuffle (which moved every distinct gram STRING across the wire).
    # After the broadcast join, the per-doc aggregation partial-aggregates
    # map-side down to one narrow row per document before its exchange —
    # the only shuffle left carries (id, two ints).
    train_grams = train_df.select(
        F.col(id_col).alias("__ct_id"),
        F.explode_outer(F.array_distinct(gram)).alias("__ct_gram"),
    )
    joined = train_grams.join(bench_grams, on="__ct_gram", how="left")
    n_grams = F.sum(
        F.when(F.col("__ct_gram").isNotNull(), 1).otherwise(0)).cast("int")
    n_hit = F.sum(F.coalesce(F.col("__ct_hit"), F.lit(0))).cast("int")
    agg = joined.groupBy("__ct_id").agg(
        n_grams.alias("n_grams"), n_hit.alias("n_contaminated"))
    out = agg.withColumns({
        "contamination_frac": F.when(
            F.col("n_grams") > 0,
            F.round(F.col("n_contaminated").cast("double")
                    / F.col("n_grams"), 6),
        ).otherwise(F.lit(0.0)),
        "contaminated": F.col("n_contaminated") > 0,
    })
    return out.withColumnRenamed("__ct_id", id_col)


def vocab_stats(df: DataFrame, text_col: str, id_col: str, k: int = 100) -> DataFrame:
    """Corpus vocabulary statistics — the tokenizer-training / IDF table:
    top-``k`` tokens by term frequency with ``tf`` (total occurrences) and
    ``df`` (documents containing the token). One explode → one partial-
    aggregated (token) shuffle (Spark's distinct-count runs as a partial
    aggregate too, so bytes shuffled ≈ distinct (token, doc) pairs, never
    the corpus); the final top-k is a k-row sort. Deterministic tie-break
    by token so the output is oracle-comparable."""
    tok = df.select(
        F.col(id_col).alias("__doc"), F.explode(tokens(F.col(text_col))).alias("token"))
    counts = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("__doc").alias("df"),
    )
    return counts.orderBy(F.desc("tf"), "token").limit(k)


def lang_id(df: DataFrame, text_col: str) -> DataFrame:
    """Stopword-profile language guess → adds detected_lang, lang_score.

    Per language: count profile-word occurrences among tokens; argmax via
    a sorted array of (score, lang) structs. All JVM-side. Tokens are
    staged as a column — the per-language filters would otherwise re-run
    the tokenizer once per profile per row (no CSE in HOF evaluation).
    """
    df = df.withColumn("__toks", tokens(F.col(text_col)))
    toks = F.col("__toks")
    scored = []
    for lang, words in _LANG_PROFILES.items():
        prof = F.array(*[F.lit(w) for w in words])
        score = F.size(F.filter(toks, lambda t: F.array_contains(prof, t)))
        scored.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.element_at(F.sort_array(F.array(*scored), asc=False), 1)
    n_tokens = F.size(toks)
    return df.withColumns(
        {
            "detected_lang": F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("unknown")),
            "lang_score": F.when(
                n_tokens > 0, best["score"].cast("double") / n_tokens
            ).otherwise(0.0),
        }
    ).drop("__toks")


def _shingle_hashes_of_norm(norm, k: int):
    """Char-shingle hashes of a STAGED normalized-text column reference
    (``norm`` inside the per-index lambda must be an O(1) column read —
    an embedded regexp_replace expression would re-run per shingle)."""
    n = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n), lambda i: F.xxhash64(norm.substr(i, F.lit(k)))
    )


def _combine_fingerprint(hashes, keep_mod: int):
    sampled = F.filter(hashes, lambda h: F.pmod(h, F.lit(keep_mod)) == 0)
    # fall back to all hashes for very short docs with no sampled shingles
    chosen = F.when(F.size(sampled) > 0, sampled).otherwise(hashes)
    return F.aggregate(
        F.array_distinct(chosen),
        F.lit(0).cast("long"),
        lambda acc, h: acc.bitwiseXOR(h),
    )


def fingerprint(text, k: int = 8, keep_mod: int = 8):
    """Winnowing-style document fingerprint (bigint).

    k-char shingle hashes → deterministic mod-sampling (h % keep_mod == 0)
    → order-independent combine. Robust to small edits that leave most
    shingles intact; one projection, no shuffle. Single-Column convenience
    form — prefer :func:`fingerprints`, which stages the normalized text
    and the hash array as columns (each expression-tree reference
    re-evaluates under interpreted HOFs)."""
    norm = F.regexp_replace(F.lower(text), r"\s+", " ")
    return _combine_fingerprint(_shingle_hashes_of_norm(norm, k), keep_mod)


def fingerprints(
    df: DataFrame, text_col: str, id_col: str, k: int = 8, keep_mod: int = 8
) -> DataFrame:
    return (
        df.select(
            F.col(id_col),
            F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ").alias("__norm"),
        )
        .select(F.col(id_col), _shingle_hashes_of_norm(F.col("__norm"), k).alias("__h"))
        .select(
            F.col(id_col),
            _combine_fingerprint(F.col("__h"), keep_mod).alias("fingerprint"),
        )
    )
