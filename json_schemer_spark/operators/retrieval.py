"""Text-retrieval ranking: BM25 scored top-k search over a document
corpus — the curation-side twin of the embedding ANN family
(operators/similarity.py). Quality-filtering a 100 TB corpus routinely
needs "the documents most relevant to these probe terms" (targeted
decontamination, domain up-sampling, eval-set mining); BM25 is the
standard lexical ranker for that.

Scale shape: the query-term list is tiny and known up front, so
everything the corpus contributes is pruned BEFORE any exchange — the
per-(doc, term) frequency stream only ever contains query terms (a
filter over the token array inside the scan projection), the
document-frequency side is <= |query| rows (broadcast), the corpus
stats side is ONE row (broadcast), and the final top-k is a
TakeOrderedAndProject (per-partition heads + k-row driver merge), never
a global sort. Two pruned passes over the text column: one for corpus
N/avgdl, one for the matching docs' term frequencies.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: Sequence[str],
    k: int = 10,
    *,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by Okapi BM25 score for ``query_terms``.

    Classic BM25 (Robertson/Sparck Jones, the TREC formulation):
    ``score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1-b+b*dl/avgdl))``
    with ``idf(t) = ln(1 + (N-df+0.5)/(df+0.5))`` — the +1 form, so idf
    stays positive even for terms in >half the corpus. Query terms are
    deduplicated and lowercased (bag-of-terms queries re-weight by
    repeating a term; this operator treats the query as a set, the
    common IR-library default). Only documents matching >= 1 term are
    ranked — a no-match doc scores 0 by definition and can never reach
    a top-k that contains any match.

    Returns ``(id, n_terms, score)``, score rounded to 6dp for
    cross-engine comparison, ordered by the UN-rounded score (desc,
    then id) so the top-k cut is taken on full precision.

    Tokenization matches :func:`text.tokens` (lowercased whitespace
    split) so BM25 ranks over exactly the vocabulary q48/q15 count.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if k <= 0:
        raise ValueError("k must be positive")
    qt = sorted({t.lower() for t in query_terms})
    from json_schemer_spark.operators.text import tokens

    toks = tokens(F.col(text_col))
    qarr = F.array(*[F.lit(t) for t in qt])
    base = df.select(
        F.col(id_col).alias("__doc"),
        F.size(toks).alias("__dl"),
        F.filter(toks, lambda x: F.array_contains(qarr, x)).alias("__qtoks"),
    )
    # corpus stats: ONE row (count + avg doc length) — broadcast, never
    # a driver collect; this pass prunes to the token-length projection.
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    tf = (
        base.select("__doc", "__dl", F.explode("__qtoks").alias("term"))
        .groupBy("__doc", "__dl", "term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    # document frequency per query term: <= |query| rows after the
    # partial-agged shuffle tf already paid — broadcast side.
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    joined = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
    )
    norm = F.col("__tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl")
    )
    term_score = idf * F.col("__tf") * F.lit(k1 + 1.0) / norm
    scored = joined.groupBy("__doc").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(term_score).alias("__score"),
    )
    return (
        scored.orderBy(F.desc("__score"), F.asc("__doc"))
        .limit(k)
        .select(
            F.col("__doc").alias(id_col),
            F.col("n_terms"),
            F.round(F.col("__score"), 6).alias("score"),
        )
    )
