"""Sequence packing (concat-and-chunk) for LLM training dataloaders.

The reference engine (json_schemer) has no packing surface; this op
extends the engine for the training-data pipeline: an LLM dataloader
concatenates documents in a deterministic order and slices the token
stream into fixed-length context windows. The planning question a 100 TB
pipeline has to answer ahead of tokenization is *which window(s) does
each document land in* — that drives shard manifests, boundary-crossing
statistics (how many documents get split across two sequences), and
padding/waste accounting.

Scale contract: packing is computed per *pack group* (a deterministic
md5 bucket of the document key), never over a single global order — a
global ``row_number``/running-sum window collapses to ONE partition and
is the classic anti-scale construct. With ``n_groups`` ≳ the executor
count, every group's running sum is an independent partition of one
window operator: one shuffle on ``pack_group``, linear in data, no
driver participation. Order within a group is the md5 order key
(tie-broken by the document key), so the packing is a pure function of
(key, seed) — reproducible across runs, retries, and cluster sizes,
exactly like :mod:`.sampling`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_bucket
from .text import token_count

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    ctx_len: int,
    n_groups: int = 64,
    seed: str = "",
) -> DataFrame:
    """Assign every document its place in the packed token stream.

    Within each of ``n_groups`` deterministic pack groups, documents are
    concatenated in md5-hash order and the whitespace-token stream is cut
    into windows of ``ctx_len`` tokens. Returns one row per input row:

    - ``id_col``, ``pack_group`` — the group this doc packs into;
    - ``n_tokens`` — whitespace token count (:func:`.text.token_count`);
    - ``start_offset`` — the doc's first token's offset in the group's
      concatenated stream;
    - ``seq_first`` / ``seq_last`` — first/last context window the doc's
      tokens touch (``floor(start/ctx)`` .. ``floor((end-1)/ctx)``);
      NULL for empty documents (they occupy no window);
    - ``n_seqs`` — windows spanned (0 for empty docs);
    - ``crosses_boundary`` — true when the doc is split across windows
      (the waste/attention-fragmentation statistic packing exists to
      minimize).

    One narrow projection + one shuffle on ``pack_group`` + one window
    running sum; no Python, no driver collect.
    """
    if ctx_len < 1:
        raise ValueError(f"ctx_len must be >= 1, got {ctx_len}")
    if n_groups < 1:
        raise ValueError(f"n_groups must be >= 1, got {n_groups}")
    key = F.col(id_col)
    bucket = hash_bucket(key, seed)
    base = df.select(
        key.alias("__pk_id"),
        F.pmod(bucket, F.lit(n_groups)).cast("int").alias("pack_group"),
        bucket.alias("__pk_ord"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy("__pk_ord", "__pk_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    out = base.withColumn("start_offset", start)
    ctx = F.lit(ctx_len).cast("long")
    nonempty = F.col("n_tokens") > 0
    seq_first = F.when(
        nonempty, F.floor(F.col("start_offset") / ctx)).cast("long")
    seq_last = F.when(
        nonempty,
        F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / ctx),
    ).cast("long")
    out = out.withColumns({
        "seq_first": seq_first,
        "seq_last": seq_last,
        "n_seqs": F.when(nonempty, seq_last - seq_first + 1)
                   .otherwise(F.lit(0)).cast("long"),
        "crosses_boundary": F.coalesce(
            seq_last > seq_first, F.lit(False)),
    })
    return out.drop("__pk_ord").withColumnRenamed("__pk_id", id_col)
