"""Snapshot diff — the incremental-validation primitive: given two
snapshots of a corpus (old/new Iceberg snapshots, two partition loads,
a re-crawl), emit only the rows that changed, keyed by content hash.
Downstream revalidation/dedup/training-mix jobs then touch the delta,
not the corpus — at 10^12 files the delta is the only thing worth
recomputing (this is the batch twin of streaming/incremental.py).

Plan shape: one content-hash projection per side (narrow, inside the
scan), ONE key-partitioned sort-merge join (full outer), and a filter
that drops the unchanged majority BEFORE anything downstream — output
size is O(|delta|), never O(|corpus|). On bucketed persistence
(operators/referential.py) both exchanges disappear entirely.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    content_cols: Sequence[str],
) -> DataFrame:
    """Rows added / removed / changed between two snapshots.

    ``key_cols`` identify a row across snapshots; ``content_cols`` are
    the payload whose md5 decides "changed" (hashed as the
    null-byte-joined concatenation, so column boundaries can't alias;
    nulls hash as the empty segment). Returns one row per differing key:
    ``(*key_cols, status in ('added','removed','changed'),
    old_md5, new_md5)`` — unchanged keys are filtered out before any
    downstream consumer, which is the entire point at corpus scale.
    """
    keys = list(key_cols)

    def hashed(df: DataFrame, alias: str) -> DataFrame:
        h = F.md5(
            F.concat_ws(
                "\x00", *[F.coalesce(F.col(c).cast("string"), F.lit(""))
                          for c in content_cols]
            )
        )
        return df.select(*keys, h.alias(alias))

    o = hashed(old, "old_md5")
    n = hashed(new, "new_md5")
    j = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("old_md5").isNull(), F.lit("added"))
        .when(F.col("new_md5").isNull(), F.lit("removed"))
        .when(F.col("old_md5") != F.col("new_md5"), F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .where(F.col("status").isNotNull())
        .select(*keys, "status", "old_md5", "new_md5")
    )


def incremental_revalidate(
    old_verdicts: DataFrame,
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    content_cols: Sequence[str],
    validate: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Delta-only revalidation with the ledger-merge algebra.

    Given the stored per-file verdict ledger for snapshot ``old``
    (``old_verdicts``: *key_cols + engine columns, e.g. ``valid``) and a
    new snapshot, produce the ledger for ``new`` while running
    ``validate`` (a DataFrame -> DataFrame verdict transform) ONLY on the
    added/changed keys:

        merged = (old_verdicts \\ diff_keys) UNION validate(new ⋉ touched)

    ``diff_keys`` covers added/removed/changed, so removed keys drop out,
    changed keys are replaced, unchanged keys keep their stored verdict
    untouched. The defining invariant — ``incremental_revalidate(...) ==
    validate(new)`` row for row — is what q65's DuckDB oracle checks (it
    recomputes the FULL ledger from scratch).

    Scale contract: one snapshot_diff SMJ on the keys, one left-semi to
    cut the revalidation input to O(|delta|), one left-anti to retire
    stale ledger rows (both co-partitioned with the diff's exchange, so
    AQE reuses the shuffle), and ``validate`` — the expensive part at
    10^12 files — touches only the delta.
    """
    keys = list(key_cols)
    delta = snapshot_diff(old, new, keys, content_cols)
    touched = delta.where(F.col("status") != "removed").select(*keys)
    fresh = validate(new.join(touched, keys, "left_semi"))
    kept = old_verdicts.join(delta.select(*keys), keys, "left_anti")
    return kept.unionByName(fresh.select(*kept.columns))
