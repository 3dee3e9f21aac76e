"""Referential integrity: the table-level analogue of ``$ref`` existence
(SURVEY.md §2.3 — "corpus-level referential integrity = broadcast or
shuffle left-anti join"; north rule: repo→commit existence with salted
repartition + AQE).
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import broadcast


def dangling_references(
    facts: DataFrame,
    dim: DataFrame,
    keys,
    broadcast_dim: bool = True,
    salt: Optional[int] = None,
) -> DataFrame:
    """Fact rows whose key tuple does not exist in ``dim``.

    Strategies (scale notes):
    - ``broadcast_dim=True`` (default): broadcast hash anti-join — zero
      shuffle of the fact side; correct choice whenever the dimension fits
      in executor memory (commits-per-repo dims do).
    - ``broadcast_dim=False``: shuffle anti-join; AQE handles skew
      splitting at runtime.
    - ``salt=N``: explicit salting for pathologically skewed fact keys —
      the dim side is exploded N ways so every salted fact partition can
      still match; use when a single key holds >~1/parallelism of rows
      and AQE skew-join is unavailable (e.g. pre-3.2 clusters). On a
      mega-repo corpus this bounds the largest shuffle partition by 1/N.
    """
    # keys: ["k", ...] (same name both sides) or {"fact_key": "dim_key", ...}
    if isinstance(keys, dict):
        dim = dim.select(
            *[F.col(dk).alias(fk) for fk, dk in keys.items()]
        )
        keys = list(keys.keys())
    else:
        keys = list(keys)
    dim_k = dim.select(*keys).dropDuplicates(keys)

    if salt:
        salt_col = (F.abs(F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id())) % salt)
        salted_facts = facts.withColumn("__salt", salt_col.cast("int"))
        salted_dim = dim_k.crossJoin(
            F.broadcast(facts.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt")))
        )
        out = salted_facts.join(salted_dim, keys + ["__salt"], "left_anti").drop("__salt")
        return out

    right = broadcast(dim_k) if broadcast_dim else dim_k
    return facts.join(right, keys, "left_anti")


def referential_violations(
    facts: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    id_cols: Sequence[str],
    **kwargs,
) -> DataFrame:
    """Classic-output shape: one violation row per dangling fact row."""
    bad = dangling_references(facts, dim, keys, **kwargs)
    return bad.select(
        *id_cols,
        *keys,
        F.lit("$ref").alias("keyword"),
        F.concat(F.lit("/"), F.concat_ws("/", *[F.lit(k) for k in keys])).alias("instance_pointer"),
        F.lit("referenced key not found in dimension").alias("message"),
    )


def write_bucketed(df: DataFrame, table: str, keys, n_buckets: int = 16,
                   sort: bool = True) -> None:
    """Persist ``df`` as a BUCKETED (and optionally sorted) table on the
    join keys — the pre-shuffle half of a co-located join: two tables
    bucketed the same way join with NO exchange on either side (and no
    sort when also sorted), which is how a repeatedly-joined 100 TB fact
    table amortizes its shuffle once at write time. Plan proof in
    tests/test_plans.py."""
    keys = list(keys)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)
