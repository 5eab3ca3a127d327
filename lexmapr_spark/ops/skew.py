"""Skew-safe aggregation helpers.

Plain ``count``/``sum`` aggregates are already skew-proof (map-side
partial aggregation shrinks hot keys before the shuffle). The
dangerous shapes are holistic aggregates like ``collect_set`` — a hot
key ships ALL its values to one reducer. These helpers salt such
aggregations into two phases: the salted phase spreads each hot key
over ``n_salts`` reducers, the final phase merges the (already
deduplicated, already shrunk) partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, cols=("*",)) -> DataFrame:
    """Deterministic row salt in [0, n_salts): hash-derived, so reruns
    place rows identically (no F.rand; reproducibility > randomness)."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int"))


def salted_collect_set(df: DataFrame, key: str, value: str,
                       n_salts: int = 16) -> DataFrame:
    """Skew-safe ``collect_set(value) GROUP BY key``.

    Phase 1 groups by (key, salt) — a hot key's values spread over
    ``n_salts`` tasks and deduplicate there; phase 2 merges the small
    partial sets. Result is identical to the direct aggregation (set
    semantics are order-free), sorted for determinism.
    """
    salted = with_salt(df, n_salts, cols=(value,))
    partial = (salted.groupBy(key, "_salt")
               .agg(F.collect_set(value).alias("vals")))
    return (partial.groupBy(key)
            .agg(F.array_sort(F.array_distinct(
                F.flatten(F.collect_list("vals")))).alias("values")))


def salted_distinct_count(df: DataFrame, key: str, value: str,
                          n_salts: int = 16) -> DataFrame:
    """Skew-safe exact ``count(DISTINCT value) GROUP BY key`` via the
    same two-phase shape (use approx_count_distinct when exactness
    isn't required — it's a sketch and already skew-proof).

    Because the salt is ``hash(value) % n_salts``, every distinct
    value lands in exactly one salt bucket — the per-salt partial sets
    are provably disjoint. Phase 2 is therefore a plain
    ``sum(size(vals))`` and never materializes (or re-shuffles) the
    merged set, so a hot key's distinct values never concentrate on
    one reducer."""
    salted = with_salt(df, n_salts, cols=(value,))
    partial = (salted.groupBy(key, "_salt")
               .agg(F.collect_set(value).alias("vals")))
    return (partial.groupBy(key)
            .agg(F.sum(F.size("vals")).cast("int").alias("n_distinct")))
