"""Deterministic sampling operators for training-data curation.

Real crawl pipelines sample and cap constantly — take an x% slice for
ablations, cap documents per domain so boilerplate farms don't dominate
the corpus — and at 100 TB the sample must be REPRODUCIBLE: re-running
the job (or running it on a different engine) must select the same
rows. Spark's ``df.sample`` is seeded per-partition and changes with
the split layout, so these operators derive selection from a hash of a
stable key instead:

* :func:`hash_sample` — keep rows whose 60-bit ``md5(key)`` prefix
  falls under ``fraction``. Engine-agnostic (md5 of the decimal key
  string), partition-layout-independent, and a pure filter: no shuffle,
  fully pushed alongside other predicates.
* :func:`stratified_cap` — at most ``n`` rows per group, chosen in
  md5-of-key order (a deterministic "random" order). One shuffle (the
  per-group window); the hash order means the kept rows don't depend on
  scan order, so resuming or re-partitioning cannot change the sample.

Both are expressible in ANSI SQL, so the contract checks them against
DuckDB oracles value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 60-bit space: 15 hex chars — fits a signed 64-bit long exactly, and
# both Spark's conv() and DuckDB's ::BIGINT parse it identically
_HASH_SPACE = 1 << 60


def _hash60(key: Column) -> Column:
    """Uniform deterministic 60-bit value from a key column: the first
    15 hex chars of md5(CAST(key AS STRING)) — identical in any engine
    with md5 (the same construction the MinHash operator uses)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10) \
        .cast("long")


def hash_sample(df: DataFrame, fraction: float,
                key_col: str = "doc_id") -> DataFrame:
    """Deterministic ``fraction``-sample: keep rows with
    ``hash60(key) < fraction * 2^60``.

    A pure narrow filter — no shuffle, no RNG state, no dependence on
    partition layout — so the same rows are selected on every run, any
    engine, any cluster size; Catalyst pushes it into the scan like any
    other predicate. Selection is also STABLE under fraction growth:
    the 10% sample is a superset of the 1% sample (threshold grows,
    hash order fixed), which is exactly what ablation ladders need.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(fraction * _HASH_SPACE)
    return df.where(_hash60(F.col(key_col)) < F.lit(threshold))


def _local_cap(df: DataFrame, group_col: str, n: int,
               key_col: str) -> DataFrame:
    """Phase 1 of :func:`stratified_cap`: keep at most ``n`` rows per
    (input partition, group) — rank over ``(spark_partition_id(),
    group)`` in the same hash order the global phase uses. Each window
    partition holds only rows that originated in ONE upstream scan
    partition, so its size is bounded by the scan split size no matter
    how hot the group is, and the phase's output is at most
    ``n × num_input_partitions`` rows per group."""
    from pyspark.sql.window import Window

    local = Window.partitionBy("__pid", group_col).orderBy(
        _hash60(F.col(key_col)), F.col(key_col))
    return (df.withColumn("__pid", F.spark_partition_id())
            .withColumn("__lrn", F.row_number().over(local))
            .where(F.col("__lrn") <= n)
            .drop("__pid", "__lrn"))


def stratified_cap(df: DataFrame, group_col: str, n: int,
                   key_col: str = "doc_id") -> DataFrame:
    """Per-group quota: at most ``n`` rows per ``group_col`` value,
    chosen in md5-of-key order (deterministic, scan-order-independent).

    The anti-spam curation primitive: cap pages per domain / docs per
    source so head groups can't dominate a training mix. Ties are
    impossible because the hash order falls back to the key itself.

    Skew is the reason this op exists, so the skewed case is the one
    that must scale: a single global ``row_number() OVER (PARTITION BY
    group)`` would ship a head domain's 10^9 pages into ONE task's
    spill-sort (AQE cannot split a window partition). Instead the cap
    runs in two phases: a local rank over ``(spark_partition_id(),
    group)`` keeps at most ``n`` rows per input partition per group —
    bounded per window task by the scan split size by construction —
    then the global window ranks the surviving ≤ ``n × P`` rows per
    group. Semantics are identical: the global top-``n`` in hash order
    is necessarily a subset of the union of the per-partition
    top-``n``s (any row outside its own partition's top-``n`` has
    ``n`` hash-smaller rows in its group already), so the result — and
    the DuckDB single-window oracle — is unchanged.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        _hash60(F.col(key_col)), F.col(key_col))
    return (_local_cap(df, group_col, n, key_col)
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= n)
            .drop("__rn"))


def assign_splits(df: DataFrame, weights: dict | None = None,
                  key_col: str = "doc_id",
                  out_col: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: add ``out_col``
    labelling each row with a split name, chosen by which cumulative
    hash range its 60-bit key hash falls in.

    ``weights`` maps split name -> fraction (must sum to ~1; default
    ``{"train": .98, "val": .01, "test": .01}``). Ranges are laid out
    in the dict's iteration order, so the same weights dict always
    yields the same assignment — across runs, engines, partitionings,
    and cluster sizes (the property that matters: a row must NEVER
    migrate from test into train between pipeline versions, or eval
    numbers silently inflate). Growing one split at the expense of its
    RIGHT-hand neighbour moves only boundary rows between those two;
    rows never skip over a split.

    A single CASE expression over the same hash as
    :func:`hash_sample` — narrow, no shuffle, whole-stage codegen;
    filter ``out_col == 'train'`` afterwards and Catalyst pushes both
    into the scan.

    NULL-key rows are DROPPED, consistent with :func:`hash_sample` /
    :func:`mixture_sample` (md5(NULL) makes every threshold
    comparison NULL, which would otherwise fall every corrupt row
    into the LAST split — silently polluting exactly the eval set).
    """
    if weights is None:
        weights = {"train": 0.98, "val": 0.01, "test": 0.01}
    if not weights:
        raise ValueError("weights must name at least one split")
    for name, w in weights.items():
        if float(w) < 0.0:
            raise ValueError(
                f"assign_splits: weight for {name!r} must be >= 0, got {w}")
    total = sum(float(w) for w in weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(
            f"assign_splits: weights must sum to 1 (+-0.001), got {total}")

    h = _hash60(F.col(key_col))
    names = list(weights)
    # CASE in forward order (h < cum_i -> names[i]); the last split
    # absorbs the rounding residue at the top of the hash space
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += float(weights[name])
        cond = h < F.lit(int(cum * _HASH_SPACE))
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(
        F.lit(names[-1]))
    return df.where(F.col(key_col).isNotNull()).withColumn(out_col, expr)


def mixture_sample(df: DataFrame, rates: dict, group_col: str = "source",
                   key_col: str = "doc_id",
                   default_rate: float = 0.0) -> DataFrame:
    """Per-group keep-rates — the pretraining data-MIXING primitive
    (temperature-scaled source reweighting a la the published LLM
    data recipes: sample Wikipedia at 1.0, Common Crawl at 0.15, ...).

    ``rates`` maps group value -> keep/repeat rate; groups not listed
    keep ``default_rate``. Rates in [0, 1] keep a deterministic
    hash-threshold fraction; rates > 1 UPSAMPLE (the other half of
    every published mixing recipe — rare high-quality sources repeat):
    each row emits ``floor(rate)`` copies plus one more when its hash
    falls under the fractional remainder, so a rate of 2.5 yields
    exactly 2 copies of every row and a third copy of a deterministic
    half. Selection is the same deterministic 60-bit hash threshold
    as :func:`hash_sample`, so the mix is reproducible across
    runs/engines/partitionings, and each row's COPY COUNT is
    NON-DECREASING in its group's rate (raising one source's weight
    only adds rows — ablation ladders stay nested; the floor step and
    the fractional indicator are both monotone).

    Scale shape: the rate table is inlined as a CASE expression
    (mixes list tens of sources, not millions), so the keep path is
    ONE narrow filter in whole-stage codegen — no join, no shuffle,
    pushed into the scan like any other predicate; it is taken
    whenever every rate is <= 1 and is byte-identical to the
    historical behavior. Upsampling adds one bounded
    ``explode(sequence(1, copies))`` — fan-out capped by
    ``ceil(max rate)``, still no shuffle. For a million-group rate
    table, broadcast-join a rates DataFrame instead (same semantics;
    one BroadcastHashJoin).
    """
    import math

    for g, r in rates.items():
        if float(r) < 0.0:
            raise ValueError(
                f"mixture_sample: rate for {g!r} must be >= 0, got {r}")
    if default_rate < 0.0:
        raise ValueError(
            f"mixture_sample: default_rate must be >= 0, "
            f"got {default_rate}")

    def split_rate(r):
        full = int(math.floor(float(r)))
        return full, int((float(r) - full) * _HASH_SPACE)

    h = _hash60(F.col(key_col))
    if all(float(r) <= 1.0 for r in rates.values()) \
            and float(default_rate) <= 1.0:
        thresh = F.lit(int(float(default_rate) * _HASH_SPACE))
        for g, r in sorted(rates.items()):
            thresh = F.when(F.col(group_col) == F.lit(g),
                            F.lit(int(float(r) * _HASH_SPACE))) \
                      .otherwise(thresh)
        return df.where(h < thresh)

    d_full, d_frac = split_rate(default_rate)
    full = F.lit(d_full)
    frac = F.lit(d_frac)
    for g, r in sorted(rates.items()):
        g_full, g_frac = split_rate(r)
        full = F.when(F.col(group_col) == F.lit(g),
                      F.lit(g_full)).otherwise(full)
        frac = F.when(F.col(group_col) == F.lit(g),
                      F.lit(g_frac)).otherwise(frac)
    copies = full + F.when(h < frac, F.lit(1)).otherwise(F.lit(0))
    # NULL keys share the rates<=1 path's drop contract: there h is
    # NULL so `h < thresh` is never true; here only the fractional
    # test would fail while floor(rate) copies still flowed through —
    # a group's NULL rows must not flip from dropped to duplicated
    # the moment any rate crosses 1.0.
    return (df.where(F.col(key_col).isNotNull())
            .withColumn("__copies", copies)
            .where(F.col("__copies") > 0)
            .withColumn("__r", F.explode(
                F.sequence(F.lit(1), F.col("__copies"))))
            .drop("__copies", "__r"))
