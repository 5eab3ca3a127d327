"""Temporal join operators Spark lacks natively: as-of join and
range (interval-containment) join.

Both are expressed as compositions of built-in DataFrame ops — one
shuffle each, no UDFs, no driver-side loops — per the engine's
Spark-first rule. The reference engine (LexMapr) has no temporal
joins at all; these serve the event-analytics side of the query
surface (`events` table) the way published stream/batch engines do
(Flink temporal joins, kdb aj, Pandas merge_asof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "range_join"]


def asof_join(left: DataFrame, right: DataFrame,
              key_cols: list[str] | str,
              time_col: str = "ts",
              payload_cols: list[str] | None = None,
              tiebreak_col: str | None = None,
              direction: str = "backward",
              suffix: str = "_matched") -> DataFrame:
    """For every left row, attach the payload of the single right row
    with the greatest ``time_col`` <= the left row's (``backward``;
    ``forward`` = smallest >=), per key. LEFT-join semantics: left
    rows with no qualifying right row keep NULL payloads. NULL keys
    and NULL times never match on either side (SQL/merge_asof
    comparison semantics), they don't pair up with each other.

    Implementation is the union-window form, not a join: tag the two
    inputs, union them, and take ``last(payload, ignorenulls=True)``
    over a running window ordered by (time, side, tiebreak) within
    each key — one shuffle on the key, no per-key loops, no range
    self-join blowup. At equal timestamps the right row sorts BEFORE
    the left row, so a tick at exactly the query time matches in both
    directions (inclusive); among right rows tied on time the largest
    ``tiebreak_col`` wins (backward) / smallest (forward), making the
    result deterministic.

    100-TB posture: cost is one repartition by key + an in-partition
    sort — the same shape as any windowed aggregation; skewed keys are
    AQE's problem, not a new one. Equivalent to Pandas ``merge_asof``
    / DuckDB ``ASOF JOIN``, but with the tie rule pinned.

    ``payload_cols``: right columns to attach (default: all right
    columns except keys and time), each renamed with ``suffix``.
    ``tiebreak_col``: right column ordering ties on time (default:
    first payload column).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join: unknown direction {direction!r} "
            "(expected 'backward' or 'forward')")
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if payload_cols is None:
        payload_cols = [c for c in right.columns
                        if c not in keys and c != time_col]
    if not payload_cols:
        raise ValueError("asof_join: right side has no payload columns")
    if tiebreak_col is None:
        tiebreak_col = payload_cols[0]

    out_cols = [f"{c}{suffix}" for c in payload_cols]
    left_cols = set(left.columns)
    clash = [c for c in out_cols if c in left_cols]
    if clash:
        raise ValueError(f"asof_join: output columns {clash} already "
                         "exist on the left side; pick another suffix")

    # The payload travels as ONE struct, not per-column (r7 review
    # fix): per-column last(ignorenulls) fills would tear rows — a
    # matched right row's genuinely-NULL payload value would be
    # backfilled from an OLDER right row, and a right row whose
    # payload columns were all NULL would be skipped entirely. A
    # struct literal is non-null whenever the right ROW exists, so
    # one fill picks the whole matched row atomically, exactly like
    # pandas merge_asof / SQL ASOF JOIN.
    payload_struct = F.struct(*[
        F.col(c).alias(o) for c, o in zip(payload_cols, out_cols)])
    payload_type = right.select(payload_struct.alias("_p")).schema["_p"] \
        .dataType
    # NULL semantics pinned to merge_asof / SQL ASOF JOIN: a NULL key
    # or NULL time NEVER matches. Spark's window would group NULL keys
    # into one partition (NULL-key lefts matching NULL-key rights) and
    # a NULL-time left row sorts last under the forward ordering
    # (desc = nulls last) where it would wrongly see every right row —
    # so BOTH sides split their predetermined non-matches off before
    # the union: right ones are dropped outright (they can match
    # nothing), left ones bypass the shuffle+window entirely and union
    # back with NULL payloads at the end (an anonymous-traffic-heavy
    # left table would otherwise funnel every NULL-key row through one
    # straggler NULL partition just to compute a known answer).
    null_cond = None
    for k in [*keys, time_col]:
        c = F.col(k).isNull()
        null_cond = c if null_cond is None else null_cond | c
    right_valid = right.where(~null_cond)
    left_valid = left.where(~null_cond)
    left_bypass = left.where(null_cond).select(
        *left.columns,
        *[F.lit(None).cast(f.dataType).alias(f.name)
          for f in payload_type.fields])
    # side 0 = right (sorts first at equal time -> inclusive match)
    r_tagged = right_valid.select(
        *[F.col(k) for k in keys],
        F.col(time_col).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(tiebreak_col).alias("_tie"),
        payload_struct.alias("_p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left.columns],
    )
    l_tagged = left_valid.select(
        *[F.col(k) for k in keys],
        F.col(time_col).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[tiebreak_col].dataType).alias("_tie"),
        F.lit(None).cast(payload_type).alias("_p"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    if direction == "backward":
        order = [F.col("_t").asc(), F.col("_side").asc(),
                 F.col("_tie").asc_nulls_first()]
    else:
        order = [F.col("_t").desc(), F.col("_side").asc(),
                 F.col("_tie").desc_nulls_first()]
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    unioned = r_tagged.unionByName(l_tagged)
    filled = unioned.select(
        "*", F.last("_p", ignorenulls=True).over(w).alias("_f_p"))
    matched = (
        filled.where(F.col("_side") == 1)
        .select(*[F.col(f"_l_{c}").alias(c) for c in left.columns],
                *[F.col(f"_f_p.{o}").alias(o) for o in out_cols])
    )
    return matched.unionByName(left_bypass)


def range_join(points: DataFrame, intervals: DataFrame,
               ts_col: str = "ts",
               start_col: str = "start_ts", end_col: str = "end_ts",
               bucket_seconds: int = 3600) -> DataFrame:
    """Big-big interval-containment join: every (point, interval)
    pair with ``start_col <= ts_col <= end_col`` (inclusive), with no
    join key required on either side.

    A naive theta-join here is a cartesian product — a BroadcastNestedLoopJoin
    that dies the moment neither side fits in memory. Instead both
    sides are mapped onto fixed-width time buckets: each interval
    explodes to every bucket it overlaps, each point lands in exactly
    ONE bucket, and a plain equi-join on the bucket id runs as a
    shuffled hash join that AQE can size and skew-split. The exact
    containment predicate then filters within buckets. Because a
    point has a single bucket, no dedup pass is needed — each
    qualifying pair is produced exactly once.

    Pick ``bucket_seconds`` near the median interval length: the
    interval explode emits ``span/bucket_seconds + 1`` rows per
    interval (fan-out cost), while buckets much wider than the
    intervals make the equi-join degenerate toward all-pairs within a
    bucket (filter cost). Both failure modes are visible in the plan
    as row-count blowups, not as silent wrong answers.

    Bucket ids come from second-truncated epochs, which is
    containment-safe: truncation is monotone, so
    ``start <= ts <= end`` implies
    ``bucket(start) <= bucket(ts) <= bucket(end)`` and the exact
    filter never loses a pair. Column names must not collide across
    the two inputs (alias before calling).
    """
    if bucket_seconds <= 0:
        raise ValueError("range_join: bucket_seconds must be positive")
    clash = sorted(set(points.columns) & set(intervals.columns))
    if clash:
        raise ValueError(f"range_join: column names {clash} appear on "
                         "both sides; alias before joining")
    # inverted (start > end) intervals can match nothing, but Spark's
    # sequence() COUNTS DOWN for descending bounds — without this
    # guard an inverted interval would fan out to every bucket between
    # its ends and die only at the exact filter, pure wasted shuffle.
    # This same where() also removes NULL-bound intervals (NULL <=
    # comparison -> filtered), and point-side NULL timestamps drop out
    # of the bucket equi-join on their own — together matching SQL
    # BETWEEN's never-match semantics.
    intervals = intervals.where(F.col(start_col) <= F.col(end_col))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(
            F.floor(F.unix_timestamp(F.col(start_col)) / bucket_seconds)
            .cast("long"),
            F.floor(F.unix_timestamp(F.col(end_col)) / bucket_seconds)
            .cast("long"))))
    pt = points.withColumn(
        "_bucket",
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds)
        .cast("long"))
    return (
        pt.join(iv, "_bucket")
        .where((F.col(ts_col) >= F.col(start_col))
               & (F.col(ts_col) <= F.col(end_col)))
        .drop("_bucket")
    )
