"""Temporal join operators: as-of join and bucketized range join
(lexmapr_spark/ops/joins.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lexmapr_spark import engine
from lexmapr_spark.ops import joins


@pytest.fixture(scope="module")
def spark():
    s = engine.build_spark(cpus=4, app="joins_tests", shuffle_partitions=8)
    yield s
    s.stop()


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def quotes(spark):
    # per-key price ticks; key "a" has a tie at minute 5
    rows = [
        ("a", _ts(1), 100, 1.0),
        ("a", _ts(5), 101, 2.0),
        ("a", _ts(5), 102, 3.0),   # tie on ts -> larger quote_id wins
        ("a", _ts(9), 103, 4.0),
        ("b", _ts(4), 200, 9.0),
    ]
    return spark.createDataFrame(
        rows, "k STRING, ts TIMESTAMP, quote_id LONG, px DOUBLE")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("a", _ts(0), 10),    # before any quote -> NULL
        ("a", _ts(5), 11),    # equal ts -> inclusive, tie -> 102
        ("a", _ts(7), 12),    # between -> 102
        ("a", _ts(30), 13),   # after all -> 103
        ("b", _ts(4), 14),    # exact equal on key b -> 200
        ("c", _ts(4), 15),    # key with no quotes at all -> NULL
    ]
    return spark.createDataFrame(
        rows, "k STRING, ts TIMESTAMP, trade_id LONG")


def test_asof_backward_matches_latest_prior_inclusive(quotes, trades):
    out = joins.asof_join(trades, quotes, "k",
                          payload_cols=["quote_id", "px"],
                          tiebreak_col="quote_id")
    got = {r.trade_id: (r.quote_id_matched, r.px_matched)
           for r in out.collect()}
    assert got == {
        10: (None, None),
        11: (102, 3.0),
        12: (102, 3.0),
        13: (103, 4.0),
        14: (200, 9.0),
        15: (None, None),
    }
    # left row count and columns are preserved
    assert out.count() == trades.count()
    assert set(trades.columns) < set(out.columns)


def test_asof_forward_matches_earliest_following(quotes, trades):
    out = joins.asof_join(trades, quotes, "k",
                          payload_cols=["quote_id"],
                          tiebreak_col="quote_id",
                          direction="forward")
    got = {r.trade_id: r.quote_id_matched for r in out.collect()}
    # forward ties on time take the SMALLEST tiebreak
    assert got == {10: 100, 11: 101, 12: 103, 13: None, 14: 200, 15: None}


def test_asof_matches_pandas_merge_asof(spark):
    # randomized differential against the published reference
    # implementation (pandas.merge_asof, backward, allow_exact_matches)
    import pandas as pd

    n_l, n_r = 200, 120
    lrows = [("k%d" % (i % 7), _ts(i % 50, (i * 13) % 60), i)
             for i in range(n_l)]
    rrows = [("k%d" % (i % 7), _ts((i * 3) % 50, (i * 29) % 60), i, i * 1.5)
             for i in range(n_r)]
    left = spark.createDataFrame(lrows, "k STRING, ts TIMESTAMP, lid LONG")
    right = spark.createDataFrame(
        rrows, "k STRING, ts TIMESTAMP, rid LONG, v DOUBLE")
    got = {r.lid: r.rid_matched
           for r in joins.asof_join(left, right, "k",
                                    payload_cols=["rid", "v"],
                                    tiebreak_col="rid").collect()}

    lp = pd.DataFrame(lrows, columns=["k", "ts", "lid"]).sort_values("ts",
                                                                     kind="stable")
    # pandas keeps the LAST right row among exact-ts duplicates, so
    # sort by (ts, rid) to pin the same largest-tiebreak rule
    rp = pd.DataFrame(rrows, columns=["k", "ts", "rid", "v"]) \
        .sort_values(["ts", "rid"], kind="stable")
    ref = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward",
                        allow_exact_matches=True)
    want = {int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
            for r in ref.itertuples()}
    assert got == want


def test_asof_nearest_picks_smallest_abs_delta(quotes, trades):
    out = joins.asof_join(trades, quotes, "k",
                          payload_cols=["quote_id"],
                          tiebreak_col="quote_id",
                          direction="nearest")
    got = {r.trade_id: r.quote_id_matched for r in out.collect()}
    assert got == {
        10: 100,    # nothing before; forward to minute 1
        11: 102,    # exact-ts tie -> backward leg, largest tiebreak
        12: 102,    # 2 min back vs 2 min fwd -> exact tie -> backward
        13: 103,    # after all -> backward
        14: 200,    # exact equal
        15: None,   # key with no quotes
    }


def test_asof_nearest_matches_pandas_merge_asof(spark):
    # randomized differential vs pandas merge_asof(direction="nearest")
    # — same corpus shape as the backward differential; right side
    # deduped to one row per (k, ts) because pandas picks the LAST
    # among exact-ts duplicates on the backward leg but the FIRST on
    # the forward leg of nearest, an order-of-insertion artifact we
    # deliberately replace with the pinned tiebreak rule
    import pandas as pd

    n_l, n_r = 200, 120
    lrows = [("k%d" % (i % 7), _ts(i % 50, (i * 13) % 60), i)
             for i in range(n_l)]
    rrows = {}
    for i in range(n_r):
        key = ("k%d" % (i % 7), _ts((i * 3) % 50, (i * 29) % 60))
        rrows[key] = (*key, i, i * 1.5)
    rrows = sorted(rrows.values(), key=lambda r: r[2])
    left = spark.createDataFrame(lrows, "k STRING, ts TIMESTAMP, lid LONG")
    right = spark.createDataFrame(
        rrows, "k STRING, ts TIMESTAMP, rid LONG, v DOUBLE")
    got = {r.lid: r.rid_matched
           for r in joins.asof_join(left, right, "k",
                                    payload_cols=["rid", "v"],
                                    tiebreak_col="rid",
                                    direction="nearest").collect()}

    lp = pd.DataFrame(lrows, columns=["k", "ts", "lid"]) \
        .sort_values("ts", kind="stable")
    rp = pd.DataFrame(rrows, columns=["k", "ts", "rid", "v"]) \
        .sort_values(["ts", "rid"], kind="stable")
    ref = pd.merge_asof(lp, rp, on="ts", by="k", direction="nearest")
    want = {int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
            for r in ref.itertuples()}
    assert got == want


def test_asof_nearest_null_keys_times_and_plan(spark):
    right = spark.createDataFrame(
        [(None, _ts(1), 1), ("k", None, 2), ("k", _ts(2), 3)],
        "k STRING, ts TIMESTAMP, rid LONG")
    left = spark.createDataFrame(
        [(None, _ts(5), 10), ("k", None, 11), ("k", _ts(5), 12)],
        "k STRING, ts TIMESTAMP, lid LONG")
    out = joins.asof_join(left, right, "k", payload_cols=["rid"],
                          tiebreak_col="rid", direction="nearest")
    got = {r.lid: r.rid_matched for r in out.collect()}
    assert got == {10: None, 11: None, 12: 3}
    # both fills ride the ONE key exchange — no join operators, and a
    # single Exchange feeding the window(s)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_asof_tolerance_and_exact_match_unit(quotes, trades):
    # tolerance: trade 13 (minute 30) is 21 min past the last quote
    # (minute 9) -> NULL under a 10-min tolerance; trade 12 (minute 7)
    # is 2 min past minute-5 quotes -> kept
    out = joins.asof_join(trades, quotes, "k", payload_cols=["quote_id"],
                          tiebreak_col="quote_id", tolerance=600.0)
    got = {r.trade_id: r.quote_id_matched for r in out.collect()}
    assert got == {10: None, 11: 102, 12: 102, 13: None, 14: 200, 15: None}
    # strict: the equal-ts matches (trades 11, 14) fall back to the
    # previous strictly-earlier quote (11 -> minute 1) or nothing (14)
    out = joins.asof_join(trades, quotes, "k", payload_cols=["quote_id"],
                          tiebreak_col="quote_id",
                          allow_exact_matches=False)
    got = {r.trade_id: r.quote_id_matched for r in out.collect()}
    assert got == {10: None, 11: 100, 12: 102, 13: 103, 14: None, 15: None}
    # strict nearest: trade 11 at minute 5 must skip the minute-5 tie
    # pair entirely — nearest among {1, 9} is minute-1 quote... both
    # are 4 min away -> exact tie -> backward -> 100
    out = joins.asof_join(trades, quotes, "k", payload_cols=["quote_id"],
                          tiebreak_col="quote_id", direction="nearest",
                          allow_exact_matches=False)
    got = {r.trade_id: r.quote_id_matched for r in out.collect()}
    assert got == {10: 100, 11: 100, 12: 102, 13: 103, 14: None, 15: None}


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("exact", [True, False])
@pytest.mark.parametrize("tol_s", [None, 120.0])
def test_asof_differential_grid_vs_pandas(spark, direction, exact, tol_s):
    # the full merge_asof parameter surface: direction x
    # allow_exact_matches x tolerance, randomized corpus, right side
    # deduped per (k, ts) so pandas' insertion-order pick among
    # exact-ts duplicates can't differ from the pinned tiebreak rule
    import pandas as pd

    n_l, n_r = 150, 90
    lrows = [("k%d" % (i % 5), _ts(i % 40, (i * 13) % 60), i)
             for i in range(n_l)]
    rdict = {}
    for i in range(n_r):
        key = ("k%d" % (i % 5), _ts((i * 3) % 40, (i * 29) % 60))
        rdict[key] = (*key, i)
    rrows = sorted(rdict.values(), key=lambda r: r[2])
    left = spark.createDataFrame(lrows, "k STRING, ts TIMESTAMP, lid LONG")
    right = spark.createDataFrame(rrows, "k STRING, ts TIMESTAMP, rid LONG")
    got = {r.lid: r.rid_matched
           for r in joins.asof_join(
               left, right, "k", payload_cols=["rid"],
               tiebreak_col="rid", direction=direction,
               tolerance=tol_s,
               allow_exact_matches=exact).collect()}

    lp = pd.DataFrame(lrows, columns=["k", "ts", "lid"]) \
        .sort_values("ts", kind="stable")
    rp = pd.DataFrame(rrows, columns=["k", "ts", "rid"]) \
        .sort_values(["ts", "rid"], kind="stable")
    ref = pd.merge_asof(
        lp, rp, on="ts", by="k", direction=direction,
        allow_exact_matches=exact,
        tolerance=None if tol_s is None else pd.Timedelta(seconds=tol_s))
    want = {int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
            for r in ref.itertuples()}
    assert got == want


def test_asof_deterministic_on_full_right_ties(spark):
    # two right rows tied on (key, ts, tiebreak) but different payload
    # values: the full-payload ORDER BY tiebreaker must pick the same
    # one every run (largest payload struct for backward)
    right = spark.createDataFrame(
        [("k", _ts(1), 1, "a"), ("k", _ts(1), 1, "z")],
        "k STRING, ts TIMESTAMP, rid LONG, v STRING")
    left = spark.createDataFrame(
        [("k", _ts(2), 10)], "k STRING, ts TIMESTAMP, lid LONG")
    for _ in range(3):
        got = joins.asof_join(left, right, "k",
                              payload_cols=["rid", "v"],
                              tiebreak_col="rid").collect()
        assert [(r.rid_matched, r.v_matched) for r in got] == [(1, "z")]


def test_asof_rejects_reserved_staging_names(spark, quotes):
    left = spark.createDataFrame(
        [("k", _ts(1), 5)], "_side STRING, ts TIMESTAMP, lid LONG")
    with pytest.raises(ValueError, match="staging"):
        joins.asof_join(left, quotes.withColumnRenamed("k", "_side"),
                        "_side", payload_cols=["px"])


def test_asof_null_payload_no_row_tearing(spark):
    # the matched right row's values must come from THAT row even when
    # some (or all) of its payload columns are NULL — per-column fills
    # would backfill px from the older row (row tearing)
    right = spark.createDataFrame(
        [("k", _ts(1), 1, 5.0), ("k", _ts(2), 2, None),
         ("k", _ts(4), None, None)],
        "k STRING, ts TIMESTAMP, rid LONG, px DOUBLE")
    left = spark.createDataFrame(
        [("k", _ts(3), 10), ("k", _ts(5), 11), ("k", _ts(0), 12)],
        "k STRING, ts TIMESTAMP, lid LONG")
    got = {r.lid: (r.rid_matched, r.px_matched)
           for r in joins.asof_join(left, right, "k",
                                    payload_cols=["rid", "px"],
                                    tiebreak_col="rid").collect()}
    assert got == {
        10: (2, None),      # matched row's NULL px stays NULL
        11: (None, None),   # all-NULL payload row still matches
        12: (None, None),   # genuinely unmatched
    }


def test_asof_null_keys_and_times_never_match(spark):
    # SQL / merge_asof semantics: NULL never equals NULL — a NULL-key
    # purchase must NOT pick up a NULL-key click (Spark's window would
    # happily group them), and NULL-time rows match nothing in either
    # direction (the forward ordering sorts NULL times last, where an
    # unmasked fill would see every right row)
    right = spark.createDataFrame(
        [(None, _ts(1), 1), ("k", None, 2), ("k", _ts(2), 3)],
        "k STRING, ts TIMESTAMP, rid LONG")
    left = spark.createDataFrame(
        [(None, _ts(5), 10), ("k", None, 11), ("k", _ts(5), 12)],
        "k STRING, ts TIMESTAMP, lid LONG")
    for direction, want12 in (("backward", 3), ("forward", None)):
        got = {r.lid: r.rid_matched
               for r in joins.asof_join(left, right, "k",
                                        payload_cols=["rid"],
                                        tiebreak_col="rid",
                                        direction=direction).collect()}
        assert got == {10: None, 11: None, 12: want12}, direction


def test_range_join_inverted_and_null_intervals(spark):
    points = spark.createDataFrame(
        [(1, _ts(5)), (2, None)], "pid LONG, ts TIMESTAMP")
    intervals = spark.createDataFrame(
        [(100, _ts(0), _ts(10)),    # valid, catches point 1
         (200, _ts(10), _ts(0)),    # inverted -> matches nothing
         (300, None, _ts(10)),      # NULL bound -> matches nothing
         (400, _ts(0), None)],
        "iid LONG, start_ts TIMESTAMP, end_ts TIMESTAMP")
    got = {(r.pid, r.iid)
           for r in joins.range_join(points, intervals,
                                     bucket_seconds=60).collect()}
    assert got == {(1, 100)}


def test_asof_rejects_bad_args(quotes, trades):
    with pytest.raises(ValueError, match="direction"):
        joins.asof_join(trades, quotes, "k", direction="sideways")
    with pytest.raises(ValueError, match="suffix"):
        joins.asof_join(trades.withColumn("px_matched", F.lit(1)),
                        quotes, "k", payload_cols=["px"])
    with pytest.raises(ValueError, match="payload"):
        joins.asof_join(trades, quotes.select("k", "ts"), "k")


# ---------------------------------------------------------------------------
# range_join
# ---------------------------------------------------------------------------


def test_range_join_exact_containment(spark):
    points = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(10)), (3, _ts(30)), (4, _ts(59, 59))],
        "pid LONG, ts TIMESTAMP")
    intervals = spark.createDataFrame(
        [(100, _ts(0), _ts(10)),       # inclusive both ends
         (200, _ts(25), _ts(59, 58)),  # excludes point 4 by 1s
         (300, _ts(40), _ts(45))],     # empty
        "iid LONG, start_ts TIMESTAMP, end_ts TIMESTAMP")
    got = {(r.pid, r.iid)
           for r in joins.range_join(points, intervals,
                                     bucket_seconds=600).collect()}
    assert got == {(1, 100), (2, 100), (3, 200)}
    # tiny buckets (interval spans MANY buckets) must not duplicate
    # pairs — each point lives in exactly one bucket
    got_small = {(r.pid, r.iid)
                 for r in joins.range_join(points, intervals,
                                           bucket_seconds=7).collect()}
    assert got_small == got
    rows = joins.range_join(points, intervals, bucket_seconds=7).collect()
    assert len(rows) == len(got)


def test_range_join_differential_vs_python(spark):
    import random
    rng = random.Random(7)
    points = [(i, _ts(rng.randrange(50), rng.randrange(60)))
              for i in range(300)]
    ivs = []
    for i in range(80):
        s = dt.datetime(2024, 1, 1, 0, rng.randrange(50), rng.randrange(60))
        ivs.append((i, s, s + dt.timedelta(seconds=rng.randrange(1, 900))))
    p = spark.createDataFrame(points, "pid LONG, ts TIMESTAMP")
    iv = spark.createDataFrame(
        ivs, "iid LONG, start_ts TIMESTAMP, end_ts TIMESTAMP")
    got = {(r.pid, r.iid)
           for r in joins.range_join(p, iv, bucket_seconds=300).collect()}
    want = {(pid, iid) for pid, ts in points for iid, s, e in ivs
            if s <= ts <= e}
    assert got == want


def test_asof_plan_is_single_window_no_join(spark, quotes, trades):
    # the union-window form must not degrade into any join operator:
    # one hash shuffle on the key, one window, zero joins
    out = joins.asof_join(trades, quotes, "k", payload_cols=["px"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Window") == 1


def test_range_join_plan_is_equi_join_not_nested_loop(spark):
    # containment runs as an equi-join on the bucket id (hash join /
    # SMJ — AQE's choice), never the cartesian BroadcastNestedLoopJoin
    # a raw theta-join would produce
    points = spark.range(2000).select(
        F.col("id").alias("pid"),
        F.timestamp_seconds(1700000000 + F.col("id") * 60).alias("ts"))
    intervals = spark.range(500).select(
        F.col("id").alias("iid"),
        F.timestamp_seconds(1700000000 + F.col("id") * 240).alias("start_ts"),
        F.timestamp_seconds(1700000000 + F.col("id") * 240 + 900)
        .alias("end_ts"))
    out = joins.range_join(points, intervals)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "_bucket" in plan
    # and it actually matches: every point inside some interval
    assert out.count() > 0


def test_range_join_auto_bucket_mixed_lengths(spark):
    # no bucket_seconds passed: derived from the median interval span.
    # Mixed lengths (30 s spikes + 2 h slabs) must still produce the
    # exact containment set — the derived width only shifts cost, not
    # answers
    import random
    rng = random.Random(11)
    points = [(i, _ts(rng.randrange(55), rng.randrange(60)))
              for i in range(200)]
    ivs = []
    for i in range(40):
        s = dt.datetime(2024, 1, 1, 0, rng.randrange(50), rng.randrange(60))
        span = rng.choice([30, 30, 30, 7200])  # skewed length mix
        ivs.append((i, s, s + dt.timedelta(seconds=span)))
    p = spark.createDataFrame(points, "pid LONG, ts TIMESTAMP")
    iv = spark.createDataFrame(
        ivs, "iid LONG, start_ts TIMESTAMP, end_ts TIMESTAMP")
    got = {(r.pid, r.iid) for r in joins.range_join(p, iv).collect()}
    want = {(pid, iid) for pid, ts in points for iid, s, e in ivs
            if s <= ts <= e}
    assert got == want


def test_asof_ntz_requires_fixed_offset_session(spark):
    # nearest/tolerance deltas over TIMESTAMP_NTZ go through the
    # session time zone; a DST-observing zone bends the wall->epoch
    # map around transitions, so anything but a fixed offset raises
    right = spark.createDataFrame(
        [("k", dt.datetime(2024, 3, 10, 0, 45), 1)],
        "k STRING, ts TIMESTAMP_NTZ, rid LONG")
    left = spark.createDataFrame(
        [("k", dt.datetime(2024, 3, 10, 1, 30), 10)],
        "k STRING, ts TIMESTAMP_NTZ, lid LONG")
    # engine session is UTC-pinned: fine
    got = joins.asof_join(left, right, "k", payload_cols=["rid"],
                          direction="nearest").collect()
    assert got[0].rid_matched == 1
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with pytest.raises(ValueError, match="fixed-offset"):
            joins.asof_join(left, right, "k", payload_cols=["rid"],
                            direction="nearest")
        # plain backward never computes deltas -> no restriction
        joins.asof_join(left, right, "k", payload_cols=["rid"])
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_derive_bucket_seconds_is_the_op_rule(spark):
    # the helper IS range_join's auto rule: equal-width 90 s intervals
    # -> width 90, fanout = sum(span)/90 + n = n + n = 2n
    iv = spark.range(50).select(
        F.col("id").alias("iid"),
        F.timestamp_seconds(1_700_000_000 + F.col("id") * 600)
        .alias("start_ts"))
    iv = iv.withColumn("end_ts", F.timestamp_seconds(
        F.unix_timestamp("start_ts") + 90))
    b, stats = joins.derive_bucket_seconds(iv)
    assert b == 90
    assert stats == {"n_intervals": 50, "estimated_fanout_rows": 100,
                     "span_max": 90}
    # empty interval side falls back to the old fixed default
    b2, stats2 = joins.derive_bucket_seconds(iv.where(F.lit(False)))
    assert b2 == 3600 and stats2["n_intervals"] == 0


def test_range_join_rejects_reserved_bucket_column(spark):
    p = spark.createDataFrame(
        [(1, _ts(1), 9)], "pid LONG, ts TIMESTAMP, _bucket LONG")
    iv = spark.createDataFrame(
        [(1, _ts(0), _ts(2))], "iid LONG, start_ts TIMESTAMP, "
        "end_ts TIMESTAMP")
    with pytest.raises(ValueError, match="staging"):
        joins.range_join(p, iv, bucket_seconds=60)


def test_range_join_rejects_colliding_columns(spark):
    df = spark.createDataFrame([(1, _ts(1))], "pid LONG, ts TIMESTAMP")
    iv = spark.createDataFrame(
        [(1, _ts(0), _ts(2))], "pid LONG, start_ts TIMESTAMP, "
        "end_ts TIMESTAMP")
    with pytest.raises(ValueError, match="both sides"):
        joins.range_join(df, iv)
    with pytest.raises(ValueError, match="bucket_seconds"):
        joins.range_join(df, iv.withColumnRenamed("pid", "iid"),
                         bucket_seconds=0)


# ---------------------------------------------------------------------------
# range_count_sum (r9): pre-aggregated twin of range_join + groupBy
# ---------------------------------------------------------------------------

def _pair_form(points, intervals, bucket_seconds=600):
    pairs = joins.range_join(points, intervals,
                             bucket_seconds=bucket_seconds)
    return (pairs.groupBy("iid", "start_ts", "end_ts")
            .agg(F.count(F.lit(1)).alias("n_points"),
                 F.sum("val").alias("value_sum")))


def _rcs_rows(df):
    return sorted((r.iid, r.start_ts, r.end_ts, r.n_points,
                   r.value_sum if r.value_sum is None
                   else float(r.value_sum))
                  for r in df.collect())


def test_range_count_sum_matches_pair_form(spark):
    """The bucketed aggregate must be row-identical to
    range_join + groupBy on adversarial cases: boundary timestamps,
    NULL values, all-NULL-value intervals, intervals with no points,
    sub-bucket intervals (no inner epochs), NULL point timestamps."""
    import random

    rng = random.Random(13)
    points = [(i,
               _ts(rng.randrange(50), rng.randrange(60)),
               None if i % 7 == 0 else round(rng.uniform(-5, 5), 2))
              for i in range(400)]
    points.append((9001, None, 1.25))          # NULL ts: never matches
    ivs = []
    for i in range(90):
        s = dt.datetime(2024, 1, 1, 0, rng.randrange(50),
                        rng.randrange(60))
        ivs.append((i, s, s + dt.timedelta(
            seconds=rng.choice([0, 3, 30, 300, 1500]))))
    # interval whose points are all NULL-valued (sum must be NULL),
    # and exact-boundary intervals around a known point
    ivs.append((900, points[0][1], points[0][1]))
    p = spark.createDataFrame(points, "pid LONG, ts TIMESTAMP, v DOUBLE") \
        .select("pid", "ts", F.col("v").cast("decimal(18,2)").alias("val"))
    iv = spark.createDataFrame(
        ivs, "iid LONG, start_ts TIMESTAMP, end_ts TIMESTAMP")
    want = _rcs_rows(_pair_form(p, iv))
    for w in (7, 60, 600):
        got = _rcs_rows(
            joins.range_count_sum(p.select("ts", "val"), iv,
                                  sum_col="val", bucket_seconds=w))
        assert got == want, f"bucket_seconds={w}"
    # auto-derived width must agree too (eager derivation path)
    got_auto = _rcs_rows(
        joins.range_count_sum(p.select("ts", "val"), iv, sum_col="val"))
    assert got_auto == want
    # count-only form
    co = sorted((r.iid, r.n_points) for r in joins.range_count_sum(
        p.select("ts"), iv, bucket_seconds=60).collect())
    assert co == sorted((a, d) for a, _b, _c, d, _e in want)


def test_range_count_sum_rejects_bad_args(spark):
    p = spark.createDataFrame([(1, _ts(0))], "pid LONG, ts TIMESTAMP")
    iv = spark.createDataFrame([(1, _ts(0), _ts(5))],
                               "iid LONG, start_ts TIMESTAMP, "
                               "end_ts TIMESTAMP")
    with pytest.raises(ValueError, match="positive"):
        joins.range_count_sum(p, iv, bucket_seconds=0)
    with pytest.raises(ValueError, match="alias before joining"):
        joins.range_count_sum(p.withColumnRenamed("pid", "iid"), iv)
    with pytest.raises(ValueError, match="reserved|staging"):
        joins.range_count_sum(p.withColumnRenamed("pid", "_bucket"), iv)


def test_range_count_sum_whale_tier_identical(spark):
    """r9: a ~1000x whale interval routes through the coarse tier and
    the result stays row-identical to the single-tier form and the
    pair form; the whale's exploded epoch count is bounded by
    span/(whale_factor*W) + 2*whale_factor + 1, not span/W."""
    import datetime as dt
    import random

    rng = random.Random(31)
    W, WF = 5, 8
    points = [(i, _ts(rng.randrange(55), rng.randrange(60)),
               None if i % 5 == 0 else round(rng.uniform(-3, 3), 2))
              for i in range(500)]
    ivs = [(i, _ts(m := rng.randrange(50), s := rng.randrange(60)),
            _ts(m, s) + dt.timedelta(seconds=rng.choice([0, 4, 17])))
           for i in range(60)]
    # the whale: ~55 min span vs the 0-17 s crowd
    ivs.append((900, _ts(0, 1), _ts(55, 1)))
    p = spark.createDataFrame(points, "pid LONG, ts TIMESTAMP, v DOUBLE") \
        .select("ts", F.col("v").cast("decimal(18,2)").alias("val"))
    iv = spark.createDataFrame(
        ivs, "iid LONG, start_ts TIMESTAMP, end_ts TIMESTAMP")
    tiered = _rcs_rows(joins.range_count_sum(
        p, iv, sum_col="val", bucket_seconds=W, whale_factor=WF))
    flat = _rcs_rows(joins.range_count_sum(
        p, iv, sum_col="val", bucket_seconds=W, whale_factor=0))
    assert tiered == flat
    assert tiered == _rcs_rows(_pair_form(
        spark.createDataFrame(points,
                              "pid LONG, ts TIMESTAMP, v DOUBLE")
        .select("pid", "ts", F.col("v").cast("decimal(18,2)")
                .alias("val")).select("pid", "ts", "val"), iv))
    # bound: coarse + leftover-fine + edge epochs for the whale
    span = 55 * 60
    bound = span // (WF * W) + 2 * WF + 2
    naive = span // W
    assert bound < naive / 4  # the tier is actually doing something
    # count the whale's exploded epochs by reproducing the tier split
    # arithmetic on the one whale row
    b_lo, b_hi = 1 // W, (55 * 60 + 1) // W
    cb_start = -(-(b_lo + 1) // WF)
    cb_end = (b_hi - WF) // WF
    n_coarse = cb_end - cb_start + 1
    n_left = max(0, cb_start * WF - 1 - b_lo)
    n_right = max(0, b_hi - 1 - (cb_end * WF + WF) + 1)
    assert n_coarse + n_left + n_right + 2 <= bound


# ---------------------------------------------------------------------------
# asof_join skew_buckets (r9): hot-key pre-split must be row-identical
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("exact", [True, False])
def test_asof_skew_buckets_identical(spark, direction, exact):
    """The (key, time-bucket) pre-split + carry pass must reproduce the
    unsplit window exactly: hot key holding half the rows, duplicate
    timestamps, NULL keys/times, NULL right tiebreaks, tolerance on
    and off, several bucket counts."""
    import random

    rng = random.Random(11)
    base = dt.datetime(2024, 1, 1)

    def ts(s, us=0):
        return base + dt.timedelta(seconds=s, microseconds=us)

    lrows = [(0 if i % 2 == 0 else rng.randrange(1, 8),
              ts(rng.randrange(0, 900), rng.choice([0, 0, 500000])), i)
             for i in range(400)]
    rrows = [(0 if j % 2 == 0 else rng.randrange(1, 8),
              ts(rng.randrange(0, 900), rng.choice([0, 0, 500000])),
              None if j % 13 == 0 else j,
              round(rng.uniform(0, 9), 2)) for j in range(200)]
    lrows += [(None, ts(10), 9991), (5, None, 9992)]
    rrows += [(None, ts(10), 1, 1.0), (5, None, 2, 2.0)]
    left = spark.createDataFrame(lrows, "k INT, ts TIMESTAMP, lid LONG")
    right = spark.createDataFrame(
        rrows, "k INT, ts TIMESTAMP, rid LONG, px DOUBLE")
    for tol in (None, 120.0):
        want = sorted(map(repr, joins.asof_join(
            left, right, "k", payload_cols=["rid", "px"],
            tiebreak_col="rid", direction=direction, tolerance=tol,
            allow_exact_matches=exact).collect()))
        for b in (2, 5):
            got = sorted(map(repr, joins.asof_join(
                left, right, "k", payload_cols=["rid", "px"],
                tiebreak_col="rid", direction=direction, tolerance=tol,
                allow_exact_matches=exact, skew_buckets=b).collect()))
            assert got == want, (direction, exact, tol, b)


def test_asof_skew_buckets_rejects_bad_args(spark, quotes, trades):
    with pytest.raises(ValueError, match="skew_buckets"):
        joins.asof_join(trades, quotes, "k", payload_cols=["px"],
                        skew_buckets=1)
    mapped = quotes.select("k", "ts", F.create_map(
        F.lit("a"), F.col("px")).alias("px"))
    with pytest.raises(ValueError, match="orderable"):
        joins.asof_join(trades, mapped, "k", payload_cols=["px"],
                        skew_buckets=4)


def test_asof_skew_buckets_splits_the_window_partition(spark):
    """With every row on ONE key, the pre-split must actually divide
    the window's partitioning key space (the whole point: the unsplit
    form serializes the key in one task)."""
    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), i)
         for i in range(200)], "k INT, ts TIMESTAMP, lid LONG")
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=3 * j), j,
          float(j)) for j in range(60)],
        "k INT, ts TIMESTAMP, rid LONG, px DOUBLE")
    out = joins.asof_join(left, right, "k", payload_cols=["rid", "px"],
                          tiebreak_col="rid", skew_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_sb" in plan  # the window partitions by (k, _sb)
    want = sorted(map(repr, joins.asof_join(
        left, right, "k", payload_cols=["rid", "px"],
        tiebreak_col="rid").collect()))
    assert sorted(map(repr, out.collect())) == want


def test_range_join_whale_tier_identical(spark):
    """r9: a 1000x whale interval must route through the coarse tier
    with bounded explode, and the two-tier union must be
    row-identical to the single-tier form."""
    import random

    rng = random.Random(5)
    points = [(i, _ts(rng.randrange(0, 59), rng.randrange(60)))
              for i in range(500)]
    ivs = [(i, dt.datetime(2024, 1, 1, 0, rng.randrange(55)),
            None) for i in range(60)]
    ivs = [(i, s, s + dt.timedelta(seconds=rng.randrange(1, 40)))
           for i, s, _ in ivs]
    # the whale: spans nearly the whole hour (~1000x the median span)
    ivs.append((900, dt.datetime(2024, 1, 1, 0, 0),
                dt.datetime(2024, 1, 1, 0, 59, 59)))
    p = spark.createDataFrame(points, "pid LONG, ts TIMESTAMP")
    iv = spark.createDataFrame(
        ivs, "iid LONG, start_ts TIMESTAMP, end_ts TIMESTAMP")
    want = {(r.pid, r.iid) for r in joins.range_join(
        p, iv, bucket_seconds=20, whale_factor=0).collect()}
    got_rows = joins.range_join(p, iv, bucket_seconds=20,
                                whale_factor=8).collect()
    got = {(r.pid, r.iid) for r in got_rows}
    assert got == want
    assert len(got_rows) == len(got)  # exactly-once per pair
    # python truth
    truth = {(pid, iid) for pid, ts in points for iid, s, e in ivs
             if s <= ts <= e}
    assert got == truth
    # the whale's explode is bounded by span/(whale_factor*W)+1
    n_whale_rows = spark.createDataFrame(
        [ivs[-1]], "iid LONG, start_ts TIMESTAMP, end_ts TIMESTAMP") \
        .select(F.explode(F.sequence(
            F.floor(F.unix_timestamp("start_ts") / (8 * 20)),
            F.floor(F.unix_timestamp("end_ts") / (8 * 20))))).count()
    assert n_whale_rows <= (3600 // (8 * 20)) + 2
    # auto mode still works end-to-end with the whale present
    auto = {(r.pid, r.iid) for r in joins.range_join(p, iv).collect()}
    assert auto == truth
