"""r9 deep rows bench.py --deep cannot carry (bench.py is frozen this
round): the as-of NEAREST direction at depth, and the pathological
single-hot-key wall with and without the skew_buckets pre-split.

Writes one JSON line; record it in BENCH/bench_skew_r09.json.
Run calm (same discipline as bench.py --deep).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import functions as F

    from lexmapr_spark import engine
    from lexmapr_spark.ops import joins

    spark = engine.build_spark(cpus=cpus, app="bench_skew_r09",
                               shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    out = {"metric": "asof_skew_r09", "cpus": cpus,
           "load_at_start": round(os.getloadavg()[0], 2)}

    n_left, n_right, n_keys = 2_000_000, 500_000, 10_000

    def mat(df):
        df = df.persist()
        df.count()
        return df

    jleft = mat(spark.range(n_left).select(
        F.pmod(F.xxhash64("id", F.lit("k")), n_keys).alias("k"),
        F.timestamp_seconds(1_700_000_000
                            + F.pmod(F.xxhash64("id", F.lit("t")),
                                     86_400 * 30)).alias("ts"),
        F.col("id").alias("lid")))
    jright = mat(spark.range(n_right).select(
        F.pmod(F.xxhash64("id", F.lit("rk")), n_keys).alias("k"),
        F.timestamp_seconds(1_700_000_000
                            + F.pmod(F.xxhash64("id", F.lit("rt")),
                                     86_400 * 30)).alias("ts"),
        F.col("id").alias("rid"),
        (F.pmod(F.xxhash64("id", F.lit("v")), 1000) / 10.0).alias("px")))

    def row(name, fn, denom):
        rec = {"load_before": round(os.getloadavg()[0], 2)}
        for attempt in ("cold_sec", "wall_sec"):
            t0 = time.time()
            rec["rows"] = fn()
            rec[attempt] = round(time.time() - t0, 3)
        rec["load_after"] = round(os.getloadavg()[0], 2)
        rec["left_rows_per_sec"] = round(denom / rec["wall_sec"], 1)
        out[name] = rec

    # nearest at depth (r8 verdict task 8): 2x the frame work of
    # backward, measured not assumed
    row("asof_join_2m_x_500k_nearest",
        lambda: joins.asof_join(jleft, jright, "k",
                                payload_cols=["rid", "px"],
                                tiebreak_col="rid",
                                direction="nearest")
        .where(F.col("rid_matched").isNotNull()).count(), n_left)

    # pathological: EVERY row on one key — the unsplittable-window
    # wall (far beyond the 10%-hot deep row bench.py --deep carries)
    pleft = mat(jleft.withColumn("k", F.lit(0)))
    pright = mat(jright.withColumn("k", F.lit(0)))
    row("asof_2m_singlekey_unsplit",
        lambda: joins.asof_join(pleft, pright, "k",
                                payload_cols=["rid", "px"],
                                tiebreak_col="rid")
        .where(F.col("rid_matched").isNotNull()).count(), n_left)
    for b in (32,):
        row(f"asof_2m_singlekey_skew_buckets_{b}",
            lambda: joins.asof_join(pleft, pright, "k",
                                    payload_cols=["rid", "px"],
                                    tiebreak_col="rid", skew_buckets=b)
            .where(F.col("rid_matched").isNotNull()).count(), n_left)
    # equality of the two paths at this scale (counts already equal;
    # full row check on a 1% sample via hash)
    a = joins.asof_join(pleft, pright, "k", payload_cols=["rid", "px"],
                        tiebreak_col="rid")
    b_ = joins.asof_join(pleft, pright, "k", payload_cols=["rid", "px"],
                         tiebreak_col="rid", skew_buckets=32)

    def h(df):
        # DECIMAL sum: 2M 64-bit hashes overflow a long under ANSI
        return df.select(F.sum(F.xxhash64("lid", "rid_matched",
                                          "px_matched")
                               .cast("decimal(38,0)"))).collect()[0][0]

    out["singlekey_rowhash_equal"] = bool(h(a) == h(b_))
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
