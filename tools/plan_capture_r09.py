"""Supplementary r9 plan captures for operators whose final plan is
checkpoint-truncated (a bare ExistingRDD scan tells the reader
nothing): the pagerank per-iteration body, and the asof_join
skew_buckets pre-split shape.

Run: python tools/plan_capture_r09.py  (writes under plans/r09/)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r09")


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    import datetime as dt

    from pyspark.sql import functions as F

    from lexmapr_spark import engine
    from lexmapr_spark.ops import graph, joins

    os.makedirs(OUT, exist_ok=True)
    spark = engine.build_spark(cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF}/documents.parquet")

    # ---- pagerank: ONE iteration body, pre-checkpoint — the shape
    # every round runs (edges scan from checkpoint blocks + broadcast
    # rank/out-weight state + one small aggregate exchange). This is
    # the plan the truncated final explain in PLANS.md hides.
    edges = graph.token_adjacency_edges(docs) \
        .select("src", "dst", "weight").localCheckpoint(eager=False)
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct()).localCheckpoint(eager=False)
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    out_w = (edges.groupBy("src")
             .agg(F.sum("weight").alias("out_weight"))
             .localCheckpoint(eager=False))
    ranks = (nodes.crossJoin(F.broadcast(n_nodes))
             .select("node", (F.lit(1.0) / F.col("n_nodes"))
                     .alias("rank")))
    r = F.broadcast(ranks).withColumnRenamed("node", "_r_node")
    contrib = (edges.join(r, edges.src == r._r_node)
               .join(F.broadcast(out_w), "src")
               .groupBy("dst")
               .agg(F.sum((F.col("rank") * F.col("weight")
                           / F.col("out_weight"))
                          .cast("decimal(38,18)")).alias("contrib")))
    one_iter = (nodes.join(F.broadcast(contrib),
                           nodes.node == contrib.dst, "left")
                .crossJoin(F.broadcast(n_nodes))
                .select("node",
                        ((F.lit(1.0) - F.lit(0.85)) / F.col("n_nodes")
                         + F.lit(0.85)
                         * F.coalesce(F.col("contrib"), F.lit(0))
                         .cast("double")).alias("rank")))
    with open(os.path.join(OUT, "graph_pagerank_iteration_after.txt"),
              "w") as f:
        f.write("One pagerank iteration body (state='broadcast'), "
                "pre-checkpoint — the per-round plan:\n\n")
        f.write(formatted(one_iter))

    # ---- asof skew_buckets: window partitioned by (key, _sb) + the
    # carry join — the hot-key pre-split shape
    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=i), i) for i in range(50)],
        "k INT, ts TIMESTAMP, lid LONG")
    right = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=3 * j), j, float(j))
         for j in range(20)],
        "k INT, ts TIMESTAMP, rid LONG, px DOUBLE")
    split = joins.asof_join(left, right, "k", payload_cols=["rid", "px"],
                            tiebreak_col="rid", skew_buckets=8)
    with open(os.path.join(OUT, "asof_skew_buckets_demo.txt"),
              "w") as f:
        f.write("asof_join(skew_buckets=8) plan: the window partitions "
                "by (k, _sb) and the carry join restores cross-bucket "
                "fills:\n\n")
        f.write(formatted(split))
    spark.stop()
    print("wrote pagerank iteration + asof skew plans under plans/r09")


if __name__ == "__main__":
    main()
