#!/usr/bin/env python
"""Benchmark harness: headline KG-construction throughput + per-query
timings at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "kg_pipeline_wall_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "triples_per_sec": ..., "text_bytes_per_sec": ..., ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    import __spark_entry__ as entrymod
    from lexmapr_spark import engine
    from pyspark.sql import functions as F
    from lexmapr_spark.pages import synth_pages

    spark = engine.build_spark(cpus=cpus, app="lexmapr_bench",
                               shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    lex_bc = engine.broadcast_lexicon(spark)

    # ---- warmup: start python workers, ship+unpickle the lexicon
    # broadcast, JIT the noop writer — one-time per-executor costs that
    # amortize to zero at scale and would otherwise pollute timings
    warm = synth_pages(spark, 2000)
    engine.annotate(warm, lex_bc).write.format("noop").mode("overwrite").save()

    # ---- headline: synthetic Common-Crawl-style pages -> triples
    n_pages = max(int(400_000 * sf), 2000)
    pages = synth_pages(spark, n_pages).persist()
    n_rows = pages.count()          # materialize input before timing
    text_bytes = pages.agg(
        F.sum(F.octet_length("text"))).collect()[0][0]

    def run_pipeline():
        t0 = time.time()
        n = engine.triples(engine.annotate(pages, lex_bc)).count()
        return time.time() - t0, n

    cold_wall, n_triples = run_pipeline()   # populates per-worker memos
    wall, n_triples = run_pipeline()        # steady state (what scale sees)
    pages.unpersist()

    # realistic-size pages: 8 sentences each (~8x the text per page)
    long_pages = synth_pages(spark, max(n_pages // 4, 1000),
                             sentences_per_page=8).persist()
    n_long = long_pages.count()
    long_bytes = long_pages.agg(F.sum(F.octet_length("text"))).collect()[0][0]
    engine.triples(engine.annotate(long_pages, lex_bc)).count()  # warm
    t0 = time.time()
    long_triples = engine.triples(engine.annotate(long_pages, lex_bc)).count()
    long_wall = time.time() - t0
    long_pages.unpersist()

    # ---- per-query timings on the harness tables
    bench_queries = [
        "kg_match_histogram", "p1_p2_lower_punct", "p11_stopword_filter",
        "j1_broadcast_token_match", "agg_tpch_pricing",
        "join_orders_customer", "sort_topk_orders", "dedup_exact",
        "dedup_minhash_signatures", "dedup_simhash", "ann_cosine_topk",
        "ann_srp_bucketed_topk", "text_token_count", "text_quality",
        "text_langid", "text_fingerprint", "multimodal_features",
        "curation_pipeline", "multimodal_features_docs",
    ]
    qs = entrymod.queries()
    timings = {}
    timings_cold = {}
    for name in bench_queries:
        # first run pays one-time costs (scan cache, python worker
        # spin-up, codegen); record it separately and report the best
        # of two steady-state runs as the headline per-query number —
        # that's what a long-running cluster job sees, and best-of-2
        # damps this host's CPU-steal noise (oversubscribed vCPUs)
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings_cold[name] = round(time.time() - t0, 3)
        steady = []
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            steady.append(time.time() - t0)
        timings[name] = round(min(steady), 3)

    out = {
        "metric": "kg_pipeline_wall_sec",
        "value": round(wall, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "pages": n_rows,
        "triples": n_triples,
        "cold_run_sec": round(cold_wall, 3),
        "queries_cold": timings_cold,
        "triples_per_sec": round(n_triples / wall, 1),
        "pages_per_sec": round(n_rows / wall, 1),
        "text_bytes_per_sec": round(text_bytes / wall, 1),
        "longpages": {
            "pages": n_long, "wall_sec": round(long_wall, 3),
            "triples": long_triples,
            "pages_per_sec": round(n_long / long_wall, 1),
            "text_bytes_per_sec": round(long_bytes / long_wall, 1),
        },
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
