"""Dump formatted physical plans for the headline pipeline and key
queries into PLANS.md, with the scale-relevant properties called out
(pushdown, pruning, broadcast join selection, shuffle count, codegen).

Run: python tools/explain_audit.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    import __spark_entry__ as em
    from pyspark.sql import functions as F
    from lexmapr_spark import engine
    from lexmapr_spark.pages import load_corpus, synth_pages

    spark = engine.build_spark(cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    lex_bc = engine.broadcast_lexicon(spark)

    sections = []

    pages_path = "/tmp/plans_pages_parquet"
    if not os.path.exists(pages_path):
        synth_pages(spark, 1000, corpus=load_corpus(limit=200)) \
            .write.mode("overwrite").parquet(pages_path)
    scan = spark.read.parquet(pages_path).where(F.col("lang") == "en")
    headline = engine.triples(engine.annotate(scan, lex_bc))
    sections.append((
        "Headline: pages scan -> annotate -> triples",
        "Expected properties: `PushedFilters` carries the lang "
        "predicate into the parquet scan; `ReadSchema` reads ONLY "
        "url/text (html, warc_ts pruned); exactly ONE Exchange "
        "(triple dedup) after the Arrow match stage; partial "
        "HashAggregate before it (map-side dedup).",
        formatted(headline)))

    qs = em.queries()
    audit = {
        "j1_broadcast_token_match":
            "Broadcast hash join of the exploded token stream against "
            "the 5-row dim (no shuffle of the big side), partial "
            "count aggregation.",
        "agg_tpch_pricing":
            "Filter pushed to scan, decimal sums with partial "
            "aggregation inside WholeStageCodegen.",
        "join_orders_customer":
            "Explicit broadcast(customer): BroadcastHashJoin, orders "
            "side never shuffles for the join.",
        "dedup_minhash_lsh":
            "Explode -> 8 min-aggregates with map-side partials and a "
            "SINGLE shuffle of the exploded shingles (no pre-distinct: "
            "min is duplicate-insensitive); banding self-join shuffles "
            "only the (id, band_key) pairs, AQE handles hot buckets.",
        "ann_cosine_topk":
            "Single-row broadcast cross join; TakeOrderedAndProject "
            "(top-k without a global sort).",
        "dedup_minhash_signatures":
            "Numeric (60-bit long) minima keep the whole aggregation "
            "in vectorized HashAggregate — min(string) would silently "
            "fall back to SortAggregate and spill per-partition sorted "
            "runs of the exploded shingle table under memory pressure.",
        "web_url_normalize":
            "STAGED projections (normalize_urls): each shared "
            "subexpression (fragment-stripped url, authority prefix, "
            "rest/path/query) is a non-cheap multi-referenced alias, "
            "so CollapseProject keeps the stages split and each "
            "regexp runs ONCE per row — the inline Column form would "
            "repeat them ~30x inside the un-codegen'd HOF projection "
            "(round-4 interpreted-CSE blowup class). NO Exchange, no "
            "UDF, no BatchEvalPython anywhere.",
        "curation_pipeline":
            "lang/quality/fingerprint as sibling expressions in ONE "
            "scan-side projection (no self-joins), gates applied "
            "BEFORE the fingerprint Exchange; fingerprint dedup is a "
            "PARTIAL min(struct(id, lang, quality)) keeper aggregate "
            "(round 5 — same hot-key-safe shape as dedup_global_"
            "lines; a mirrored boilerplate page collapses to one "
            "candidate per upstream partition before the shuffle, "
            "and the aggregate rows ARE the survivors). No Window "
            "node (plan-asserted).",
        "multimodal_features_docs":
            "Column-pruned scan feeding one Arrow stage; no shuffle "
            "anywhere (pure per-row decode fan-out).",
        "text_contamination":
            "Decontamination (round 3): probe-side distinct grams are "
            "a BroadcastExchange; the exploded training corpus streams "
            "through the BroadcastHashJoin (big side never shuffles "
            "for the join); distinct-count partials before the final "
            "per-doc aggregation.",
        "text_pii_redaction":
            "PII scrub (round 3): one narrow Project containing all "
            "regexp_count/regexp_replace expressions inside "
            "WholeStageCodegen — zero Exchange.",
        "ann_srp_bucketed_topk":
            "Multi-probe SRP (round 3): probe buckets computed from "
            "ONE driver-side matmul on the 1-row query vector, then a "
            "bucket IN-list filter (partition-prunable when the "
            "signature table is stored bucketed by prefix), 1-row "
            "broadcast cross join for the re-rank, "
            "TakeOrderedAndProject for top-k.",
        "text_repetition":
            "Repetition stats (round 3): one Arrow-vectorized stage "
            "over a narrow (id, text) projection — per-row Counter "
            "arithmetic, ZERO hash Exchange (the only repartition is "
            "the fan_out round-robin on a too-coarse input).",
        "text_perplexity":
            "Perplexity proxy (round 3): the self-built LM is "
            "vocabulary-sized and PERSISTED, pinning the op at two "
            "corpus scans (build + score) — every consumer (logprob "
            "side, OOV row, broadcast) reads InMemoryTableScan, and "
            "AQE's runtime exchange reuse dedupes the count/total "
            "branches inside the build; the scoring join broadcasts "
            "the LM (BroadcastHashJoin — the corpus side never "
            "shuffles for the join); per-doc DECIMAL sums with "
            "map-side partial aggregation.",
        "pack_sequences_2k":
            "Sequence packing (round 3): two-phase prefix sum — P "
            "parallel per-bucket window sorts (no single-partition "
            "global Window funnel), bucket totals collected as P "
            "bounded rows and broadcast back as offsets.",
        "dedup_global_lines":
            "C4 global line dedup (keeper rewrite, round 4): "
            "posexplode -> groupBy(line) with a PARTIAL min(struct("
            "doc_id, pos)) aggregate (each upstream partition "
            "collapses a boilerplate hot line to one candidate row "
            "BEFORE the line-keyed Exchange — a row_number window "
            "here would funnel all 10^8 copies of a hot line into "
            "one task, and AQE cannot split a window partition) -> "
            "the aggregate output rows ARE the kept lines, so no "
            "join-back -> ONE positional regroup Exchange. "
            "min_chars-bypassed short lines union in below the line "
            "aggregate and never ride its shuffle. No Window node "
            "anywhere (plan-asserted).",
        "ann_quantized_topk":
            "int8 quantized cosine (round 3): quantize + score in "
            "whole-stage codegen over a narrow scan (4x fewer bytes "
            "at rest for the embedding table), 1-row BroadcastNested"
            "LoopJoin for the query vector, TakeOrderedAndProject "
            "top-k — no shuffle of the embedding side.",
        "web_host_filter":
            "URL blocklist gate (round 3, literal path): host regexp "
            "+ suffix build + arrays_overlap as ONE whole-stage-"
            "codegen projection — zero joins, zero hash Exchange.",
        "conf_scoring":
            "C7 confidence (round 3): the entire penalty fold, "
            "str(set)-membership tests, and score/level rendering are "
            "Catalyst array expressions in ONE projection — zero "
            "Exchange, zero Python.",
        "dedup_near_dup_components":
            "Cluster-consistent near-dup keeper (round 4): LSH "
            "band-bucket pairs -> pointer-doubling connected "
            "components (O(log diameter) join rounds, each "
            "localCheckpoint'ed — the plan below shows only the "
            "final round's joins over the checkpointed labels) -> "
            "left-anti drop of non-representative cluster members; "
            "the drop set is ids only, broadcast by AQE when small.",
        "ann_srp_batch_topk":
            "Batch ANN serving (round 4): ONE corpus scan regardless "
            "of batch size — signature projection in codegen, "
            "BroadcastHashJoin against the (query_id, bucket) probe "
            "pairs (fan-out per probing query), broadcast query "
            "vectors, one per-query window top-k. The window "
            "partitions by query_id (bounded keys, bounded rows per "
            "key = probed candidates only).",
        "ann_ivf_batch_topk":
            "Batch IVF serving (round 4): assignment Arrow stage -> "
            "BroadcastHashJoin against (query_id, ivf_list) probe "
            "pairs -> broadcast query vectors -> per-query window "
            "top-k; with a stored index the probe join becomes a "
            "partition-pruned read of the probed lists' union.",
        "sample_domain_cap":
            "Skew-safe stratified cap (round 5): TWO-PHASE windows — "
            "a local rank over (spark_partition_id, group) bounds "
            "each task's work by construction (a 10^9-page head "
            "domain never lands in one task), then the global "
            "hash-order window runs over at most n x P pre-capped "
            "survivors per group.",
        "dedup_exact_substring":
            "Chunked ExactSubstr dedup (round 5): non-overlapping "
            "gram chunks (explode = 1x corpus, not 50x), keeper = "
            "PARTIAL min(struct(doc, chunk)) GROUP BY gram (hot "
            "boilerplate passages collapse map-side), sub-gram tails "
            "union around the gram shuffle, one positional regroup. "
            "No Window node.",
        "dedup_incremental":
            "Cross-run dedup vs a stored MinHash index (round 5): "
            "exact screen = LEFT SEMI on md5 (16-byte keys only), "
            "near screen = band-key bucket join of signature "
            "projections (the index never rescans prior text), drop "
            "set is ids-only, final keep = LEFT ANTI on the id. No "
            "Window, nothing all-pairs.",
        "web_host_rollup":
            "Per-host dashboard (round 5): ONE projection (host "
            "regexp + integral per-row features in codegen) -> ONE "
            "groupBy(host) of map-side-combinable aggregates — a "
            "head host partial-aggregates before its exchange; "
            "ratios are single divisions of integral counts.",
        "ann_quantized_srp_topk":
            "Quantized SRP ANN (round 4): int8 codes scanned (4x "
            "narrower), dequantized-code signature fold + bucket "
            "filter + integer cosine all in whole-stage codegen; "
            "1-row broadcast query + TakeOrderedAndProject. No float "
            "vectors, no shuffle of the embedding side.",
        "emb_near_duplicates":
            "Banded embedding near-dup (round 6 — the last `weak` "
            "closed): Arrow-batched exact-fold SRP signatures (bit-"
            "identical to the JVM fold, vectorized across batch and "
            "plane axes) -> band posexplode of (id, band_key) ONLY "
            "(vectors never ride the explode) -> band-key equi-join "
            "whose key cardinality derives from the corpus count "
            "(derive_srp_bits: expected bucket population constant at "
            "any scale — candidates grow ~linearly, measured 4.65x at "
            "a 4x corpus vs 16x for the old fixed-256-bucket join) -> "
            "DISTINCT candidate ids -> vectors re-joined once for the "
            "Arrow exact-cosine verify.",
        "dedup_exact_substring_cdc":
            "Content-defined-chunking ExactSubstr (round 6): chunk "
            "starts from token-content hashes via pure JVM HOFs "
            "(filter/sequence/slice — no Python, no token-level "
            "explode), so identical runs share boundaries at ANY "
            "offset; one chunk-level explode (1x corpus), keeper = "
            "PARTIAL min(struct(doc, chunk)) GROUP BY gram, "
            "sub-min_tokens chunks bypass the gram shuffle. No "
            "Window node (plan-asserted).",
        "dedup_incremental_merged":
            "Merged-index screen (round 6): merge_minhash_indexes is "
            "ONE map-side-combinable hash aggregate (min(struct) per "
            "distinct text_md5 — the compaction policy), then the "
            "standard index screens: LEFT SEMI md5 + band-bucket "
            "join + LEFT ANTI keep; equivalent to sequential "
            "per-batch screens by construction.",
        "pack_sequences_bpe":
            "BPE-denominated packing (round 6): ONE Arrow tokenizer "
            "stage (deterministic byte-level BPE, per-word memo) "
            "feeding the same two-phase prefix-sum pack layout — the "
            "injected tokenizer changes only the n_tokens projection, "
            "not the shuffle structure.",
        "sample_mixture_upsample":
            "Mixture upsampling (round 6): per-group floor(rate) + "
            "fractional hash-threshold copies via ONE bounded "
            "explode(sequence) in codegen — no join, no shuffle; the "
            "all-rates<=1 path stays a pure pushed filter.",
        "emb_semantic_dedup":
            "SemDeDup (round 6): k-means assignment in one Arrow "
            "stage (deterministic sample-trained centroids, bounded "
            "2000-row driver sample), candidate pairs ONLY within a "
            "cluster (cluster id is the join key — never corpus²), "
            "cosine-to-centroid ranking and keep-lowest keeper as "
            "aggregates, not windows.",
        "text_ngram_counts":
            "Corpus n-gram stats (round 6): two STACKED map-side-"
            "combined hash aggregates — per-(gram, doc) partials "
            "collapse a document's repeats before any shuffle, the "
            "per-gram rollup counts rows instead of expanding a "
            "countDistinct; HAVING runs after the rollup.",
        "graph_pagerank":
            "Token-adjacency PageRank (r9 shape): bigrams built from "
            "shifted-slice zips (constant token-array evaluations "
            "per row), rank/out-weight state BROADCAST into the edge "
            "scan each iteration (token graphs have vocabulary-"
            "bounded state; the big edge side is never re-shuffled), "
            "and the rank lineage truncated with a lazy "
            "localCheckpoint every round — which is why the final "
            "plan below is a bare ExistingRDD scan + top-k; the "
            "per-iteration plan (BroadcastHashJoins + one small "
            "DECIMAL-sum aggregate exchange) is captured in "
            "plans/r09/graph_pagerank_iteration_after.txt.",
        "sample_split_assign":
            "Hash-range split assignment (round 6): train/val/test "
            "labels from one md5-threshold CASE projection in "
            "codegen — zero shuffle, reproducible across engines, "
            "partition layouts, and runs.",
        "search_bm25_topk":
            "BM25 single-query serving (round 6): corpus statistics "
            "(N, total tokens, per-term df) as ONE 1-row aggregate "
            "broadcast back via crossJoin; per-doc tf/dl are array "
            "expressions in whole-stage codegen; the match filter "
            "(any tf > 0) sits BELOW the fan-out repartition so only "
            "matching docs shuffle; TakeOrderedAndProject for the "
            "k-row head. ZERO corpus-sized hash Exchange.",
        "search_bm25_indexed":
            "Stored-index BM25 serving (round 6): the postings scan "
            "shows PartitionFilters on term_bucket (the query terms' "
            "hash buckets — a partition-pruned read, ~n_terms/"
            "n_buckets of the index) plus a pushed term IN-filter; "
            "df is one tiny count over the same pruned rows; "
            "broadcast stats + map-side-combined per-doc DECIMAL sum "
            "+ TakeOrderedAndProject. The corpus itself is never "
            "rescanned.",
        "search_bm25_batch":
            "Batch BM25 (round 6): ONE corpus explode streams "
            "through a BroadcastHashJoin against the (query, term) "
            "table (the big side never shuffles for the join), "
            "groupBy(query, doc, term) tf partials collapse repeats "
            "map-side; per-term df derives from the SAME aggregate "
            "and ReuseExchange dedupes its exchange in the one final "
            "plan (ReusedExchange node) — 2 corpus scans total, not "
            "3, and measured FASTER than an explicit persist; "
            "per-(query, doc) DECIMAL sum, per-query "
            "row_number <= k (WindowGroupLimit rank pushdown keeps k "
            "rows per task before the query_id exchange).",
        "search_bm25_batch_indexed":
            "Batch x stored-index BM25 (round 6 — the production "
            "serving matrix corner): ONE partition-pruned postings "
            "read (PartitionFilters on the union of the batch's term "
            "buckets + pushed term IN-filter) covers every query; NO "
            "corpus-side explode at serving time (the stored postings "
            "ARE the tf table); broadcast (query, term) join + "
            "DECIMAL sums + WindowGroupLimit per-query top-k.",
        "events_asof_attribution":
            "As-of join (round 7): union-window form — purchases and "
            "clicks tagged and unioned, ONE hash exchange on user_id, "
            "one in-partition sort, last(ignorenulls) running window; "
            "NO join operator anywhere in the plan (a range self-join "
            "would blow up on hot users). Cost shape identical to any "
            "windowed aggregation, so skew is AQE's existing problem.",
        "events_asof_nearest":
            "Nearest as-of (round 8): the SAME single union + one "
            "hash exchange on user_id as the backward form, with TWO "
            "window frames over one sort (running last for the "
            "backward leg, following first for the forward leg) and a "
            "per-row winner by exact-integer-microsecond |delta| — "
            "still NO join operator; the only acceptable cost over "
            "backward is the second frame's evaluation, never a "
            "second exchange.",
        "events_range_join":
            "Range join (round 7): both sides mapped to 1800-s epoch "
            "buckets (the interval side explodes to the buckets it "
            "overlaps, a point lands in exactly ONE bucket, so no "
            "dedup pass); containment runs as a bucket equi-join that "
            "AQE sizes/skew-splits, NEVER BroadcastNestedLoopJoin — "
            "the plan must show a hash join on _bucket with the exact "
            "ts BETWEEN filter applied post-join, then map-side "
            "combined DECIMAL sums per interval.",
        "text_pmi_collocations":
            "PMI collocations (round 6): unigram and bigram counts "
            "as two map-side-combined aggregates; min_count prunes "
            "the bigram tail BEFORE both joins; the vocabulary-sized "
            "unigram side carries NO broadcast hint (AQE chooses — a "
            "forced broadcast would OOM the driver at 100 TB "
            "vocabulary); totals ride a broadcast 1-row crossJoin; "
            "TakeOrderedAndProject head.",
    }
    for name, note in audit.items():
        sections.append((f"Query: {name}", note,
                         formatted(qs[name](spark, SF))))

    # distributed wide sink (round 3): worker-side formatting only
    mentions = engine.annotate(scan, lex_bc, classify=True)
    sections.append((
        "Distributed wide sink: wide_lines(mentions, bucket=True)",
        "Expected properties: ZERO Exchange with order_by=None — scan "
        "-> annotate Arrow stage -> line-format Arrow stage -> sink; "
        "all cell rendering (str() of lists/dicts, classification "
        "tiers) happens in executors, nothing is collected.",
        formatted(engine.wide_lines(mentions, full=True, bucket=True))))

    with open("PLANS.md", "w") as f:
        f.write("# PLANS — physical-plan audit\n\n"
                "Generated by `tools/explain_audit.py` at sf0.01 on "
                "local[8]. Each section: what the plan MUST exhibit "
                "for 100 TB viability, then the actual "
                "`explain('formatted')` output.\n")
        for title, note, plan in sections:
            f.write(f"\n## {title}\n\n{note}\n\n```\n{plan}```\n")
    print("wrote PLANS.md", sum(len(p) for _, _, p in sections), "chars")
    spark.stop()


if __name__ == "__main__":
    main()
