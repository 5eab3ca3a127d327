"""Sequence packing: assign documents to fixed-token-budget packs for
pretraining batch construction.

The training-data step after curation: concatenate documents into
examples of ~``seq_len`` tokens each. Greedy bin packing is inherently
sequential, so the scalable formulation is the standard streaming one:
fix a deterministic document order,
take the running token total, and cut a pack boundary every
``seq_len`` tokens — ``pack_id = floor(cum_before / seq_len)``.

Distribution: a single global ``Window.orderBy`` over the corpus
would funnel everything through ONE partition. Instead this uses the
classic two-phase prefix sum:

1. bucket each doc by the hash of its id (the same 60-bit md5 prefix
   the sampling ops use, so the order is engine-reproducible and
   decorrelated from document length), cumsum WITHIN each bucket via a
   per-bucket window — P parallel sorts, no global funnel;
2. aggregate one row per bucket (its token total; map-side combined,
   so this second read of the narrow projection shuffles P rows),
   prefix-sum the P-row totals with a bounded window (P = bucket
   count, not corpus size), and broadcast the offsets back. Fully
   lazy — no driver collect, no persist — so both phases run inside
   ONE action, and both branches share the DataFrame's file index
   (pinned when the source was read), giving a consistent snapshot
   without caching the corpus.

``global cumsum = bucket offset + within-bucket cumsum`` — exact, and
identical to what a single-threaded pass over (bucket, order_key)
order would produce, which is how the DuckDB oracle checks it
value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lexmapr_spark.ops.dedup import tokens_col
from lexmapr_spark.ops.sampling import _hash60
from lexmapr_spark.ops.util import fan_out


def pack_sequences(docs: DataFrame, seq_len: int = 2048,
                   n_buckets: int | None = None, id_col: str = "doc_id",
                   text_col: str = "text",
                   carry_cols: tuple = (),
                   tokenizer=None,
                   snapshot: bool = False) -> DataFrame:
    """(id, n_tokens, pack_id, pack_offset) — ``pack_offset`` is where
    the document starts inside its pack's token stream. A document
    whose tokens straddle a boundary belongs to the pack where it
    STARTS (the usual packing-with-overflow convention; splitting the
    tail into the next example is a tokenizer-side concern).
    Zero-token documents are dropped. ``carry_cols`` ride the bucket
    shuffle verbatim and come back in the output (e.g. the text, for
    :func:`build_packed_examples`).

    ``tokenizer``: injectable token-stream hook (a callable taking
    the text Column and returning an ``array<string>`` Column —
    pure-JVM expression or Arrow-batched ``pandas_udf``), so pack
    boundaries can follow a REAL tokenizer's counts instead of the
    whitespace proxy; default = whitespace
    (:func:`lexmapr_spark.ops.dedup.tokens_col`), byte-identical to
    the historical behavior the DuckDB oracle checks.

    ``snapshot``: the two internal reads of the projection (window
    cumsum + bucket totals) execute inside one action and share a
    file-based source's pinned file listing, so the default is
    consistent WITHOUT caching. For sources with no pinned snapshot —
    a JDBC/catalog table receiving writes mid-action, or a
    NONDETERMINISTIC injected ``tokenizer`` — pass ``snapshot=True``
    to pin one persisted copy for both reads
    (released on the next snapshotted call or via
    ``ops.util.release_cache("pack_sequences")``).

    ``n_buckets`` defaults to ``spark.sql.shuffle.partitions``: the
    per-bucket window sort (which carries the full text when
    ``carry_cols`` does) then handles ``corpus / parallelism`` rows
    per task at ANY input size, instead of a fixed 1/32nd of the
    corpus — a hard-coded bucket count turns into a multi-TB
    single-task sort at 100 TB. Pack ids depend on the bucket count,
    so pin ``n_buckets`` explicitly when reproducing a layout across
    sessions with different parallelism.
    """
    from pyspark.sql.window import Window

    docs = fan_out(docs)
    if n_buckets is None:
        import logging

        from lexmapr_spark.engine import _session_parallelism
        n_buckets = max(1, _session_parallelism(docs.sparkSession))
        # the resolved default is session-config-dependent and pack
        # ids depend on it — surface it so two runs that silently used
        # different parallelism are diagnosable from the logs
        logging.getLogger("lexmapr_spark.packing").info(
            "pack_sequences: n_buckets defaulted to %d from session "
            "parallelism; pass n_buckets explicitly to reproduce this "
            "layout under a different config", n_buckets)
    base = (docs.select(
        F.col(id_col),
        F.size((tokenizer or tokens_col)(F.col(text_col)))
         .alias("n_tokens"),
        _hash60(F.col(id_col)).alias("hkey"),
        *[F.col(c) for c in carry_cols])
        .where(F.col("n_tokens") > 0)
        .withColumn("bucket",
                    F.pmod(F.col("hkey"), F.lit(n_buckets)).cast("int")))
    if snapshot:
        from lexmapr_spark.ops.util import scoped_persist
        base = scoped_persist(base, "pack_sequences")
    # Fully lazy two-phase prefix sum — no persist, no driver collect:
    # phase 1 is the per-bucket window cumsum; phase 2 re-reads the
    # narrow projection for the per-bucket totals (map-side combined,
    # so its shuffle carries P rows) and prefix-sums them with a
    # window over P rows (bounded: P = n_buckets, so the single-task
    # global window is a few hundred rows, not the corpus). Laziness
    # is what makes this snapshot-safe: both branches execute inside
    # ONE action and share the DataFrame's file index (pinned at read
    # time), instead of an eager driver collect whose offsets could
    # pair with a later, re-listed read of a mutated source. The cost
    # is a second columnar scan of the projection — at 100 TB that
    # beats caching the corpus text to executor storage.
    w = (Window.partitionBy("bucket")
         .orderBy("hkey", id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    local = base.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))

    totals = base.groupBy("bucket").agg(
        F.sum("n_tokens").alias("total"))
    off_w = (Window.orderBy("bucket")
             .rowsBetween(Window.unboundedPreceding, -1))
    off_df = totals.select(
        "bucket",
        F.coalesce(F.sum("total").over(off_w), F.lit(0))
         .cast("bigint").alias("bucket_offset"))

    packed = (local.join(F.broadcast(off_df), "bucket")
              .withColumn("gcum",
                          F.col("bucket_offset") + F.col("cum_before")))
    return packed.select(
        id_col, "n_tokens",
        F.floor(F.col("gcum") / seq_len).cast("bigint").alias("pack_id"),
        (F.col("gcum") % seq_len).alias("pack_offset"),
        *[F.col(c) for c in carry_cols])


def build_packed_examples(docs: DataFrame, seq_len: int = 2048,
                          n_buckets: int | None = None,
                          id_col: str = "doc_id",
                          text_col: str = "text",
                          doc_sep: str = " ",
                          tokenizer=None) -> DataFrame:
    """Materialized training examples: one row per pack with the
    member documents concatenated in pack order —
    ``(pack_id, text, n_docs, n_tokens)``.

    One extra shuffle on ``pack_id`` beyond :func:`pack_sequences`;
    within a pack the global order is recovered from ``pack_offset``
    (strictly increasing inside a pack, since consecutive documents'
    cumulative starts differ by their positive token counts).
    """
    packed = pack_sequences(docs, seq_len=seq_len, n_buckets=n_buckets,
                            id_col=id_col, text_col=text_col,
                            carry_cols=(text_col,), tokenizer=tokenizer)
    return (packed.groupBy("pack_id")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct(F.col("pack_offset"),
                                     F.col(text_col)))),
                        lambda s: s.getField(text_col)),
                    doc_sep).alias("text"),
                F.count("*").alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens")))
