"""Text-analysis operators: language-ID, quality scoring, token
counting, fingerprinting. All built-in-expression (JVM) — no Python in
the hot path — and reproducible in the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lexmapr_spark.ops.dedup import tokens_col
from lexmapr_spark.ops.util import fan_out

# Small marker-word lists for the n-gram/stopword language heuristic.
# Deterministic and oracle-reproducible (inlined in SQL as literals).
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
}

EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def token_count(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword proxy count
    (alnum runs + individual punctuation marks)."""
    docs = fan_out(docs)
    subword = F.size(F.filter(
        F.split(F.regexp_replace(
            F.col(text_col), r"([^\sA-Za-z0-9])", r" $1 "), r"\s+"),
        lambda x: x != F.lit("")))
    return docs.select(
        F.col(id_col),
        F.size(tokens_col(text_col)).alias("n_tokens"),
        subword.alias("n_subword_tokens"),
    )


def _quality_cols(text_col: str) -> dict:
    """Named quality-feature Column expressions (shared by
    ``quality_score`` and the single-projection ``curate``)."""
    toks = tokens_col(text_col)
    n_chars = F.length(text_col).cast("double")
    alpha_ratio = F.when(n_chars > 0,
                         F.length(F.regexp_replace(
                             F.col(text_col), r"[^A-Za-z]", "")) / n_chars
                         ).otherwise(F.lit(0.0))
    n_tokens = F.size(toks).cast("double")
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(toks),
        F.array(*[F.lit(w) for w in EN_STOPWORDS]))).cast("double")
    stop_ratio = F.when(n_tokens > 0, stop_hits / F.lit(float(len(EN_STOPWORDS)))
                        ).otherwise(F.lit(0.0))
    mean_tok_len = F.when(n_tokens > 0,
                          (F.length(F.concat_ws("", toks)) / n_tokens)
                          ).otherwise(F.lit(0.0))
    score = (F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.25
             + alpha_ratio * 0.35 + stop_ratio * 0.25
             + F.least(mean_tok_len / F.lit(8.0), F.lit(1.0)) * 0.15)
    return {"alpha_ratio": alpha_ratio, "stop_ratio": stop_ratio,
            "mean_tok_len": mean_tok_len, "quality": score}


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Heuristic document-quality features + combined score.

    Features mirror standard web-corpus filters: length, alphabetic
    ratio, stop-word ratio (fluency proxy), mean token length.
    """
    docs = fan_out(docs)
    qc = _quality_cols(text_col)
    return docs.select(
        F.col(id_col),
        *[F.round(qc[name], 6).alias(name)
          for name in ("alpha_ratio", "stop_ratio", "mean_tok_len",
                       "quality")],
    )


def _lang_pred_col(text_col: str):
    """Marker-stopword language heuristic as one Column expression:
    argmax of per-language hit counts over distinct tokens,
    deterministic tie-break by language code order, 'und' when nothing
    hits."""
    distinct_toks = F.array_distinct(tokens_col(text_col))
    hit_cols = {
        lang: F.size(F.array_intersect(
            distinct_toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*hit_cols.values())
    # fold in reverse code order so the alphabetically-first language
    # wins ties (the outermost WHEN is evaluated first)
    expr = F.lit("und")
    for lang in reversed(sorted(LANG_MARKERS)):
        expr = F.when((hit_cols[lang] > 0) & (hit_cols[lang] == best),
                      F.lit(lang)).otherwise(expr)
    return expr


def lang_id(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """Language-ID per document (see ``_lang_pred_col``)."""
    docs = fan_out(docs)
    return docs.select(F.col(id_col),
                       _lang_pred_col(text_col).alias("lang_pred"))


def _fingerprint_col(text_col: str):
    """Order-insensitive fingerprint: md5 over the sorted distinct
    token set (the classic 'fingerprint' dedup key)."""
    return F.md5(F.concat_ws(" ", F.array_sort(
        F.array_distinct(tokens_col(text_col)))))


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    docs = fan_out(docs)
    return docs.select(F.col(id_col),
                       _fingerprint_col(text_col).alias("fingerprint"))


def curate(docs: DataFrame, min_quality: float = 0.3, lang: str = "en",
           id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """End-to-end training-data curation in ONE projection + ONE
    shuffle: language filter -> quality gate -> fingerprint dedup
    (lowest id per fingerprint survives).

    Composition matters at 100 TB: joining the three per-op DataFrames
    back on doc_id would shuffle the corpus three times; here
    lang/quality/fingerprint are computed as sibling expressions in a
    single scan-side projection, the filters cut the data BEFORE the
    only shuffle (the fingerprint window), and everything stays in
    whole-stage codegen.
    """
    from pyspark.sql.window import Window

    docs = fan_out(docs)
    scored = docs.select(
        F.col(id_col),
        _lang_pred_col(text_col).alias("lang_pred"),
        F.round(_quality_cols(text_col)["quality"], 6).alias("quality"),
        _fingerprint_col(text_col).alias("fingerprint"),
    )
    passed = scored.where((F.col("lang_pred") == lang)
                          & (F.col("quality") >= min_quality))
    keeper = F.min(id_col).over(Window.partitionBy("fingerprint"))
    return (passed.withColumn("_keeper", keeper)
            .where(F.col("_keeper") == F.col(id_col))
            .select(id_col, "lang_pred", "quality", "fingerprint"))


def ngrams_col(text_col: str, n: int):
    """Word n-grams of the whitespace-token stream, space-joined —
    pure JVM expression (the dedup shingle builder generalized to n)."""
    toks = f"filter(split({text_col}, ' '), x -> x != '')"
    return F.expr(
        f"filter(transform(sequence(1, greatest(size({toks}) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice({toks}, i, {n}))), s -> s != '')")


def ngram_contamination(docs: DataFrame, probes: DataFrame, n: int = 8,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Benchmark-contamination detector: per document, how many
    distinct ``n``-grams it shares with the probe corpus (eval/test
    texts that must not leak into training data).

    The standard decontamination shape at scale: the probe side is
    small (a benchmark suite — thousands of docs), so its distinct
    n-gram set is BROADCAST; the training corpus explodes into
    (doc, n-gram) pairs that stream through the broadcast hash join
    with no shuffle of the big side, then a map-side-combinable
    distinct-count per doc. Returns (id, n_contaminated_ngrams) for
    docs with at least one hit; drop (anti-join) or review downstream.
    """
    probe_grams = (probes.select(
        F.explode(ngrams_col(text_col, n)).alias("gram")).distinct())
    doc_grams = fan_out(docs).select(
        F.col(id_col), F.explode(ngrams_col(text_col, n)).alias("gram"))
    return (doc_grams.join(F.broadcast(probe_grams), "gram")
            .groupBy(id_col)
            .agg(F.countDistinct("gram").alias("n_contaminated_ngrams")))


# PII patterns written to the RE2-compatible subset (no backrefs, no
# lookaround) so Spark's Java regex and DuckDB's RE2 match identically;
# replacement order is fixed (emails first, so phone can't eat an
# address's digits)
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b"),
    # literal space in the class (not \s: Java and RE2 disagree on
    # vertical tab); counts are per-kind on the RAW text, so an IPv4
    # also counts as phone-like — redaction order disambiguates
    ("phone", r"\+?\d[\d ().-]{7,}\d"),
]


def redact_pii(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Training-data PII scrub: replace emails, IPv4 addresses, and
    phone-like digit runs with ``<EMAIL>``/``<IPV4>``/``<PHONE>``
    tokens and count the redactions per kind.

    Pure JVM (regexp_replace / regexp_count inside whole-stage
    codegen) — the canonical shape for a 100 TB scrub pass: a narrow
    projection, no shuffle, patterns in the RE2 subset so the same
    pass is reproducible on any engine (DuckDB oracle value-checks
    every redacted byte and count).
    """
    docs = fan_out(docs)
    redacted = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS:
        # regexp_count takes the pattern as a literal column — no SQL
        # string-escaping round trip for the backslashes
        counts.append(F.regexp_count(F.col(text_col), F.lit(pat))
                      .alias(f"n_{name}"))
        redacted = F.regexp_replace(redacted, pat, f"<{name.upper()}>")
    return docs.select(F.col(id_col), redacted.alias("redacted_text"),
                       *counts)
