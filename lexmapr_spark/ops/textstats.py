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


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Heuristic document-quality features + combined score.

    Features mirror standard web-corpus filters: length, alphabetic
    ratio, stop-word ratio (fluency proxy), mean token length.
    """
    docs = fan_out(docs)
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
    return docs.select(
        F.col(id_col),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(mean_tok_len, 6).alias("mean_tok_len"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """Marker-stopword language heuristic: argmax of per-language hit
    counts over distinct tokens; deterministic tie-break by language
    code order; 'und' (undetermined) when nothing hits."""
    docs = fan_out(docs)
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
    return docs.select(F.col(id_col), expr.alias("lang_pred"))


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set (the classic 'fingerprint' dedup key)."""
    docs = fan_out(docs)
    return docs.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", F.array_sort(
            F.array_distinct(tokens_col(text_col))))).alias("fingerprint"),
    )
