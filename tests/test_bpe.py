"""Deterministic byte-level BPE tokenizer: training determinism,
lossless byte round-trip, Spark hook parity, and pack-boundary
behavior vs the whitespace default."""

import pytest

from lexmapr_spark import engine
from lexmapr_spark.ops import bpe


def test_train_is_deterministic_and_learns_common_merges():
    a = bpe.train_bpe([bpe.SEED_TEXT])
    b = bpe.train_bpe([bpe.SEED_TEXT])
    assert a == b == list(bpe.default_merges())
    assert len(a) == bpe.N_MERGES
    # the classic first English merges fall out of the seed
    assert ("t", "h") in a[:5]


def test_tie_break_is_lexicographic_not_hash_order():
    # "ab" and "cd" each appear twice; the smaller pair must win
    merges = bpe.train_bpe(["ab ab cd cd"], n_merges=1)
    assert merges == [("a", "b")]


@pytest.mark.parametrize("text", [
    "the quick brown fox",
    "",
    "   ",
    "héllo wörld — ünïcode…",
    "snake_case(code) != camelCase[0] // comment",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    "don't we'll they've it's",
    "tab\tnewline\nmixed  spaces",
])
def test_encode_round_trips_bytes_losslessly(text):
    """Byte-level BPE is lossless by construction: concatenating the
    tokens and inverting the byte->unicode table must reproduce the
    exact input bytes."""
    toks = bpe.bpe_encode(text)
    u2b = {v: k for k, v in bpe.bytes_to_unicode().items()}
    got = bytes(u2b[ch] for t in toks for ch in t)
    assert got == text.encode("utf-8")


def test_memo_does_not_change_results():
    text = "the table the table the scan " * 10
    memo: dict = {}
    assert (bpe.bpe_encode(text, _memo=memo)
            == bpe.bpe_encode(text))
    assert memo  # the memo was actually used


@pytest.fixture(scope="module")
def spark():
    s = engine.build_spark(cpus=4, app="bpe_tests", shuffle_partitions=8)
    yield s
    s.stop()


def test_spark_hook_matches_pure_python(spark):
    from lexmapr_spark.ops import textstats

    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "tables of values stream past in sorted order"),
            (3, ""), (4, None), (5, "héllo wörld 123 !!!")]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r.doc_id: r.n_tokens
           for r in textstats.token_count(
               docs, tokenizer=bpe.bpe_tokenizer()).collect()}
    want = {i: bpe.bpe_token_count(t or "") for i, t in rows}
    assert got == want


def test_pack_boundaries_follow_bpe_counts_not_whitespace(spark):
    from lexmapr_spark.ops import packing

    rows = [(i, ("internationalization " * 6).strip()) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    ws = packing.pack_sequences(docs, seq_len=64, n_buckets=4).collect()
    bp = packing.pack_sequences(docs, seq_len=64, n_buckets=4,
                                tokenizer=bpe.bpe_tokenizer()).collect()
    # whitespace sees 6 tokens/doc; BPE splits the long word into many
    per_doc_bpe = bpe.bpe_token_count(rows[0][1])
    assert per_doc_bpe > 6
    assert all(r.n_tokens == 6 for r in ws)
    assert all(r.n_tokens == per_doc_bpe for r in bp)
    # boundaries therefore move: BPE needs more packs for same corpus
    assert (max(r.pack_id for r in bp) > max(r.pack_id for r in ws))
    # exact global prefix-sum invariant holds under the injected
    # tokenizer: offsets = cumsum of counts in (bucket, hkey) order
    total = sum(r.n_tokens for r in bp)
    assert total == per_doc_bpe * 40


def test_perplexity_with_bpe_tokenizer(spark):
    """The LM-denominated op accepts the same injectable tokenizer:
    n_tokens becomes the BPE count and the self-built LM's vocabulary
    is the BPE token set, so the scoring unit matches pack/count."""
    from lexmapr_spark.ops import textstats

    rows = [(1, "the quick brown fox"), (2, "internationalization")]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r.doc_id: r for r in textstats.perplexity(
        docs, tokenizer=bpe.bpe_tokenizer()).collect()}
    for i, t in rows:
        assert out[i].n_tokens == bpe.bpe_token_count(t)
    vocab = {r.token for r in textstats.unigram_lm(
        docs, tokenizer=bpe.bpe_tokenizer()).collect()}
    assert vocab == set(bpe.bpe_encode(rows[0][1])) \
        | set(bpe.bpe_encode(rows[1][1]))
    # default path unchanged
    ws = {r.doc_id: r.n_tokens
          for r in textstats.perplexity(docs).collect()}
    assert ws == {1: 4, 2: 1}
