"""Deterministic byte-level BPE tokenizer for token-denominated ops.

``token_count`` / ``pack_sequences`` / ``build_packed_examples``
default to whitespace tokens; pack boundaries measured in "fake
tokens" do not transfer to a real model's context window. This module
ships a self-contained byte-level byte-pair-encoding tokenizer — the
published GPT-2 construction (Radford et al. 2019 §2.2; merge
algorithm Sennrich et al. 2016) re-implemented from the papers, with
a built-in deterministic merge table so no network, model download,
or third-party package is needed:

* the 256-entry byte->unicode table (printable stand-ins for raw
  bytes) follows the published byte-level BPE recipe;
* pre-tokenization uses a stdlib-``re`` ASCII approximation of the
  GPT-2 pattern (contraction suffixes, letter runs, digit runs,
  punctuation runs, whitespace — GPT-2's ``\\p{L}/\\p{N}`` classes
  need the third-party ``regex`` package, documented deviation);
* the default merge table is TRAINED at first use from a fixed seed
  text with the classic highest-count / lexicographic-tie-break rule,
  so every process (Spark executor, driver, oracle builder) derives
  the identical table from source alone.

Spark integration: :func:`bpe_tokenizer` returns the injectable
``text Column -> array<string> Column`` hook the token-denominated
ops accept. It is an Arrow-batched ``pandas_udf`` (the per-word merge
loop is genuinely iterative — no builtin expression form), with an
executor-local per-word memo: web corpora repeat words heavily, so
each distinct pre-token is merged once per worker.
"""

from __future__ import annotations

import functools
import re
from collections import Counter

import pandas as pd  # noqa: F401 — pandas_udf resolves the string
# annotations of the tokenizer hook against module globals

# Contraction suffixes, space-prefixed letter/digit/punctuation runs,
# then residual whitespace — ASCII approximation of the GPT-2 pattern.
PRETOKEN_RE = re.compile(
    r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"
    r"|\s+(?!\S)|\s+")

# Fixed seed corpus for the default merge table: common English
# function words + the web/analytics vocabulary the engine processes.
# Changing this text CHANGES TOKEN IDS everywhere — treat as frozen.
SEED_TEXT = (
    "the quick brown fox jumps over the lazy dog while the other dogs "
    "watch from the table and the rows of values stream past in order "
    "a query can scan filter join group and aggregate large tables of "
    "data with keys values rows columns and windows the fast path is "
    "a hash join over partitioned batches and the slow path is a sort "
    "merge join with spilled partitions every document in the corpus "
    "has tokens counted packed into sequences and deduplicated before "
    "training while streams of events arrive late and are watermarked "
    "this is a small deterministic seed for byte pair encoding merges "
    "common prefixes suffixes and endings like ing ed er est ly tion "
    "ation are learned first because they repeat the most frequently")

N_MERGES = 256


@functools.lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """Byte -> printable-unicode stand-in (published byte-level BPE
    table): printable ASCII/Latin-1 map to themselves, the rest to
    256+offset, so every byte sequence round-trips as a string."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def word_symbols(word: str) -> tuple:
    b2u = bytes_to_unicode()
    return tuple(b2u[b] for b in word.encode("utf-8"))


def train_bpe(texts, n_merges: int = N_MERGES) -> list:
    """Classic BPE training: repeatedly merge the most frequent
    adjacent symbol pair. Deterministic: ties break on the
    lexicographically smallest pair (no hash/dict-order dependence),
    so any process re-deriving the table gets identical merges."""
    freqs: Counter = Counter()
    for t in texts:
        for w in PRETOKEN_RE.findall(t):
            freqs[word_symbols(w)] += 1
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, f in freqs.items():
            for p in zip(sym, sym[1:]):
                pairs[p] += f
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        a, b = best
        ab = a + b
        new: Counter = Counter()
        for sym, f in freqs.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new[tuple(out)] += f
        freqs = new
    return merges


@functools.lru_cache(maxsize=1)
def default_merges() -> tuple:
    return tuple(train_bpe([SEED_TEXT]))


def merge_ranks(merges=None) -> dict:
    merges = merges if merges is not None else default_merges()
    return {pair: i for i, pair in enumerate(merges)}


def _encode_word(sym: tuple, ranks: dict) -> tuple:
    """Greedy lowest-rank merging of one pre-token (GPT-2 ``bpe``)."""
    word = list(sym)
    while len(word) > 1:
        pairs = set(zip(word, word[1:]))
        best = min(pairs, key=lambda p: ranks.get(p, 1 << 30))
        if best not in ranks:
            break
        a, b = best
        ab = a + b
        out = []
        i = 0
        while i < len(word):
            if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                out.append(ab)
                i += 2
            else:
                out.append(word[i])
                i += 1
        word = out
    return tuple(word)


def bpe_encode(text: str, ranks: dict | None = None,
               _memo: dict | None = None) -> list[str]:
    """Text -> BPE token strings (byte-unicode alphabet; a leading
    ``\\u0120``-style mapped space marks word starts, as in GPT-2)."""
    ranks = ranks if ranks is not None else merge_ranks()
    memo = _memo if _memo is not None else {}
    out: list[str] = []
    for w in PRETOKEN_RE.findall(text or ""):
        toks = memo.get(w)
        if toks is None:
            toks = memo[w] = _encode_word(word_symbols(w), ranks)
        out.extend(toks)
    return out


def bpe_token_count(text: str, ranks: dict | None = None,
                    _memo: dict | None = None) -> int:
    return len(bpe_encode(text, ranks, _memo))


def bpe_tokenizer(merges=None):
    """The injectable tokenizer hook: ``text Column -> array<string>
    Column`` of BPE tokens, Arrow-batched. Pass the result as
    ``tokenizer=`` to ``token_count`` / ``pack_sequences`` /
    ``build_packed_examples``. The merge table rides the closure
    (a few KB); each worker keeps a per-word memo for the batch
    stream, so repeated words merge once per executor."""
    merges = tuple(merges) if merges is not None else default_merges()

    def hook(col):
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<string>")
        def tok(texts: pd.Series) -> pd.Series:
            ranks = {pair: i for i, pair in enumerate(merges)}
            memo: dict = {}
            return pd.Series(
                [bpe_encode(t if t is not None else "", ranks, memo)
                 for t in texts])

        return tok(col)

    return hook
