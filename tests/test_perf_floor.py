"""Performance-regression guard: the matcher's single-thread rate on
the realistic corpus must stay well above the reference's architecture
class. Floor is ~5x below current measured (~8,700 rows/s) so load
noise can't flake it, but a lost fast path (plain-sentence tokenizer,
vocab pruning, suffix-base guard, token memo) trips it."""

import time

from lexmapr_spark.lexicon import default_lexicon
from lexmapr_spark.matcher import process_sample
from tests.golden_harness import read_samples


def test_matcher_single_thread_floor():
    lex = default_lexicon()
    rows = list(read_samples("enteroForFreq.csv"))
    for sid, desc in rows[:300]:
        process_sample(sid, desc, lex)  # warm token memo
    # best-of-3 so transient load on the shared 32-vCPU box can't
    # flake a genuine ~5x-headroom floor
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        for sid, desc in rows:
            process_sample(sid, desc, lex)
        best = max(best, len(rows) / (time.time() - t0))
        if best > 1500:
            break
    assert best > 1500, f"matcher regressed to {best:.0f} rows/s"
