"""Differential test: our classification engine vs the REFERENCE'S OWN
rule code (`/root/reference/lexmapr/pipeline_classification.py`),
imported unmodified with its third-party deps injected from our
golden-pinned vendored implementations (see ref_classification_loader).

This is the validation VERDICT r01 asked for: the reference ships no
golden that exercises classification on non-empty input, so the
~120-rule sequential refine block was previously validated by
transcription alone. Here both engines run over the realistic corpora
(7,393 samples) and every tier of the output dict must agree:

- ifsac_final_labels as a set, and as an ordered list whenever the
  order is deterministic (the reference picks among multiple priority
  labels with ``set.pop()``, which is PYTHONHASHSEED-dependent —
  pipeline_classification.py:31 — so order is only compared when at
  most one priority label is present);
- ifsac_final_buckets, lexmapr_final_buckets and the full
  lexmapr_hierarchy_buckets structures, element-for-element.

Inputs to classification are the RAW matched components (lowercase
ids) — display standardization happens at output time in the reference
(pipeline.py:270), after classify_sample has already run.

The full three-corpus sweep (~5 min) runs out-of-band; this test keeps
CI fast with all of zheminSamples (the classification-richest corpus)
plus deterministic 1-in-4 slices of the other two (~3,350 rows).
"""

import pytest

from lexmapr_spark.classification import PRIORITY_CATEGORIES
from lexmapr_spark.lexicon import default_lexicon
from lexmapr_spark.matcher import process_sample
from lexmapr_spark.textops import punctuation_treatment
from tests.golden_harness import read_samples
from tests.ref_classification_loader import (
    load_reference_modules,
    reference_lookup_tables,
)

CORPORA_SLICES = [
    ("zheminSamples.csv", 1),
    ("genomeTrackerMaster.csv", 4),
    ("enteroForFreq.csv", 4),
]


@pytest.fixture(scope="module")
def ref_side():
    ref_cls, _ = load_reference_modules()
    lex = default_lexicon()
    lt, clt = reference_lookup_tables(lex)
    return ref_cls, lex, lt, clt


@pytest.mark.parametrize("corpus,step", CORPORA_SLICES)
def test_classification_matches_reference_engine(ref_side, corpus, step):
    ref_cls, lex, lt, clt = ref_side
    divergences = []
    for sid, desc in list(read_samples(corpus))[::step]:
        mine = process_sample(sid, desc, lex, classify=True)
        raw_components = [f"{label}:{term_id.lower()}"
                          for label, term_id in mine.matched_pairs]
        sample = punctuation_treatment(desc.strip().lower())
        theirs = ref_cls.classify_sample(sample, raw_components, lt, clt)

        ml, tl = mine.third_party_classification, theirs["ifsac_final_labels"]
        ok = set(ml) == set(tl)
        if ok and len(set(ml) & PRIORITY_CATEGORIES) <= 1:
            ok = ml == tl
        if ok:
            ok = (mine.third_party_bucket == theirs["ifsac_final_buckets"]
                  and mine.lexmapr_bucket == theirs["lexmapr_final_buckets"]
                  and mine.lexmapr_classification
                  == theirs["lexmapr_hierarchy_buckets"])
        if not ok:
            divergences.append((sid, sample, ml, tl))
    assert not divergences, (
        f"{len(divergences)} divergences vs reference classification "
        f"in {corpus}; first 5: {divergences[:5]}")


def test_refine_rules_differential_on_synthetic_label_sets(ref_side):
    """Hammer refine_ifsac_final_labels directly with adversarial label
    combinations that the corpora may never produce — every category
    group boundary, the multi-ingredient threshold, the animal-feed
    clear, the len()-sensitive endgame rules — so each of the ~120
    reference rules has a firing chance."""
    import itertools

    from lexmapr_spark.classification import refine_ifsac_final_labels

    ref_cls, lex, lt, clt = ref_side
    labels_pool = [
        "animal feed", "clinical/research", "veterinary clinical/research",
        "environmental", "environmental-farm", "environmental-water",
        "environmental-factory/production facility",
        "environmental-abattoir", "environmental-animal housing",
        "human", "animal", "other animal", "cow", "beef", "pig", "pork",
        "meat", "other meat", "fish", "shellfish", "mollusks", "eggs",
        "fish eggs", "poultry", "other poultry", "chicken", "dairy",
        "aquatic animals", "engineered seafood", "companion animal",
        "food", "plant", "vegetables", "fruits", "seeded vegetables",
        "root/underground", "nut", "seeds", "oils", "other (sweetener)",
        "multi-ingredient", "food supplement", "herbs", "sprouts",
    ]
    samples = ["", "animal", "swab sub sample", "scat", "raw cow meat",
               "pork liver", "chicken at farm", "fish fillet", "in oil",
               "sugar free gum", "milk", "by product", "by catch",
               "shell on shrimp", "environmental swab", "leaf",
               "finished product", "tissue sample", "ground beef plain"]
    # empty refinement table: the table scan is exercised by the
    # corpora test above; here we isolate the sequential rule block
    # (the reference's per-call re-tokenization of the full table
    # would make 30k+ cases take minutes)
    rng_pairs = itertools.islice(
        itertools.product(samples, itertools.combinations(labels_pool, 3)),
        0, None, 7)  # deterministic 1-in-7 slice, ~33k cases
    checked = 0
    for sample, combo in rng_pairs:
        labels = list(combo)
        mine = refine_ifsac_final_labels(sample, labels, {})
        theirs = ref_cls.refine_ifsac_final_labels(sample, set(labels), {})
        assert set(mine) == set(theirs), (
            f"refine divergence for sample={sample!r} labels={labels}: "
            f"mine={sorted(mine)} ref={sorted(set(theirs))}")
        checked += 1
    assert checked > 10000


def test_classification_tables_equal_reference_cache():
    """Our compiled classification tables must equal the reference's
    own committed classification_lookup_table.json — so the
    differential above runs on authentic resources, and no
    transcription drift can hide in the table compile either."""
    import json

    ref = json.load(open(
        "/root/reference/lexmapr/resources/classification_lookup_table.json"))
    lex = default_lexicon()
    assert lex.buckets_ifsactop == ref["buckets_ifsactop"]
    assert lex.buckets_lexmapr == ref["buckets_lexmapr"]
    assert lex.ifsac_labels == ref["ifsac_labels"]
    assert lex.ifsac_refinement == ref["ifsac_refinement"]
    assert lex.ifsac_default == ref["ifsac_default"]
