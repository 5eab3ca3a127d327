"""Full-PIPELINE differential: the reference's own ``pipeline.run``
(imported unmodified, vendored deps injected, lookup table compiled by
the reference's own ``pipeline_resources`` from its CSVs) vs our
matcher — byte-identical full-mode TSV rows on realistic samples.

This complements the two existing correctness anchors:
  * golden corpus — byte parity against the reference's committed
    goldens, which pin a STALE resource cache (lexicon.py GOLDEN_*);
  * classification differential — the reference's rule code on our
    matched components.
Here BOTH engines compile the LIVE resource CSVs (our
``golden_parity=False`` compile vs the reference's
``add_predefined_resources_to_lookup_table``), so it proves the
CSV-compile semantics end-to-end: every tier of cleaning, the 4-tier
full-term cascade, permutation/suffix/synonym lookup, component
matching, ancestor suppression, and cell rendering.

The reference runs ~11 rows/s here (k!-permutation enumeration), so CI
uses deterministic slices (~50 rows/corpus ≈ 15 s); the out-of-band
sweep (4,400 rows, 0 divergences) is recorded in BENCH/BASELINE.md.

``bucket=False``: bucket-mode cells depend on the reference's
``set.pop()`` label order (PYTHONHASHSEED-dependent), which the
classification differential already covers set-wise.
"""

import csv
import itertools
import os
import types

import pytest

from tests.golden_harness import INPUT_DIR, read_samples
from tests.ref_classification_loader import load_reference_modules

# LEXMAPR_DIFF_FULL=1 sweeps EVERY row of every corpus (~5 min, the
# reference side is the bottleneck) — the out-of-band re-certification
# recorded in BENCH/BASELINE.md; default slices keep CI at ~15 s.
if os.environ.get("LEXMAPR_DIFF_FULL") == "1":
    SLICES = [("small_simple.csv", 1, None),
              ("zheminSamples.csv", 1, None),
              ("enteroForFreq.csv", 1, None),
              ("genomeTrackerMaster.csv", 1, None)]
else:
    SLICES = [("small_simple.csv", 1, None),
              ("zheminSamples.csv", 40, 50),
              ("enteroForFreq.csv", 68, 50),
              ("genomeTrackerMaster.csv", 40, 50)]


@pytest.fixture(scope="module")
def ref_pipeline():
    import importlib

    load_reference_modules()
    pres = importlib.import_module("lexmapr.pipeline_resources")
    lt = pres.add_predefined_resources_to_lookup_table(
        pres.create_lookup_table_skeleton())
    # get_predefined_resources would try to cache-write into the
    # read-only reference checkout; hand it the compiled table instead
    pres.get_predefined_resources = lambda: lt
    return importlib.import_module("lexmapr.pipeline")


@pytest.fixture(scope="module")
def live_lexicon():
    from lexmapr_spark.lexicon import compile_predefined
    return compile_predefined(golden_parity=False)


@pytest.mark.parametrize("corpus,step,limit", SLICES)
def test_full_pipeline_rows_byte_identical(ref_pipeline, live_lexicon,
                                           tmp_path, corpus, step, limit):
    from lexmapr_spark.matcher import format_output_row, process_sample

    rows = list(csv.reader(open(os.path.join(INPUT_DIR, corpus))))
    header, body = rows[0], rows[1:][::step][:limit]
    inp = tmp_path / "slice.csv"
    with open(inp, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(body)
    out = tmp_path / "ref.tsv"
    ref_pipeline.run(types.SimpleNamespace(
        input_file=str(inp), output=str(out), full=True, bucket=False,
        config=None, profile=None, no_cache=False))
    ref_lines = out.read_text().rstrip("\n").split("\n")[1:]

    samples = list(itertools.islice(
        read_samples(corpus), 0, None, step))[:limit]
    my_lines = ["\t".join(format_output_row(
        process_sample(sid, desc, live_lexicon), full=True))
        for sid, desc in samples]

    assert len(ref_lines) == len(my_lines)
    divergent = [(a, b) for a, b in zip(ref_lines, my_lines) if a != b]
    assert not divergent, (
        f"{len(divergent)}/{len(my_lines)} rows diverge in {corpus}; "
        f"first: REF={divergent[0][0][:200]!r} "
        f"MINE={divergent[0][1][:200]!r}")


ADVERSARIAL_SAMPLES = [
    ("adv_empty", ""),
    ("adv_ws", "   "),
    ("adv_unidigit", "١٢٣ ٤٥ chicken"),           # Arabic-Indic digits
    ("adv_emoji", "chicken \U0001F414 breast \U0001F357"),
    ("adv_possessive", "chicken's breast's skin's"),
    ("adv_quotes", "\"quoted\" 'single' chicken"),
    # 16 tokens: forces the reference's combinations->ngrams switch
    # (pipeline_helpers.py:266-273)
    ("adv_16tok", "frozen chicken breast with skin and bone plus salt "
                  "pepper oil garlic onion tomato basil oregano"),
    ("adv_dates", "12/05/2014 chicken sampled 2014-05-12"),
    ("adv_numbers", "3.14 chicken -42 breast 1e5 007"),
    ("adv_accents", "café naïve jalapeño chicken"),
    ("adv_upper", "CHICKEN BREAST FROZEN RAW"),
    ("adv_punct", "chicken,breast;frozen:raw(whole)"),
    ("adv_ligature", "œuf fœtus chicken"),
    ("adv_longtok", "x" * 300 + " chicken"),
    # >=15 repeated tokens: ngram path + remove_duplicate_tokens
    ("adv_repeat", ("chicken " * 15) + "breast"),
    ("adv_sciname",
     "salmonella enterica serovar typhimurium isolated from chicken"),
    ("adv_units", "0.5% sodium-chloride solution w/ 10mL water"),
    ("adv_unipunct", "chicken–breast—frozen…raw"),  # en/em dash, ellipsis
    ("adv_nbsp", "chicken breast"),            # non-breaking space
    ("adv_mixed", "Fr0zen CH1CKEN bre4st #42 @farm"),
]


def test_full_pipeline_adversarial_byte_identical(ref_pipeline,
                                                  live_lexicon, tmp_path):
    """Synthetic adversarial corpus through the reference's own
    pipeline.run vs our matcher: unicode digits/punctuation, emoji,
    possessive/quote edge cases, >=15-token samples (the
    combinations->ngrams switch), date- and number-like tokens,
    empty/whitespace descriptions, scientific names — all byte-exact
    in full mode."""
    from lexmapr_spark.matcher import format_output_row, process_sample

    inp = tmp_path / "adv.csv"
    with open(inp, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["SampleId", "Sample"])
        w.writerows(ADVERSARIAL_SAMPLES)
    out = tmp_path / "ref.tsv"
    ref_pipeline.run(types.SimpleNamespace(
        input_file=str(inp), output=str(out), full=True, bucket=False,
        config=None, profile=None, no_cache=False))
    ref_lines = out.read_text().rstrip("\n").split("\n")[1:]

    # read_samples semantics (pipeline.py:98-112): join + strip
    my_lines = ["\t".join(format_output_row(
        process_sample(sid, desc.strip(), live_lexicon), full=True))
        for sid, desc in ADVERSARIAL_SAMPLES]

    assert len(ref_lines) == len(my_lines)
    divergent = [(a, b) for a, b in zip(ref_lines, my_lines) if a != b]
    assert not divergent, (
        f"{len(divergent)}/{len(my_lines)} adversarial rows diverge; "
        f"first: REF={divergent[0][0][:200]!r} "
        f"MINE={divergent[0][1][:200]!r}")


def test_full_pipeline_bucket_mode_differential(ref_pipeline, live_lexicon,
                                                tmp_path):
    """--bucket --full through the reference's own pipeline.run: the
    six base + two full cells and the three bucket tiers must be
    byte-identical; the final label cell is compared set-wise because
    the reference orders it with ``set.pop()``
    (PYTHONHASHSEED-dependent)."""
    import ast

    from lexmapr_spark.matcher import format_output_row, process_sample

    corpus = "zheminSamples.csv"
    rows = list(csv.reader(open(os.path.join(INPUT_DIR, corpus))))
    header, body = rows[0], rows[1:][::50][:40]
    inp = tmp_path / "slice.csv"
    with open(inp, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(body)
    out = tmp_path / "ref.tsv"
    ref_pipeline.run(types.SimpleNamespace(
        input_file=str(inp), output=str(out), full=True, bucket=True,
        config=None, profile=None, no_cache=False))
    ref_lines = out.read_text().rstrip("\n").split("\n")[1:]

    samples = list(itertools.islice(read_samples(corpus), 0, None, 50))[:40]
    for ref_line, (sid, desc) in zip(ref_lines, samples):
        mine = format_output_row(
            process_sample(sid, desc, live_lexicon, classify=True),
            full=True, bucket=True)
        theirs = ref_line.split("\t")
        assert len(theirs) == len(mine) == 12
        assert theirs[:11] == mine[:11], (sid, theirs[:11], mine[:11])
        assert (set(ast.literal_eval(theirs[11]))
                == set(ast.literal_eval(mine[11]))), (sid, theirs[11],
                                                      mine[11])
