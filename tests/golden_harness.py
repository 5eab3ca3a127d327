"""Shared harness: run the matcher over the reference golden corpus.

Replicates the reference's end-to-end test matrix
(``lexmapr/tests/test_pipeline.py:345-470``): every fixture runs with
``--full`` (the default in that suite); bucket cases only cover empty
inputs, so they pin header shapes, which our engine emits as columns.

Also computes the triple-level precision/recall the north rule grades
(P/R >= 0.95 vs the reference mapping corpus).
"""

from __future__ import annotations

import csv
import os

from lexmapr_spark.lexicon import default_lexicon
from lexmapr_spark.matcher import format_output_row, process_sample

HERE = os.path.dirname(__file__)
INPUT_DIR = os.path.join(HERE, "golden", "input")
EXPECTED_DIR = os.path.join(HERE, "golden", "expected")

# expected-output name -> input fixture (mirrors test_pipeline.py:345-428;
# non-empty cases all use full=True, bucket cases are empty-input only)
GOLDEN_FULL_CASES = {
    "empty": "empty.csv",
    "small_simple": "small_simple.csv",
    "test_punctuation": "test_punctuation.csv",
    "test_extra_inner_spaces": "test_extra_inner_spaces.csv",
    "test_tokenization": "test_tokenization.csv",
    "test_preprocessing": "test_preprocessing.csv",
    "test_pluralization": "test_pluralization.csv",
    "test_spelling_corrections": "test_spelling_corrections.csv",
    "test_abbreviations": "test_abbreviations.csv",
    "test_non_english_words": "test_non_english_words.csv",
    "test_stop_word_handling": "test_stop_word_handling.csv",
    "test_candidate_phrase": "test_candidate_phrase.csv",
    "test_sample_id_only": "test_sample_id_only.csv",
    "test_full_term_dir_match": "test_full_term_dir_match.csv",
    "test_full_term_coc_match": "test_full_term_coc_match.csv",
    "test_full_term_perm_match": "test_full_term_perm_match.csv",
    "test_full_term_sfx_match": "test_full_term_sfx_match.csv",
    "test_full_term_wiki_match": "test_full_term_wiki_match.csv",
    "small_simple_with_tsv_input": "small_simple_with_tsv_input.tsv",
}


def read_samples(input_name: str):
    """(sample_id, space-joined desc) rows per pipeline.py:98-112."""
    path = os.path.join(INPUT_DIR, input_name)
    delim = "\t" if input_name.endswith(".tsv") else ","
    with open(path, newline="") as fr:
        reader = csv.reader(fr, delimiter=delim)
        next(reader)
        for row in reader:
            yield row[0].strip(), " ".join(row[1:]).strip()


def run_case(input_name: str, lex=None):
    """Rows of rendered output cells (full mode) for one fixture."""
    lex = lex or default_lexicon()
    return [
        format_output_row(process_sample(sid, desc, lex), full=True)
        for sid, desc in read_samples(input_name)
    ]


def expected_rows(case_name: str):
    path = os.path.join(EXPECTED_DIR, case_name + ".tsv")
    with open(path, newline="") as f:
        lines = f.read().split("\n")
    header = lines[0].split("\t")
    rows = [line.split("\t") for line in lines[1:] if line]
    return header, rows


def triples_from_rows(rows, id_idx=0, comp_idx=4, macro_idx=5):
    """(sample_id, pred, obj) triples from wide rows — the KG view."""
    import ast

    triples = set()
    for row in rows:
        comps = ast.literal_eval(row[comp_idx]) if row[comp_idx] else []
        pred = {"Full Term Match": "fullTermMatch",
                "Component Match": "componentMatch"}.get(row[macro_idx])
        for comp in comps:
            label, _, term_id = comp.rpartition(":")
            obj = "http://purl.obolibrary.org/obo/" + term_id
            triples.add((row[id_idx] + "#" + label, pred, obj))
    return triples


def corpus_precision_recall(lex=None, verbose=False):
    """Triple P/R over the whole golden corpus + per-case cell diffs."""
    lex = lex or default_lexicon()
    got_triples: set = set()
    want_triples: set = set()
    cell_diffs = {}
    for case, input_name in GOLDEN_FULL_CASES.items():
        got = run_case(input_name, lex)
        _, want = expected_rows(case)
        got_triples |= triples_from_rows(got)
        want_triples |= triples_from_rows(want)
        diffs = []
        for i, (g, w) in enumerate(zip(got, want)):
            for j, (gc, wc) in enumerate(zip(g, w)):
                if gc != wc:
                    diffs.append((i, j, gc, wc))
        if len(got) != len(want):
            diffs.append(("rowcount", len(got), len(want), ""))
        if diffs:
            cell_diffs[case] = diffs
    tp = len(got_triples & want_triples)
    precision = tp / len(got_triples) if got_triples else 1.0
    recall = tp / len(want_triples) if want_triples else 1.0
    if verbose:
        print(f"triples: got={len(got_triples)} want={len(want_triples)} tp={tp}")
        print(f"precision={precision:.4f} recall={recall:.4f}")
        for case, diffs in cell_diffs.items():
            print(f"-- {case}: {len(diffs)} cell diffs")
            for d in diffs[:6]:
                print("   ", d)
    return precision, recall, cell_diffs


if __name__ == "__main__":
    corpus_precision_recall(verbose=True)
