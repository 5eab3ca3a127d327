"""Lexicon artifact round-trip + profile mechanism tests."""

import json
import os

from lexmapr_spark import lexicon_io
from lexmapr_spark.lexicon import default_lexicon
from lexmapr_spark.matcher import process_sample
from tests.golden_harness import corpus_precision_recall


def test_artifact_roundtrip_behavior_identical(tmp_path):
    lex = default_lexicon()
    path = str(tmp_path / "lexicon.json")
    lexicon_io.save_lexicon(lex, path)
    loaded = lexicon_io.load_lexicon(path)

    for text in ["Chicken Breast", "enterica Salmonella", "csf f",
                 "proximal epiphysis of manual digit 1"]:
        a = process_sample("s", text, lex)
        b = process_sample("s", text, loaded)
        assert a == b, text


def test_artifact_passes_golden_corpus(tmp_path):
    path = str(tmp_path / "lexicon.json")
    lexicon_io.save_lexicon(default_lexicon(), path)
    loaded = lexicon_io.load_lexicon(path)
    precision, recall, diffs = corpus_precision_recall(lex=loaded)
    assert precision == 1.0 and recall == 1.0 and diffs == {}


def test_profile_mechanism(tmp_path):
    profile_dir = str(tmp_path)
    os.makedirs(os.path.join(profile_dir, "myprofile"))
    lexicon_io.save_lexicon(
        default_lexicon(),
        os.path.join(profile_dir, "myprofile", "myprofile_table.json"))
    with open(os.path.join(profile_dir, "myprofile",
                           "myprofile_args.json"), "w") as f:
        json.dump({"bucket": True, "full": True}, f)
    lex, args = lexicon_io.get_profile_lexicon(profile_dir, "myprofile")
    assert args == {"bucket": True, "full": True}
    r = process_sample("s", "gastric vein", lex)
    assert r.macro_status == "Full Term Match"
