"""Unit tests for vendored scalar ops.

Cases transcribed from the reference's unit suite
(``lexmapr/tests/test_pipeline.py:22-283``) — including the quirks it
documents as spec.
"""

from lexmapr_spark import textops as t


def test_is_number():
    assert not t.is_number("")
    assert not t.is_number("foo")
    assert t.is_number("0")
    assert t.is_number("1")
    assert t.is_number("-1")
    assert t.is_number("0.5")
    assert t.is_number(".5")
    assert t.is_number("½")


def test_is_date():
    assert not t.is_date("")
    assert not t.is_date("foo")
    assert t.is_date("2018")
    assert t.is_date("2018-05-07")
    assert t.is_date("01/01/2018")
    assert t.is_date("may 7 2018")


def test_preprocess():
    assert t.preprocess("") == ""
    assert t.preprocess("foo") == "foo"
    assert t.preprocess("foo's") == "foo"
    assert t.preprocess("foo,") == "foo"
    assert t.preprocess("foo.") == "foo"
    # quirk preserved from reference tests: internal "'s" also removed
    assert t.preprocess("foo's bar") == "foo bar"
    # rightmost-strip quirks
    assert t.preprocess("foo, bar,") == "foo, bar"
    assert t.preprocess("foo. bar.") == "foo. bar"


def test_punctuation_treatment():
    assert t.punctuation_treatment("") == ""
    assert t.punctuation_treatment("foo") == "foo"
    assert t.punctuation_treatment("foo-bar") == "foo bar"
    assert t.punctuation_treatment("foo_bar") == "foo bar"
    assert t.punctuation_treatment("(foo)") == "foo"
    assert t.punctuation_treatment("foo;bar") == "foo bar"
    assert t.punctuation_treatment("foo/bar") == "foo bar"
    assert t.punctuation_treatment("foo:bar") == "foo bar"
    assert t.punctuation_treatment("foo%bar") == "foo bar"
    assert t.punctuation_treatment("foo,bar") == "foo bar"
    assert t.punctuation_treatment("a  -  b") == "a b"
    # periods are NOT scrubbed
    assert t.punctuation_treatment("foo.bar") == "foo.bar"


def test_tokenize_basic():
    assert t.word_tokenize("chicken breast") == ["chicken", "breast"]
    assert t.word_tokenize("anatomical fruit seed part's") == [
        "anatomical", "fruit", "seed", "part", "'s"]
    assert t.word_tokenize("dong kard. pak") == ["dong", "kard", ".", "pak"]
    assert t.word_tokenize("") == []


def test_singularize_inflection_0_3_1_quirks():
    # golden-pinned quirks (bugs preserved as spec)
    assert t.singularize("as") == "a"
    assert t.singularize("does") == "do"
    assert t.singularize("epiphysis") == "epiphysi"
    # normal cases
    assert t.singularize("potatoes") == "potato"
    assert t.singularize("carrots") == "carrot"
    assert t.singularize("noodles") == "noodle"
    assert t.singularize("species") == "species"
    # ([^f])ves$ -> \1fe overreach, preserved as spec
    assert t.singularize("leaves") == "leafe"


def test_detokenize_roundtrip():
    assert t.treebank_detokenize(["chicken", "breast"]) == "chicken breast"
    assert t.treebank_detokenize(["a", "{b", "c}", "d"]) == "a {b c} d"
