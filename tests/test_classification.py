"""Classification (--bucket tier) tests: hierarchy walk, level-min
bucket pick, multi-label decode, default classification, refinement
rules, deterministic ordering."""

import pytest

from lexmapr_spark import classification as cls
from lexmapr_spark.lexicon import default_lexicon
from lexmapr_spark.matcher import format_output_row, process_sample


def test_term_parent_hierarchies_multi_parent():
    parents = {"a": ["b", "c"], "b": ["d"], "c": []}
    hierarchies = cls.term_parent_hierarchies("a", parents)
    assert sorted(hierarchies) == [["a", "b", "d"], ["a", "c"]]


def test_term_parent_hierarchies_bfo_cycle_break():
    parents = {"a": ["bfo_0000001"], "bfo_0000001": ["a"]}
    assert cls.term_parent_hierarchies("a", parents) == [["a", "bfo_0000001"]]


def test_hierarchy_buckets_levels():
    buckets = {"meaty": "id_meat", "foody": "id_food"}
    h = ["id_x", "id_meat", "id_food"]
    out = cls.hierarchy_buckets(h, buckets)
    assert out == {2: {"id_meat": "meaty"}, 3: {"id_food": "foody"}}


def test_decode_multi_class_labels():
    assert sorted(cls.decode_multi_class_labels({"a;b", "c"})) == ["a", "b", "c"]


def test_default_classification_last_match_wins():
    table = {"chicken": "poultry-label", "chicken breast": "breast-label"}
    assert cls.default_classification("chicken breast meal", table) == \
        "breast-label"
    assert cls.default_classification("chicken soup", table) == "poultry-label"
    assert cls.default_classification("tofu", table) == ""


def test_customize_order_priority_first_deterministic():
    out = cls.customize_order_of_labels(
        ["beef", "environmental", "multi-ingredient", "apple"])
    # deterministic: sorted-first of the priority intersection leads
    assert out[0] == "environmental"
    assert out[1:] == ["apple", "beef", "multi-ingredient"]


def test_refine_meat_with_specific_category():
    out = cls.refine_ifsac_final_labels("pork chop", {"meat", "pork"}, {})
    assert "meat" not in out and "pork" in out


def test_refine_cow_plus_beef_keyword():
    out = cls.refine_ifsac_final_labels("raw cow sample", {"cow"}, {})
    assert out == ["beef"]


def test_refine_clinical_to_veterinary():
    out = set(cls.refine_ifsac_final_labels(
        "chicken tissue", {"clinical/research", "chicken"}, {}))
    assert out == {"veterinary clinical/research", "chicken"}


def test_refine_animal_feed_wins_all():
    out = cls.refine_ifsac_final_labels(
        "feed sample", {"animal feed", "beef", "grains"}, {})
    assert out == ["animal feed"]


def test_refine_multi_ingredient_assignment():
    out = set(cls.refine_ifsac_final_labels(
        "stew", {"beef", "grains", "herbs"}, {}))
    assert "multi-ingredient" in out


def test_refine_granular_over_general():
    out = set(cls.refine_ifsac_final_labels(
        "x", {"vegetables", "fungi", "fruits", "pome fruit"}, {}))
    assert "vegetables" not in out and "fruits" not in out
    assert {"fungi", "pome fruit"} <= out


def test_refinement_table_first_match():
    refinements = {"swab": "environmental", "water": "environmental-water"}
    out = set(cls.refine_ifsac_final_labels("water swab", set(), refinements))
    # dict order: 'swab' checked first; both tokens present -> first wins
    assert "environmental" in out


def test_classify_sample_end_to_end_with_hierarchy():
    from lexmapr_spark.lexicon import Lexicon
    lex = Lexicon()
    lex.parents = {"id_chicken": ["id_poultry"], "id_poultry": ["id_food"]}
    lex.buckets_lexmapr = {"poultry bucket": "id_poultry",
                           "food bucket": "id_food"}
    lex.buckets_ifsactop = {"poultry bucket": "id_poultry"}
    lex.ifsac_labels = {"id_poultry": "chicken;other poultry"}
    out = cls.classify_sample("chicken", ["chicken:id_chicken"], lex)
    # min level wins: poultry (level 2) over food (level 3)
    assert out["lexmapr_final_buckets"] == [{"id_poultry": "poultry bucket"}]
    assert set(out["ifsac_final_labels"]) <= {"chicken", "other poultry"}
    assert out["ifsac_final_buckets"] == [{"id_poultry": "poultry bucket"}]


def test_bucket_output_row_shape():
    lex = default_lexicon()
    r = process_sample("s1", "Chicken Breast", lex, classify=True)
    row_full = format_output_row(r, full=True, bucket=True)
    assert len(row_full) == 12
    row_basic = format_output_row(r, full=False, bucket=True)
    assert len(row_basic) == 7
    # predefined lexicon has an empty parents DAG -> classification
    # comes from the default/refinement path
    assert row_full[-1] == "['chicken']"


def test_bucket_headers_match_reference_empty_goldens():
    with open("tests/golden/expected/empty_buckets.tsv") as f:
        expected_full = f.read().strip().split("\t")
    base = ["Sample_Id", "Sample_Desc", "Processed_Sample",
            "Processed_Sample (With Scientific Name)", "Matched_Components",
            "Match_Status(Macro Level)", "Match_Status(Micro Level)",
            "Sample_Transformations", "LexMapr Classification (Full List)",
            "LexMapr Bucket", "Third Party Bucket",
            "Third Party Classification"]
    assert expected_full == base


def test_refinement_literal_prescreen_equivalence():
    """The r9 `lit in sample` gate in front of pattern.search must be
    outcome-neutral: literal labels still need the \\b regex to decide
    (substring inside a longer word must NOT match), and labels with
    regex metacharacters (the unescaped-label reference quirk) bypass
    the gate entirely."""
    refinements = {
        "chickpea": "legume",                      # literal label
        "environmental (forests)": "environmental",  # metachar label:
        # parens are a regex group, matches 'environmental forests'
    }
    # literal hit via regex word boundary
    out = cls.refine_ifsac_final_labels("a chickpea stew", set(),
                                        refinements)
    assert "legume" in out
    # substring without a word boundary: prescreen passes
    # ('chickpea' in 'xchickpeax') but the regex must still refuse
    out = cls.refine_ifsac_final_labels("xchickpeax", set(), refinements)
    assert "legume" not in out
    # metachar label keeps the unconditional regex scan: the raw label
    # string never occurs in the sample, only its group rendering
    out = cls.refine_ifsac_final_labels("environmental forests", set(),
                                        refinements)
    assert "environmental" in out
    # table rows carry the lit flag as built
    rows = cls._build_refinement_table(refinements)
    assert [lit for _, _, lit, _ in rows] == ["chickpea", None]
