"""Ontology-compile tests, transcribed from the reference's
TestOntologyMapping (lexmapr/tests/test_pipeline.py:484-933), running
fully offline against the OWL fixtures in tests/ontologies/."""

import pytest

from lexmapr_spark.lexicon import Lexicon, default_lexicon
from lexmapr_spark.matcher import process_sample
from lexmapr_spark.ontology import (
    compile_config,
    fetch_ontology,
    local_test_ontology,
    merge_lexicons,
)

OBO = "http://purl.obolibrary.org/obo/"


def bfo(root=""):
    return (local_test_ontology("bfo.owl"), (OBO + root) if root else "")


def dup(root=""):
    return (local_test_ontology("bfo_duplicate_entities.owl"),
            (OBO + root) if root else "")


def test_fetch_no_root_has_36_specs():
    f = fetch_ontology(local_test_ontology("bfo.owl"))
    assert len(f["specifications"]) == 36


def test_fetch_with_root_has_3_specs():
    f = fetch_ontology(*bfo("BFO_0000015"))
    assert len(f["specifications"]) == 3


def test_resource_ids_material_entity():
    lex = compile_config([bfo("BFO_0000040")])
    assert lex.non_standard_resource_ids == {
        "bfo_0000024": "fiat object part",
        "bfo_0000027": "object aggregate",
        "bfo_0000030": "object",
    }


def test_resource_ids_multiple_ontologies():
    lex = compile_config([
        bfo("BFO_0000040"),
        (local_test_ontology("pizza.owl"),
         "http://www.co-ode.org/ontologies/pizza/pizza.owl#Spiciness"),
    ])
    assert lex.non_standard_resource_ids == {
        "bfo_0000024": "fiat object part",
        "bfo_0000027": "object aggregate",
        "bfo_0000030": "object",
        "pizza.owl_hot": "picante",
        "pizza.owl_medium": "media",
        "pizza.owl_mild": "naopicante",
    }


def test_resource_labels_material_entity():
    lex = compile_config([bfo("BFO_0000040")])
    assert lex.standard_resource_labels == {
        "fiat object part": "bfo_0000024",
        "object aggregate": "bfo_0000027",
        "object": "bfo_0000030",
    }


def test_synonyms_full_bfo():
    lex = compile_config([bfo()])
    assert lex.synonyms == {
        "temporal instant.": "zero dimensional temporal region",
        "lonely dimensional continuant fiat boundary.":
            "two dimensional continuant fiat boundary",
        "lonelier dimensional continuant fiat boundary.":
            "one dimensional continuant fiat boundary",
        "loneliest dimensional continuant fiat boundary.":
            "zero dimensional continuant fiat boundary",
        "loneliestest dimensional continuant fiat boundary.":
            "zero dimensional continuant fiat boundary",
    }


def test_varying_synonyms():
    lex = compile_config([
        (local_test_ontology("bfo_varying_synonyms.owl"), "")])
    assert lex.synonyms == {
        "lonely dimensional continuant fiat boundary.":
            "two dimensional continuant fiat boundary",
        "lonely dimensional continuant fiat boundary..":
            "two dimensional continuant fiat boundary",
        "lonelier dimensional continuant fiat boundary.":
            "one dimensional continuant fiat boundary",
        "loneliest dimensional continuant fiat boundary.":
            "zero dimensional continuant fiat boundary",
        "loneliestest dimensional continuant fiat boundary.":
            "zero dimensional continuant fiat boundary",
    }


def test_parents_one_level():
    lex = compile_config([bfo("BFO_0000015")])
    assert lex.parents == {
        "bfo_0000182": ["bfo_0000015"],
        "bfo_0000144": ["bfo_0000015"],
    }


def test_parents_two_roots():
    lex = compile_config([bfo("BFO_0000015"), bfo("BFO_0000040")])
    assert lex.parents == {
        "bfo_0000182": ["bfo_0000015"],
        "bfo_0000144": ["bfo_0000015"],
        "bfo_0000024": ["bfo_0000040"],
        "bfo_0000027": ["bfo_0000040"],
        "bfo_0000030": ["bfo_0000040"],
    }


def test_parents_multiple_levels():
    lex = compile_config([bfo("BFO_0000017")])
    assert lex.parents == {
        "bfo_0000034": ["bfo_0000016"],
        "bfo_0000016": ["bfo_0000017"],
        "bfo_0000023": ["bfo_0000017"],
    }


def test_multiple_parents_per_resource():
    lex = compile_config([dup("BFO_0000020")])
    assert {k: sorted(v) for k, v in lex.parents.items()} == {
        "bfo_0000019": ["bfo_0000020"],
        "bfo_0000017": ["bfo_0000020"],
        "bfo_0000145": ["bfo_0000017", "bfo_0000019"],
        "bfo_0000016": ["bfo_0000017"],
        "bfo_0000023": ["bfo_0000017"],
        "bfo_0000034": ["bfo_0000016"],
    }


def test_overlapping_parents_from_different_fetches():
    lex = compile_config([dup("BFO_0000015"), dup("BFO_0000040")])
    assert {k: sorted(v) for k, v in lex.parents.items()} == {
        "bfo_0000182": ["bfo_0000015"],
        "bfo_0000144": ["bfo_0000015"],
        "bfo_0000024": ["bfo_0000015", "bfo_0000040"],
        "bfo_0000027": ["bfo_0000015", "bfo_0000040"],
        "bfo_0000030": ["bfo_0000015", "bfo_0000040"],
    }


def test_duplicate_fetch_is_idempotent():
    lex = compile_config([bfo("BFO_0000015"), bfo("BFO_0000015")])
    assert lex.parents == {
        "bfo_0000182": ["bfo_0000015"],
        "bfo_0000144": ["bfo_0000015"],
    }


def test_label_permutation_index_material_entity():
    lex = compile_config([bfo("BFO_0000040")])
    # canonical-key form of the reference's 9 enumerated permutations
    assert lex.canon_perms == {
        "fiat object part": "bfo_0000024",
        "aggregate object": "bfo_0000027",
        "object": "bfo_0000030",
    }


# pizza_two.owl deliberately reuses the pizza.owl namespace (ids
# Hottwo/Mediumtwo/Mildtwo under the same #Spiciness root)
PIZZA_SP = "http://www.co-ode.org/ontologies/pizza/pizza.owl#Spiciness"
PIZZA2_SP = PIZZA_SP


def test_first_config_entry_wins_pizza_first():
    lex = compile_config([
        (local_test_ontology("pizza.owl"), PIZZA_SP),
        (local_test_ontology("pizza_two.owl"), PIZZA2_SP),
    ])
    assert lex.standard_resource_labels == {
        "picante": "pizza.owl_hot",
        "media": "pizza.owl_medium",
        "naopicante": "pizza.owl_mild",
    }


def test_first_config_entry_wins_pizza_two_first():
    lex = compile_config([
        (local_test_ontology("pizza_two.owl"), PIZZA2_SP),
        (local_test_ontology("pizza.owl"), PIZZA_SP),
    ])
    assert lex.standard_resource_labels == {
        "picante": "pizza.owl_hottwo",
        "media": "pizza.owl_mediumtwo",
        "naopicante": "pizza.owl_mildtwo",
    }


def test_merge_two_wins():
    one = Lexicon()
    one.abbreviations = {"a": "1", "b": "1"}
    two = Lexicon()
    two.abbreviations = {"b": "2", "c": "2"}
    merged = merge_lexicons(one, two)
    assert merged.abbreviations == {"a": "1", "b": "2", "c": "2"}


def test_large_owl_compiles_fast_and_clean():
    """Scale/robustness: the biggest fixture OWL (3,266 class elements,
    FoodOn subset) parses + compiles in well under a second with a
    consistent id/label/parents structure."""
    import time

    t0 = time.time()
    lex = compile_config([
        (local_test_ontology("under_curation.owl"), "")])
    assert time.time() - t0 < 5
    assert len(lex.standard_resource_labels) > 1500
    assert len(lex.parents) > 1500
    # every parents key must be a known id or barebones parent
    sample_ids = set(lex.non_standard_resource_ids)
    assert sum(1 for k in lex.parents if k in sample_ids) > 1400
    # ancestor closure exists and is acyclic-safe
    assert all(k not in v for k, v in lex.ancestors.items())


def test_merged_lexicon_matches_and_suppresses_ancestors():
    """End-to-end J7: with a fetched ontology merged onto the
    predefined lexicon, a sample matching both a term and its ancestor
    keeps only the descendant (pipeline.py:222-238)."""
    base = default_lexicon()
    merged = merge_lexicons(base, compile_config([bfo()]))
    # 'history' (bfo_0000182) is a child of 'process' (bfo_0000015)
    assert merged.ancestors["bfo_0000182"] >= {"bfo_0000015"}
    r = process_sample("s1", "history process", merged)
    ids = [c.rpartition(":")[2] for c in r.matched_components]
    assert "BFO_0000182" in ids
    assert "BFO_0000015" not in ids  # ancestor suppressed
    # sanity: without the component co-occurring, process still matches
    r2 = process_sample("s2", "zzz process", merged)
    assert any(i == "BFO_0000015" for i in
               [c.rpartition(":")[2] for c in r2.matched_components])


def test_owl_imports_resolution():
    """owl:imports resolves to ./imports/<basename> next to the main
    file, single-level, missing files warn-and-skip, per-class fields
    merge (ontohelper.py:315-358)."""
    import warnings

    from lexmapr_spark.ontology import parse_owl_classes

    path = local_test_ontology("with_imports.owl")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        classes = parse_owl_classes(path)
    iris = set(classes)
    assert OBO + "MAIN_0000002" in iris          # local class kept
    assert OBO + "IMP_0000001" in iris           # imported class merged
    assert OBO + "NESTED_0000001" not in iris    # single-level only
    # shared class: fields union across files
    shared = classes[OBO + "SHARED_0000001"]
    assert ("", "shared term") in shared["labels"]
    assert shared["synonyms"]["hasSynonym"] == ["shared synonym from import"]
    # imported synonym survives
    assert classes[OBO + "IMP_0000001"]["synonyms"]["hasExactSynonym"] == \
        ["brought in by import"]
    # missing import warned, not crashed
    assert any("missing.owl" in str(x.message) for x in w)
    # imports feed the normal compile: descendants of MAIN_0000001
    # include the imported child
    f = fetch_ontology(path, OBO + "MAIN_0000001")
    assert "IMP:0000001" in f["specifications"]
    assert "MAIN:0000002" in f["specifications"]


def test_parse_owl_no_imports_unchanged():
    from lexmapr_spark.ontology import parse_owl_classes

    a = parse_owl_classes(local_test_ontology("bfo.owl"))
    b = parse_owl_classes(local_test_ontology("bfo.owl"),
                          resolve_imports=False)
    assert a == b


def test_write_fetched_ontology_artifacts(tmp_path):
    """S9: JSON + TSV artifact writer matches the reference formats
    (ontohelper.py:520-555 — header fields incl. the 'ul_label' typo,
    '|'-joined lists, 4-space unsorted JSON)."""
    import json

    from lexmapr_spark.ontology import FETCH_TSV_FIELDS, write_fetched_ontology

    f = fetch_ontology(local_test_ontology("bfo.owl"))
    base = str(tmp_path / "bfo")
    write_fetched_ontology(f, base)

    back = json.load(open(base + ".json"))
    assert back == f  # round-trips
    assert open(base + ".json").read().startswith('{\n    "specifications"')

    lines = open(base + ".tsv").read().split("\n")
    assert lines[0] == "\t".join(FETCH_TSV_FIELDS)
    assert len(lines) == 1 + len(f["specifications"])
    by_id = {l.split("\t")[0]: l.split("\t") for l in lines[1:]}
    ent = f["specifications"]["BFO:0000015"]
    row = by_id["BFO:0000015"]
    assert row[FETCH_TSV_FIELDS.index("label")] == ent["label"]
    assert row[FETCH_TSV_FIELDS.index("parent_id")] == ent["parent_id"]


def test_write_fetched_ontology_synonym_columns_always_empty(tmp_path):
    """Byte-parity with the reference's TSV artifact: ontofetch.py:364
    stores synonyms under colon keys but do_output_tsv looks up the
    underscore header names, so the five synonym/IAO columns are ALWAYS
    empty in reference output — even when the spec carries synonyms."""
    from lexmapr_spark.ontology import FETCH_TSV_FIELDS, write_fetched_ontology

    f = fetch_ontology(local_test_ontology("bfo.owl"))
    ent = f["specifications"]["BFO:0000015"]
    ent["oboInOwl:hasSynonym"] = ["a synonym", "another"]
    ent["oboInOwl:hasExactSynonym"] = ["exact one"]
    ent["IAO:0000118"] = ["alt term"]
    base = str(tmp_path / "bfo_syn")
    write_fetched_ontology(f, base)
    lines = open(base + ".tsv").read().split("\n")
    row = next(l.split("\t") for l in lines[1:]
               if l.startswith("BFO:0000015\t"))
    for field in ("oboInOwl_hasSynonym", "oboInOwl_hasBroadSynonym",
                  "oboInOwl_hasExactSynonym", "oboInOwl_hasNarrowSynonym",
                  "IAO_0000118"):
        assert row[FETCH_TSV_FIELDS.index(field)] == ""


# ---- resolve_ontology_path: file:// unwrap + fail-fast on network URLs
# (the reference fetches URLs at runtime, ontofetch.py:191 /
# pipeline_resources.py:117-125; this build is offline by design and
# must say so clearly instead of FileNotFoundError-ing on a URL)

def test_resolve_ontology_path_plain_and_file_uri():
    from lexmapr_spark.ontology import resolve_ontology_path
    assert resolve_ontology_path("/tmp/x.owl") == "/tmp/x.owl"
    assert resolve_ontology_path("rel/x.owl") == "rel/x.owl"
    assert resolve_ontology_path("file:///tmp/x.owl") == "/tmp/x.owl"
    assert resolve_ontology_path("file://localhost/tmp/x.owl") == "/tmp/x.owl"
    assert resolve_ontology_path("FILE:///tmp/x.owl") == "/tmp/x.owl"
    # RFC 8089 host handling: localhost is case-insensitive; any other
    # host is a REMOTE file URL (as unfetchable offline as http) and a
    # bare scheme is malformed — both fail fast instead of resolving
    # to a mangled relative path like 'myhost/data/x.owl'
    assert resolve_ontology_path("file://LocalHost/tmp/x.owl") == "/tmp/x.owl"
    with pytest.raises(ValueError, match="remote file"):
        resolve_ontology_path("file://myhost/data/x.owl")
    with pytest.raises(ValueError, match="malformed"):
        resolve_ontology_path("file://")


@pytest.mark.parametrize("url", [
    "http://example.org/bfo.owl",
    "https://raw.githubusercontent.com/obo/bfo/master/bfo.owl",
    "ftp://example.org/bfo.owl",
])
def test_resolve_ontology_path_rejects_network_urls(url):
    from lexmapr_spark.ontology import resolve_ontology_path
    with pytest.raises(ValueError, match="network URL.*[Mm]irror"):
        resolve_ontology_path(url)


def test_fetch_ontology_accepts_file_uri():
    f = fetch_ontology("file://" + local_test_ontology("bfo.owl"))
    assert len(f["specifications"]) == 36


def test_fetch_ontology_rejects_url_with_mirror_hint():
    with pytest.raises(ValueError, match="offline"):
        fetch_ontology("https://example.org/bfo.owl")
