"""Offline OWL (RDF/XML) -> lexicon compile step.

Replaces the reference's networked rdflib/SPARQL fetch
(``lexmapr/ontofetch.py``, ``lexmapr/ontohelper.py``) with a stdlib
ElementTree parser producing the same ``specifications`` structure its
``add_fetched_ontology_to_lookup_table``
(``lexmapr/pipeline_resources.py:310-408``) consumes. Runs once on the
driver at lexicon-compile time — never at query time, never on
executors (the compiled lexicon ships via broadcast).

Semantics pinned by the reference's own ontology-mapping tests
(``lexmapr/tests/test_pipeline.py:484-933``), transcribed into
``tests/test_ontology.py``:
  - tree scope: proper descendants of the root (all parented classes
    when no root), plus barebones (id-only) entries for their parents
  - first parent (IRI-sorted) -> ``parent_id``, rest -> ``other_parents``
  - synonyms from oboInOwl has/hasExact/hasNarrow-Synonym
  - config lists fold in REVERSE so the FIRST config entry wins
    conflicts (dict-overwrite), per pipeline_resources.py:112-135
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

from lexmapr_spark.lexicon import (
    Lexicon,
    canonical_key,
    compute_ancestor_closure,
)
from lexmapr_spark.textops import punctuation_treatment, word_tokenize

RDF = "{http://www.w3.org/1999/02/22-rdf-syntax-ns#}"
RDFS = "{http://www.w3.org/2000/01/rdf-schema#}"
OWL = "{http://www.w3.org/2002/07/owl#}"
OBOINOWL = "{http://www.geneontology.org/formats/oboInOwl#}"
OBO = "{http://purl.obolibrary.org/obo/}"

# Only these feed the lookup table (pipeline_resources.py:350-372);
# ontofetch also gathers broad synonyms + IAO:0000118, but the lookup
# build ignores them.
SYNONYM_PROPS = ("hasSynonym", "hasNarrowSynonym", "hasExactSynonym")


def resolve_ontology_path(path: str) -> str:
    """Normalize a config ontology location to a local filesystem path.

    The reference fetches ontologies over the network at runtime
    (``ontofetch.py:191``; config-driven URL fetch
    ``pipeline_resources.py:117-125``) and its shipped test configs
    point at GitHub raw URLs. This build compiles ontologies OFFLINE
    (sandbox has no network), so:

      - ``file://`` URIs are unwrapped to their local path (including
        the ``file://localhost/...`` form, host case-insensitive), so
        a reference config that already mirrors files locally works
        unchanged; a non-localhost host or a missing path fails fast
        (remote file URLs are as unfetchable offline as http);
      - ``http(s)://`` / ``ftp://`` URLs fail fast with instructions to
        mirror the file locally, instead of surfacing as a confusing
        FileNotFoundError on a URL string;
      - plain paths pass through untouched.
    """
    lower = path.lower()
    if lower.startswith("file://"):
        rest = path[len("file://"):]
        # RFC 8089: file:///x and file://localhost/x (any case) mean
        # local /x; any other non-empty host is a REMOTE file URL we
        # cannot fetch, and an empty remainder is malformed — both
        # fail fast instead of resolving to a mangled relative path.
        if rest.lower().startswith("localhost/"):
            rest = rest[len("localhost"):]
        if not rest:
            raise ValueError(
                f"config ontology {path!r} is a malformed file:// URI "
                "(no path)")
        if not rest.startswith("/"):
            raise ValueError(
                f"config ontology {path!r} names a remote file:// host "
                "— this build compiles ontologies offline; mirror the "
                "file locally and use file:///abs/path or a plain path.")
        return rest
    if lower.startswith(("http://", "https://", "ftp://")):
        raise ValueError(
            f"config ontology {path!r} is a network URL — this build "
            "compiles ontologies offline (the reference's runtime fetch, "
            "ontofetch.py:191, is a documented non-goal). Mirror the OWL "
            "file locally (e.g. curl -o local.owl <url> where you have "
            "network) and point the config at the local path or a "
            "file:// URI.")
    return path


def short_id(iri: str) -> str:
    """IRI -> reference-style prefixed id, e.g.
    ``.../obo/BFO_0000015`` -> ``BFO:0000015``;
    ``.../pizza.owl#Hot`` -> ``pizza.owl:Hot``."""
    tail = iri.rsplit("/", 1)[-1]
    if "#" in tail:
        return tail.replace("#", ":", 1)
    return tail.replace("_", ":", 1)


def parse_owl_classes(path: str, resolve_imports: bool = True) -> dict:
    """IRI -> {label, parents: [IRIs], synonyms: {prop: [str]},
    deprecated, replaced_by} for every named owl:Class.

    ``owl:imports`` statements are resolved the way the reference does
    for file-path ontologies (``ontohelper.py:315-358``): each import
    IRI maps to ``<dirname(path)>/imports/<basename(iri)>``; existing
    files are parsed and merged into the same class map, missing files
    produce a warning and are skipped, and resolution is single-level
    (the reference queries the graph for imports exactly once, after
    parsing the main file)."""
    classes: dict[str, dict] = {}
    imports: list[str] = []
    for _event, elem in ET.iterparse(path, events=("end",)):
        if elem.tag == OWL + "Ontology":
            for child in elem:
                if child.tag == OWL + "imports":
                    res = child.get(RDF + "resource") or (child.text or "")
                    if res:
                        imports.append(res)
            continue
        if elem.tag != OWL + "Class":
            continue
        iri = elem.get(RDF + "about")
        if not iri:
            continue
        entry = classes.setdefault(
            iri, {"labels": [], "parents": [], "synonyms": {},
                  "deprecated": None, "replaced_by": None})
        for child in elem:
            if child.tag == RDFS + "label" and child.text:
                lang = child.get("{http://www.w3.org/XML/1998/namespace}lang",
                                 "")
                entry["labels"].append((lang, child.text))
            elif child.tag == RDFS + "subClassOf":
                res = child.get(RDF + "resource")
                if res and res not in entry["parents"]:
                    entry["parents"].append(res)
            elif child.tag == OWL + "deprecated" and child.text:
                entry["deprecated"] = child.text
            elif child.tag == OBO + "IAO_0100001":
                entry["replaced_by"] = (child.get(RDF + "resource")
                                        or child.text)
            elif child.tag.startswith(OBOINOWL):
                prop = child.tag[len(OBOINOWL):]
                if prop in SYNONYM_PROPS and child.text:
                    entry["synonyms"].setdefault(prop, []).append(child.text)
        elem.clear()

    if resolve_imports:
        for import_iri in sorted(imports):
            file_path = os.path.join(os.path.dirname(path), "imports",
                                     import_iri.rsplit("/", 1)[-1])
            if not os.path.isfile(file_path):
                import warnings
                warnings.warn(f"owl:imports {file_path} could not be "
                              "loaded (no local file for its purl)")
                continue
            for iri, imp in parse_owl_classes(
                    file_path, resolve_imports=False).items():
                if iri not in classes:
                    classes[iri] = imp
                    continue
                # rdflib merges triples from imports into one graph;
                # mirror that by unioning the per-class fields
                mine = classes[iri]
                mine["labels"] += [x for x in imp["labels"]
                                   if x not in mine["labels"]]
                mine["parents"] += [x for x in imp["parents"]
                                    if x not in mine["parents"]]
                for prop, syns in imp["synonyms"].items():
                    have = mine["synonyms"].setdefault(prop, [])
                    have += [s for s in syns if s not in have]
                mine["deprecated"] = mine["deprecated"] or imp["deprecated"]
                mine["replaced_by"] = (mine["replaced_by"]
                                       or imp["replaced_by"])
    return classes


def fetch_ontology(path: str, root_iri: str = "") -> dict:
    """OWL file -> ``{"specifications": {short_id: resource_dict}}``
    matching ontofetch.py's JSON output shape for the fields the
    lookup-table build consumes."""
    classes = parse_owl_classes(resolve_ontology_path(path))

    if root_iri:
        in_scope: set = set()
        frontier = [root_iri]
        children: dict[str, list] = {}
        for iri, c in classes.items():
            for p in c["parents"]:
                children.setdefault(p, []).append(iri)
        seen = {root_iri}
        while frontier:
            nxt = []
            for node in frontier:
                for ch in children.get(node, ()):
                    if ch not in seen:
                        seen.add(ch)
                        in_scope.add(ch)
                        nxt.append(ch)
            frontier = nxt
        # document order, not set order: collision resolution downstream
        # is dict last-write-wins, which must be reproducible
        scoped = {iri: c for iri, c in classes.items() if iri in in_scope}
    else:
        # no root: every class with an explicit named parent
        scoped = {iri: c for iri, c in classes.items() if c["parents"]}

    specs: dict[str, dict] = {}
    parents_needed: list[str] = []
    for iri in scoped:
        c = scoped[iri]
        sid = short_id(iri)
        resource: dict = {"id": sid}
        if c["labels"]:
            # ontofetch's entity_text query updates the spec once per
            # DISTINCT ordered label row, so the LAST label in
            # (language, value) order wins (multilingual labels: the
            # reference tests pin the pt label over the en one)
            resource["label"] = max(c["labels"])[1]
        parent_iris = sorted(c["parents"])  # all named parents, IRI order
        if parent_iris:
            resource["parent_id"] = short_id(parent_iris[0])
            if len(parent_iris) > 1:
                resource["other_parents"] = [short_id(p)
                                             for p in parent_iris[1:]]
            for p in parent_iris:
                if p not in parents_needed:
                    parents_needed.append(p)
        for prop, values in c["synonyms"].items():
            phrases: list = []
            for v in values:
                phrases += v.replace("\\n", ";").strip().replace('"', "").split(";")
            resource["oboInOwl:" + prop] = phrases
        if c["deprecated"]:
            resource["deprecated"] = c["deprecated"]
        if c["replaced_by"]:
            resource["replaced_by"] = short_id(c["replaced_by"])
        specs[sid] = resource

    # barebones entries for referenced parents (ontofetch 2nd pass)
    for p in parents_needed:
        sid = short_id(p)
        if sid not in specs:
            specs[sid] = {"id": sid}

    return {"specifications": specs}


# ontofetch.py:77 (the 'ul_label' typo is the reference's) +
# ontohelper.py:50
FETCH_TSV_FIELDS = [
    "id", "parent_id", "language", "ontology", "other_parents", "label",
    "definition", "ul_label", "ui_definition", "ui_help", "deprecated",
    "replaced_by",
    "oboInOwl_hasSynonym", "oboInOwl_hasBroadSynonym",
    "oboInOwl_hasExactSynonym", "oboInOwl_hasNarrowSynonym", "IAO_0000118",
]


_FETCH_TSV_SYNONYM_FIELDS = frozenset([
    "oboInOwl_hasSynonym", "oboInOwl_hasBroadSynonym",
    "oboInOwl_hasExactSynonym", "oboInOwl_hasNarrowSynonym", "IAO_0000118",
])


def write_fetched_ontology(fetched: dict, output_file_basename: str) -> None:
    """S1-S9's fetched-ontology artifact writer: ``<basename>.json`` +
    ``<basename>.tsv`` in the reference's exact formats
    (``ontohelper.py:520-555``): 4-space-indent unsorted JSON; TSV with
    the FIELDS+SYNONYM_FIELDS header, lists '|'-joined, tabs/newlines
    squashed to spaces, missing fields empty.

    The five synonym/IAO columns are ALWAYS emitted empty — a
    deliberate replication of a reference bug: ``ontofetch.py:364``
    stores synonym lists under colon keys (``field.replace('_',':',1)``
    → ``oboInOwl:hasSynonym``, ``IAO:0000118``) while ``do_output_tsv``
    (``ontohelper.py:527-555``) looks fields up by their underscore
    header names, so no reference TSV artifact ever contains synonym
    values. The synonyms still flow into the lookup table via the JSON
    path (``pipeline_resources.py:350-373`` reads the colon keys) —
    only the TSV rendering drops them."""
    import json

    with open(output_file_basename + ".json", "w") as fh:
        fh.write(json.dumps(fetched, sort_keys=False, indent=4,
                            separators=(",", ": ")))

    lines = ["\t".join(FETCH_TSV_FIELDS)]
    for entity in fetched["specifications"].values():
        row = []
        for field in FETCH_TSV_FIELDS:
            if field in _FETCH_TSV_SYNONYM_FIELDS:
                value = ""  # reference key-mismatch bug, see docstring
            else:
                value = entity.get(field, "")
            if isinstance(value, list):
                value = "|".join(value)
            row.append(str(value).replace("\t", " ").replace("\n", " "))
        lines.append("\t".join(row))
    with open(output_file_basename + ".tsv", "w") as fh:
        fh.write("\n".join(lines))


def add_fetched_to_lexicon(lex: Lexicon, fetched: dict) -> Lexicon:
    """Fold a fetched ontology into a Lexicon — the canonical-index
    re-expression of ``add_fetched_ontology_to_lookup_table``
    (pipeline_resources.py:310-408). Call ``lex.finalize()`` after the
    last fold to rebuild the ancestor closure / vocab."""
    for resource in fetched["specifications"].values():
        if "id" not in resource or "label" not in resource:
            continue
        resource_id = resource["id"].lower().replace(":", "_")
        resource_label = resource["label"].lower()
        lex.non_standard_resource_ids[resource_id] = resource_label

        std_label = punctuation_treatment(resource_label)
        lex.standard_resource_labels[std_label] = resource_id
        ckey = canonical_key(std_label.split())
        lex.canon_labels.setdefault(ckey, {})[std_label] = resource_id
        # fetched ontologies: <7 tokens, NO ncbitaxon exclusion
        # (pipeline_resources.py:341-348)
        if len(word_tokenize(std_label)) < 7:
            lex.canon_perms[ckey] = resource_id

        for prop in SYNONYM_PROPS:
            for synonym in resource.get("oboInOwl:" + prop, ()):
                lex.synonyms[punctuation_treatment(synonym.lower())] = std_label

        if "parent_id" in resource:
            parent_id = resource["parent_id"].replace(":", "_").lower()
            if resource_id == parent_id:
                continue
            if resource_id in lex.parents:
                if parent_id not in lex.parents[resource_id]:
                    lex.parents[resource_id] += [parent_id]
            else:
                lex.parents[resource_id] = [parent_id]
            if "other_parents" in resource:
                others = [x.replace(":", "_").lower()
                          for x in resource["other_parents"]]
                others = [x for x in others
                          if x not in lex.parents[resource_id]
                          and x != resource_id]
                lex.parents[resource_id] += others
    return lex


def compile_config(entries: list[tuple[str, str]],
                   base: Lexicon | None = None) -> Lexicon:
    """Compile a config — ordered (owl_path, root_iri) pairs — into a
    Lexicon. Folds in REVERSE order so the FIRST entry wins conflicts
    (reference iterates ``reversed(config_json)``,
    pipeline_resources.py:113; proven by the pizza prioritisation
    tests). If ``base`` is given, the result is merged onto it with
    config-side priority (J10 merge, pipeline_helpers.py:375-412)."""
    onto_lex = Lexicon()
    for path, root_iri in reversed(entries):
        add_fetched_to_lexicon(onto_lex, fetch_ontology(path, root_iri))
    onto_lex.finalize()
    if base is None:
        return onto_lex
    return merge_lexicons(base, onto_lex)


def merge_lexicons(one: Lexicon, two: Lexicon) -> Lexicon:
    """J10: key-wise map union, table-two wins conflicts
    (pipeline_helpers.py:375-412), then derived indexes rebuilt."""
    merged = Lexicon()
    for field_name in ("non_standard_resource_ids", "standard_resource_labels",
                       "synonyms", "parents", "abbreviations",
                       "non_english_words", "spelling_mistakes",
                       "inflection_exceptions", "stop_words", "suffixes",
                       "buckets_ifsactop", "buckets_lexmapr", "ifsac_labels",
                       "ifsac_refinement", "ifsac_default"):
        combined = dict(getattr(one, field_name))
        combined.update(getattr(two, field_name))
        setattr(merged, field_name, combined)
    merged.scientific_names = dict(one.scientific_names)
    merged.scientific_names.update(two.scientific_names)

    # rebuild canonical label/permutation indexes in merged-label order
    # (reference rebuilds nothing — its permutation index is merged the
    # same dict-union way; replicate by unioning with two-wins)
    merged.canon_labels = {}
    for src in (one, two):
        for ckey, cands in src.canon_labels.items():
            merged.canon_labels.setdefault(ckey, {}).update(cands)
    merged.canon_perms = dict(one.canon_perms)
    merged.canon_perms.update(two.canon_perms)
    merged.canon_syns = {}
    for syn, label in merged.synonyms.items():
        merged.canon_syns.setdefault(
            canonical_key(syn.split()), {})[syn] = label
    merged.ancestors = dict(one.ancestors)
    merged.ancestors.update(compute_ancestor_closure(merged.parents))
    merged.build_vocab()
    return merged


def local_test_ontology(name: str) -> str:
    """Path to a reference test OWL copied into this repo."""
    return os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "tests", "ontologies", name)
