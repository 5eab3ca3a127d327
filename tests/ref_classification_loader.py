"""Import the REFERENCE's own classification code for differential
testing.

``/root/reference/lexmapr/pipeline_classification.py`` depends only on
``inflection.singularize``, ``nltk.word_tokenize`` and
``lexmapr.pipeline_helpers`` (for ``punctuation_treatment`` and
``get_term_parent_hierarchies``). Those third-party libraries are not
installed in this sandbox, but our vendored re-implementations in
``lexmapr_spark.textops`` are pinned byte-exact to them by the golden
corpus — so we inject them via ``sys.modules`` stubs and import the
reference module unmodified. That makes the differential test a true
oracle: OUR rule table vs THE REFERENCE'S ~120 sequential rules,
running its original code.

Read-only use of public reference code for testing; nothing here ships
in the package.
"""

from __future__ import annotations

import importlib
import sys
import types

_REF_ROOT = "/root/reference"
_cache: dict = {}


def load_reference_modules():
    """Return (pipeline_classification, pipeline_helpers) from the
    reference repo, importing them once with stubbed third-party deps.
    """
    if _cache:
        return _cache["cls"], _cache["helpers"]

    from lexmapr_spark import textops

    inflection = types.ModuleType("inflection")
    inflection.singularize = textops.singularize

    nltk = types.ModuleType("nltk")
    nltk.word_tokenize = textops.word_tokenize
    nltk.pos_tag = lambda tokens: [(t, "NN") for t in tokens]
    nltk_tokenize = types.ModuleType("nltk.tokenize")
    nltk_tokenize.word_tokenize = textops.word_tokenize
    nltk_treebank = types.ModuleType("nltk.tokenize.treebank")

    class _Detok:
        def detokenize(self, tokens):
            return textops.treebank_detokenize(list(tokens))

    nltk_treebank.TreebankWordDetokenizer = _Detok
    nltk.tokenize = nltk_tokenize

    dateutil = types.ModuleType("dateutil")
    dateutil_parser = types.ModuleType("dateutil.parser")

    def _parse(s, **kw):  # classification never parses dates
        raise ValueError(f"stub dateutil.parse({s!r})")

    dateutil_parser.parse = _parse
    dateutil.parser = dateutil_parser

    # rdflib is only needed so `import lexmapr.pipeline_resources`
    # succeeds (it pulls in ontofetch/ontohelper); the networked
    # ontology path is never exercised — prepareQuery is called inside
    # Ontology.__init__, which our differential never constructs
    rdflib = types.ModuleType("rdflib")
    rdflib_plugins = types.ModuleType("rdflib.plugins")
    rdflib_sparql = types.ModuleType("rdflib.plugins.sparql")
    rdflib_sparql.prepareQuery = lambda *a, **k: None
    rdflib.plugins = rdflib_plugins
    rdflib_plugins.sparql = rdflib_sparql

    class _NeverConstructed:
        def __init__(self, *a, **k):  # pragma: no cover
            raise RuntimeError("rdflib stub: networked ontology path "
                               "must not run in the differential")

    rdflib.Graph = _NeverConstructed
    rdflib.exceptions = types.ModuleType("rdflib.exceptions")
    rdflib.exceptions.ParserError = type("ParserError", (Exception,), {})

    stubs = {
        "inflection": inflection,
        "nltk": nltk,
        "nltk.tokenize": nltk_tokenize,
        "nltk.tokenize.treebank": nltk_treebank,
        "dateutil": dateutil,
        "dateutil.parser": dateutil_parser,
        "rdflib": rdflib,
        "rdflib.plugins": rdflib_plugins,
        "rdflib.plugins.sparql": rdflib_sparql,
        "rdflib.exceptions": rdflib.exceptions,
    }
    # only stub names that are genuinely absent — never shadow a real
    # installed library
    for name, mod in stubs.items():
        if name not in sys.modules:
            sys.modules[name] = mod

    if _REF_ROOT not in sys.path:
        sys.path.insert(0, _REF_ROOT)
    helpers = importlib.import_module("lexmapr.pipeline_helpers")
    cls = importlib.import_module("lexmapr.pipeline_classification")
    _cache["cls"] = cls
    _cache["helpers"] = helpers
    return cls, helpers


def reference_lookup_tables(lex):
    """Shape our compiled Lexicon into the two dicts the reference's
    ``classify_sample(sample, matched, lookup_table,
    classification_lookup_table)`` expects."""
    lookup_table = {"parents": lex.parents}
    classification_lookup_table = {
        "buckets_lexmapr": lex.buckets_lexmapr,
        "buckets_ifsactop": lex.buckets_ifsactop,
        "ifsac_labels": lex.ifsac_labels,
        "ifsac_default": lex.ifsac_default,
        "ifsac_refinement": lex.ifsac_refinement,
    }
    return lookup_table, classification_lookup_table
