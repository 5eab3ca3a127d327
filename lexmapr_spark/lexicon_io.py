"""Compiled-lexicon artifact: save/load + profile mechanism.

The reference memoizes compiled lookup tables to JSON on disk
(``pipeline_resources.py:60-71,101-141``) and supports named profiles
bundling a prebuilt table + default args
(``pipeline_resources.py:17-49``). This module provides the engine's
equivalents: a JSON artifact that round-trips the full Lexicon
(including the canonical indexes, so load skips recompilation
entirely) and ``get_profile_lexicon`` for profile directories shaped
``<dir>/<name>/<name>_table.json`` (+ optional ``<name>_args.json``).
"""

from __future__ import annotations

import json
import os

from lexmapr_spark.lexicon import Lexicon

_PLAIN_DICT_FIELDS = [
    "non_standard_resource_ids", "standard_resource_labels", "synonyms",
    "parents", "abbreviations", "non_english_words", "spelling_mistakes",
    "inflection_exceptions", "stop_words", "suffixes", "buckets_ifsactop",
    "buckets_lexmapr", "ifsac_labels", "ifsac_refinement", "ifsac_default",
    "canon_perms", "scientific_names",
]
_NESTED_DICT_FIELDS = ["canon_labels", "canon_syns"]


def save_lexicon(lex: Lexicon, path: str) -> None:
    """Serialize a compiled Lexicon to one JSON artifact."""
    payload = {name: getattr(lex, name)
               for name in _PLAIN_DICT_FIELDS + _NESTED_DICT_FIELDS}
    payload["ancestors"] = {k: sorted(v) for k, v in lex.ancestors.items()}
    payload["vocab"] = sorted(lex.vocab)
    payload["suffix_bases"] = sorted(lex.suffix_bases)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f)


def load_lexicon(path: str) -> Lexicon:
    """Load a Lexicon artifact — no recompilation, no CSVs needed."""
    with open(path) as f:
        payload = json.load(f)
    lex = Lexicon()
    for name in _PLAIN_DICT_FIELDS + _NESTED_DICT_FIELDS:
        setattr(lex, name, payload[name])
    lex.ancestors = {k: frozenset(v) for k, v in payload["ancestors"].items()}
    lex.vocab = frozenset(payload["vocab"])
    lex.suffix_bases = frozenset(payload["suffix_bases"])
    return lex


def get_profile_lexicon(profile_dir: str, profile: str) -> tuple:
    """(Lexicon, default_args dict) for a named profile directory —
    the reference's ``--profile`` mechanism
    (``pipeline_resources.py:17-49``)."""
    table_path = os.path.join(profile_dir, profile, f"{profile}_table.json")
    args_path = os.path.join(profile_dir, profile, f"{profile}_args.json")
    lex = load_lexicon(table_path)
    args = {}
    if os.path.exists(args_path):
        with open(args_path) as f:
            args = json.load(f)
    return lex, args
