"""Bucket classification (the reference's ``--bucket`` tier).

Re-expresses ``lexmapr/pipeline_classification.py`` as pure functions
over the broadcast lexicon: per-match parent-hierarchy walk ->
level-min bucket pick (C1/C2), ``;``-multi-label decode (C3), default
classification last-match scan (C4), the sequential label-refinement
rule engine (C5) encoded as an ordered rule table, and deterministic
label ordering (C6 — the reference's ``set.pop()`` is
PYTHONHASHSEED-dependent, ``pipeline_classification.py:31``; we take
the sorted-first priority label instead, a documented deviation that
makes results partition-order independent by construction).
"""

from __future__ import annotations

import re

from lexmapr_spark.lexicon import Lexicon
from lexmapr_spark.textops import punctuation_treatment, singularize, word_tokenize

# ---------------------------------------------------------------------------
# category groups (pipeline_classification.py:86-124)
# ---------------------------------------------------------------------------

SPECIFIC_MEAT = {"pork", "chicken", "beef", "fish", "game", "poultry", "turkey"}
MOLLUSK = {"mollusks (non-bi-valve)", "mollusks (bi-valve)"}
SHELLFISH = {"crustaceans", "mollusks"} | MOLLUSK
AQUATIC = {"fish", "other aquatic animals"} | SHELLFISH
POULTRY = {"other poultry", "chicken", "turkey"}
AVIAN = {"other poultry", "game", "poultry"} | POULTRY
ANIMAL = ({"human", "companion animal", "aquatic animals", "wild animal",
           "beef", "pork", "other meat", "cow", "pig"}
          | AVIAN | AQUATIC | {"other animal"})
VETERINARY = (AVIAN | AQUATIC | {"other animal"}
              | {"animal", "avian", "companion animal", "aquatic animals",
                 "wild animal", "beef", "pork", "other meat", "cow", "pig"})
ENVIRONMENTAL = {"environmental-water", "environmental-farm",
                 "environmental-restaurant", "environmental-retail",
                 "environmental-abattoir", "environmental-warehouse",
                 "environmental-researchfacility", "environmental-pasture",
                 "environmental-animal housing",
                 "environmental-factory/production facility",
                 "environmental-vehicle", "environmental-construction"}
ROOT_UNDERGROUND = {"root/underground (roots)", "root/underground (tubers)",
                    "root/underground (bulbs)", "root/underground (other)"}
SEEDED_VEG = {"seeded vegetables (vine-grown)", "seeded vegetables (solanaceous)",
              "seeded vegetables (legumes)", "seeded vegetables (other)"}
VEGETABLE = ({"fungi", "sprouts", "root/underground", "seeded vegetables",
              "herbs", "vegetable row crops (flower)",
              "vegetable row crops (stem)", "vegetable row crops (leafy)"}
             | ROOT_UNDERGROUND | SEEDED_VEG)
FRUIT = {"melon fruit", "pome fruit", "stone fruit", "sub-tropical fruit",
         "small fruit", "tropical fruit"}
PLANT = ({"oils", "vegetables", "fruits", "grains", "beans", "nuts", "seeds"}
         | VEGETABLE | FRUIT)
OTHER_PLANT_FOOD = {"other (food additive)", "dietary supplement",
                    "other (sweetener)", "other (flavoring and seasoning",
                    "other (confectionary)"}
OTHER_ANIMAL_FOOD = {"meat", "other meat", "beef", "pork"}

PRIORITY_CATEGORIES = ({"multi-ingredient", "veterinary clinical/research",
                        "environmental"} | ENVIRONMENTAL)

FOOD_ANATOMICAL_PARTS = {"heart", "liver", "lung", "leg", "shell-on", "shell",
                         "soft shell", "tail", "hlso", "shellon", "beef",
                         "pork", "meat", "porcine", "shell on"}
BODY_PART_FOOD_ANIMALS = AQUATIC | SHELLFISH | POULTRY | {"cow"}
DISAMBIGUATION_WORDS = {"ground", "scraps", "cut", "smoke", "moon", "plain"}


# ---------------------------------------------------------------------------
# C1/C2: hierarchy walk + level-min bucket
# ---------------------------------------------------------------------------

# (shared with the matcher's ancestor-closure precompute)
from lexmapr_spark.lexicon import term_parent_hierarchies  # noqa: E402,F401


def hierarchy_buckets(hierarchy: list, buckets: dict) -> dict:
    """{level: {bucket_id: label}} for bucket ids present in the
    hierarchy (1-based levels; level 1 = the matched term itself)."""
    out = {}
    for i, parent_id in enumerate(hierarchy):
        for bucket_label, bucket_id in buckets.items():
            if bucket_id == parent_id:
                out[i + 1] = {bucket_id: bucket_label}
    return out


# ---------------------------------------------------------------------------
# C3 / C4 / C6
# ---------------------------------------------------------------------------

def decode_multi_class_labels(labels) -> list:
    out = set()
    for label in labels:
        out.update(label.split(";") if ";" in label else [label])
    return list(out)


# Prepared-table cache for the static rule dicts (ifsac_default /
# ifsac_refinement): tokenizing/compiling the table rows is a pure
# function of the dict contents, but the uncached code re-derived them
# per SAMPLE — measured 22 s of a 26 s classify profile over 500 rows
# (regex recompiles + bucket re-tokenization). Keyed by id() with a
# strong reference to the source dict held in the entry, so the id can
# never be recycled while the entry lives (one lexicon's tables per
# worker in practice; cleared defensively past 8 entries).
_PREPARED: dict = {}


def _prepared(src: dict, build):
    hit = _PREPARED.get(id(src))
    if hit is not None and hit[0] is src:
        return hit[1]
    if len(_PREPARED) > 8:
        _PREPARED.clear()
    table = build(src)
    _PREPARED[id(src)] = (src, table)
    return table


def _build_default_table(ifsac_default: dict) -> list:
    return [(frozenset(singularize(t) for t in word_tokenize(bucket)),
             label)
            for bucket, label in ifsac_default.items()]


def default_classification(sample: str, ifsac_default: dict) -> str:
    """Last matching row of ifsac-default.csv whose singularized token
    set is contained in the sample's (pipeline_classification.py:436-445)."""
    sample_tokens = {singularize(t) for t in word_tokenize(sample)}
    result = ""
    for bucket_tokens, label in _prepared(ifsac_default,
                                          _build_default_table):
        if not (bucket_tokens - sample_tokens):
            result = label
    return result


def customize_order_of_labels(labels) -> list:
    """C6 with deterministic priority pick: the reference uses
    ``set.pop()`` (hash-order) to choose among multiple priority
    labels; we take the sorted-first one."""
    ret = set(labels)
    ordered = []
    remaining = list(labels)
    priority = sorted(ret & PRIORITY_CATEGORIES)
    if priority:
        ordered.append(priority[0])
        remaining.remove(priority[0])
    ordered.extend(sorted(remaining))
    return ordered


# ---------------------------------------------------------------------------
# C5: label refinement — ordered rule table
# ---------------------------------------------------------------------------
# Each rule: (predicate(ret, sample, tokens), action(ret)). Rules run
# sequentially (order is semantic, pipeline_classification.py:72-73).

def _swap(remove, add):
    def action(ret, s):
        ret.discard(remove)
        ret.add(add)
    return action


def _drop(label):
    return lambda r, s: r.discard(label)


def _drop_if_granular(general, granular_set):
    """general class removed when a more granular one is present."""
    return (lambda r, s, t: general in r and r & granular_set, _drop(general))


RULES = [
    # animal feed vs 'by' token
    (lambda r, s, t: "animal feed" in r and "by" in s and "by product" not in s,
     _drop("animal feed")),
    # clinical/research block
    (lambda r, s, t: "clinical/research" in r
     and r & (PLANT | OTHER_PLANT_FOOD) and not ("swab" in s or "clinical" in s),
     _drop("clinical/research")),
    (lambda r, s, t: "clinical/research" in r and "swab sub" in s,
     lambda r, s: (r.clear(), r.add("environmental"))),
    (lambda r, s, t: "clinical/research" in r and "scat" in s,
     _swap("clinical/research", "environmental")),
    (lambda r, s, t: "clinical/research" in r and "environmental" in r
     and not ("tissue" in s or "biological" in s),
     _drop("clinical/research")),
    (lambda r, s, t: "clinical/research" in r and r & ENVIRONMENTAL,
     _drop("clinical/research")),
    (lambda r, s, t: "clinical/research" in r and (r & PLANT or r & ANIMAL)
     and ("shell" in s or "shell on" in s or "shellon" in s),
     _drop("clinical/research")),
    (lambda r, s, t: "clinical/research" in r and r & VETERINARY,
     _swap("clinical/research", "veterinary clinical/research")),
    (lambda r, s, t: "veterinary clinical/research" in r and "animal" in r,
     _drop("animal")),
    # animal -> other animal unless the sample IS 'animal'
    (lambda r, s, t: "animal" in r and s != "animal",
     _swap("animal", "other animal")),
    # dairy / cow / beef
    (lambda r, s, t: "dairy" in r and "cow" in r, _drop("cow")),
    (lambda r, s, t: "beef" in r and "dairy" in r and "milk" in s,
     _drop("beef")),
] + [
    (lambda r, s, t, kw=kw: kw in s and "cow" in r, _swap("cow", "beef"))
    for kw in ("raw cow", "raw veal", "raw calf", "meat", "beef",
               "cow lung", "cow liver", "cow heart")
] + [
    (lambda r, s, t, kw=kw: kw in s and "pig" in r, _swap("pig", "pork"))
    for kw in ("raw pig", "raw swine", "meat", "pork", "porcine")
] + [
    (lambda r, s, t: "cow" in r and "beef" in r, _drop("cow")),
    (lambda r, s, t: "beef" in r and "fish" in r
     and ("fillet" in s or "filet" in s), _drop("beef")),
    (lambda r, s, t: "beef" in r and "veterinary clinical/research" in r,
     _swap("beef", "cow")),
    (lambda r, s, t: "oils" in r and "in oil" in s, _drop("oils")),
    (lambda r, s, t: "other (sweetener)" in r and "sugar free" in s,
     _drop("other (sweetener)")),
    # fish / shellfish / eggs
    (lambda r, s, t: "shellfish" in r and "fish" in r, _drop("fish")),
    (lambda r, s, t: "fish" in r and "eggs" in r, _drop("eggs")),
    (lambda r, s, t: "fish eggs" in r and "eggs" in r, _drop("fish eggs")),
    (lambda r, s, t: "fish" in r and "poultry" in r, _drop("poultry")),
    (lambda r, s, t: "fish" in r and "other poultry" in r,
     _drop("other poultry")),
    (lambda r, s, t: "poultry" in r and "eggs" in r, _drop("poultry")),
    # pig / pork / meat
    (lambda r, s, t: ("pork" in r or "pork" in s) and "pig" in r,
     _swap("pig", "pork")),
    (lambda r, s, t: ("pork" in r or "pork" in s) and "meat" in r,
     _swap("meat", "pork")),
    (lambda r, s, t: "pork" in r and "veterinary clinical/research" in r,
     _swap("pork", "pig")),
    (lambda r, s, t: "meat" in r and ("veterinary clinical/research" in r
                                      or "engineering  seafood" in r),
     _drop("meat")),
    (lambda r, s, t: r & SPECIFIC_MEAT and "meat" in r, _drop("meat")),
    # clinical/research + meats
    (lambda r, s, t: not r & ANIMAL and "other meat" in r
     and ("veterinary clinical/research" in r or "clinical/research" in r),
     _swap("other meat", "other animal")),
    (lambda r, s, t: not r & ANIMAL and "meat" in r
     and ("veterinary clinical/research" in r or "clinical/research" in r),
     lambda r, s: (r.discard("meat"),
                   r.add("other animal") if "liver" not in s else None)),
    (lambda r, s, t: not r & ANIMAL and "veterinary clinical/research" in r,
     lambda r, s: r.add("other animal")),
    # granular animal classes
    _drop_if_granular("mollusks", MOLLUSK),
    _drop_if_granular("shellfish", SHELLFISH),
    _drop_if_granular("aquatic animals", AQUATIC),
    _drop_if_granular("poultry", POULTRY),
    _drop_if_granular("other animal", AVIAN),
    _drop_if_granular("animal", ANIMAL),
    (lambda r, s, t: "engineered seafood" in r and r & AQUATIC,
     lambda r, s: [r.discard(x) for x in list(r & AQUATIC)]),
    (lambda r, s, t: "engineered seafood" in r and "aquatic animals" in r,
     _drop("aquatic animals")),
    (lambda r, s, t: ("engineered seafood" in r or "companion animal" in r)
     and "other animal" in r, _drop("other animal")),
    # granular plant classes
    _drop_if_granular("root/underground", ROOT_UNDERGROUND),
    _drop_if_granular("seeded vegetables", SEEDED_VEG),
    _drop_if_granular("vegetables", VEGETABLE),
    _drop_if_granular("fruits", FRUIT),
    _drop_if_granular("plant", PLANT),
    # nut/seeds, environment-water/fish
    (lambda r, s, t: "nut" in r and "seeds" in r and len(r) == 2,
     _drop("seeds")),
    (lambda r, s, t: "environment-water" in r and "fish" in r and len(r) == 2,
     _drop("environment-water")),
    # granular environmental
    _drop_if_granular("environmental", ENVIRONMENTAL),
    (lambda r, s, t: ("environmental-animal housing" in r
                      or "environmental-abattoir" in r
                      or "environmental-farm" in r)
     and "environmental-factory/production facility" in r,
     _drop("environmental-factory/production facility")),
    # multi-ingredient assignment
    (lambda r, s, t: not (r & {"clinical/research",
                               "veterinary clinical/research", "animal feed",
                               "human", "environmental"}
                          or r & ENVIRONMENTAL) and len(r) >= 3,
     lambda r, s: r.add("multi-ingredient")),
    # specific cases
    (lambda r, s, t: "other meat" in r and "other animal" in r,
     _drop("other animal")),
    (lambda r, s, t: "meat" in r and r & ANIMAL,
     lambda r, s: (r.discard("multi-ingredient"), r.discard("meat"))
     if len(r) == 3 and "multi-ingredient" in r else r.discard("meat")),
    # drop general 'food'
    (lambda r, s, t: "food" in r and r & (ANIMAL | PLANT | OTHER_ANIMAL_FOOD
                                          | OTHER_PLANT_FOOD
                                          | {"plant", "animal"}),
     _drop("food")),
    (lambda r, s, t: "food" in r and ("dairy" in r or "environmental" in r
                                      or "clinical/research" in r
                                      or "veterinary clinical/research" in r),
     _drop("food")),
    # additional unique cases
    (lambda r, s, t: "food" in r and "environmental" in r and "leaf" in s,
     _drop("environmental")),
    (lambda r, s, t: "environmental-animal housing" in r and "finished" in s,
     _drop("environmental-animal housing")),
    (lambda r, s, t: ("chicken" in r or "poultry" in r or "other poultry" in r
                      or "cow" in r)
     and "environmental-factory/production facility" in r,
     _swap("environmental-factory/production facility", "environmental-farm")),
    (lambda r, s, t: "eggs" in r and "veterinary clinical/research" in r,
     _drop("veterinary clinical/research")),
    (lambda r, s, t: "environmental" in r
     and ("multi-ingredient" in r or r & PLANT)
     and not ("swab" in s or "environmental" in s),
     _drop("environmental")),
    # body parts that are food
    (lambda r, s, t: "veterinary clinical/research" in r
     and r & BODY_PART_FOOD_ANIMALS and t & FOOD_ANATOMICAL_PARTS
     and "swab" not in s,
     _drop("veterinary clinical/research")),
    # disambiguation tokens
    (lambda r, s, t: "environmental" in r
     and (r & ANIMAL or r & PLANT or "dairy" in r)
     and t & DISAMBIGUATION_WORDS,
     _drop("environmental")),
    # animal feed wins everything
    (lambda r, s, t: "animal feed" in r,
     lambda r, s: (r.clear(), r.add("animal feed"))),
    # multi-ingredient / food endgame
    (lambda r, s, t: ("multi-ingredient" in r or "food supplement" in r)
     and "food" in r, _drop("food")),
    (lambda r, s, t: "food" in r and len(r) < 2,
     _swap("food", "multi-ingredient")),
]


_REGEX_META = re.compile(r"[.^$*+?{}\[\]\\|()]")


def _build_refinement_table(refinements: dict) -> list:
    rows = []
    for label, refined in refinements.items():
        # parity note: the reference does NOT escape the label
        # (pipeline_classification.py:81) — keys like 'environmental
        # (forests)' rely on their parens acting as a regex group to
        # match the punctuation-treated sample 'environmental forests'
        try:
            pattern = re.compile(r"\b" + label + r"\b")
        except re.error:
            pattern = None  # reference would crash; we skip the key
        # prescreen: when the label contains no regex metacharacter,
        # the compiled pattern is the literal label between \b anchors,
        # so a match REQUIRES the label as a raw substring — a C-speed
        # `lit in sample` gates the (much slower) scan without ever
        # changing its outcome. Labels WITH metachars (1508/1511 are
        # without) keep the unconditional search, preserving the
        # unescaped-regex reference quirk above.
        lit = (label if pattern is not None
               and not _REGEX_META.search(label) else None)
        rows.append((frozenset(word_tokenize(label)), pattern, lit,
                     refined))
    return rows


def refine_ifsac_final_labels(sample: str, labels, refinements: dict) -> list:
    """C5: refinement-table first-match scan + the ordered rule table
    (pipeline_classification.py:60-360)."""
    ret = set(labels)
    sample = punctuation_treatment(sample)
    tokens = set(word_tokenize(sample))

    for label_tokens, pattern, lit, refined in _prepared(
            refinements, _build_refinement_table):
        if (not (label_tokens - tokens)
                or (pattern is not None
                    and (lit is None or lit in sample)
                    and pattern.search(sample))):
            ret.add(refined)
            break

    for pred, action in RULES:
        if pred(ret, sample, tokens):
            action(ret, sample)
    return list(ret)


def classify_sample(sample: str, matched_components, lex: Lexicon) -> dict:
    """C1: map each matched term's parent hierarchies to buckets; keep
    the min-level (most specific) bucket per hierarchy; resolve IFSAC
    labels; default + refine + order."""
    lexmapr_hierarchy_buckets: list = []
    lexmapr_final_buckets: list = []
    ifsac_final_buckets: list = []
    ifsac_final_labels: list = []

    for matched in matched_components:
        term_id = matched.split(":", 1)[1]
        for hierarchy in term_parent_hierarchies(term_id, lex.parents):
            lb = hierarchy_buckets(hierarchy, lex.buckets_lexmapr)
            if lb:
                lexmapr_hierarchy_buckets.append(lb)
                final = lb[min(lb.keys())]
                if final not in lexmapr_final_buckets:
                    lexmapr_final_buckets.append(final)
            ib = hierarchy_buckets(hierarchy, lex.buckets_ifsactop)
            if ib:
                final = ib[min(ib.keys())]
                if final not in ifsac_final_buckets:
                    ifsac_final_buckets.append(final)
                    bucket_id = list(final.keys())[0]
                    label = lex.ifsac_labels.get(bucket_id)
                    if label is not None:
                        ifsac_final_labels.append(label)

    if ifsac_final_labels:
        ifsac_final_labels = sorted(decode_multi_class_labels(ifsac_final_labels))

    if not ifsac_final_labels or set(ifsac_final_labels) == {"food"}:
        default = default_classification(sample, lex.ifsac_default)
        if default:
            ifsac_final_buckets.append("Default classification")
            ifsac_final_labels.append(default)

    ifsac_final_labels = refine_ifsac_final_labels(
        sample, ifsac_final_labels, lex.ifsac_refinement)
    ifsac_final_labels = customize_order_of_labels(ifsac_final_labels)

    return {
        "lexmapr_hierarchy_buckets": lexmapr_hierarchy_buckets,
        "lexmapr_final_buckets": lexmapr_final_buckets,
        "ifsac_final_buckets": ifsac_final_buckets,
        "ifsac_final_labels": ifsac_final_labels,
    }
