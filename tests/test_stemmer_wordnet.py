"""Porter stemmer (public algorithm golden vectors) and WordNet-distance
features (SURVEY §2.5/§2.7) — fallback thesaurus is deterministic; nltk
backend is used automatically when the corpus exists."""

from __future__ import annotations

import pytest

from serene_spark.functions.stemmer import stem
from serene_spark.functions.wordnet_dist import (
    backend,
    min_token_set_distance,
    token_distance,
)

# Published Porter (1980) example pairs.
PORTER_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "motoring": "motor",
    "conflated": "conflat", "sized": "size", "hopping": "hop", "falling": "fall",
    "filing": "file", "happy": "happi", "relational": "relat",
    "conditional": "condit", "rational": "ration", "digitizer": "digit",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "triplicate": "triplic", "formative": "form", "electriciti": "electr",
    "hopeful": "hope", "goodness": "good", "allowance": "allow",
    "inference": "infer", "adjustable": "adjust", "replacement": "replac",
    "adoption": "adopt", "activate": "activ", "effective": "effect",
    "controll": "control", "roll": "roll",
}


def test_porter_golden_vectors():
    for word, expect in PORTER_VECTORS.items():
        assert stem(word) == expect, f"{word}: {stem(word)} != {expect}"


def test_token_distance_contract():
    assert token_distance("name", "name") == 0.0
    assert token_distance("price", "prices") == 0.0  # same stem
    # synonym-group (fallback) or WordNet-close: strictly nearer than unrelated
    near = token_distance("phone", "telephone")
    far = token_distance("phone", "acctbal")
    assert near < far
    assert 0.0 <= near <= 1.0 and 0.0 < far <= 1.0


def test_min_token_set_distance_alignment():
    d = min_token_set_distance(["customer", "name"], ["person", "address"])
    # best alignment picks the closest pair (customer~person)
    assert d <= token_distance("customer", "person")
    assert min_token_set_distance([], ["x"]) == 1.0


def test_backend_reported():
    assert backend() in ("nltk-wordnet", "fallback-thesaurus")


def test_class_wordnet_dist_query(spark, sf_dir):
    from serene_spark.registry import load_all

    df = load_all()["class_wordnet_dist"].spark(spark, sf_dir)
    rows = {r["col_name"]: r for r in df.collect()}
    from serene_spark.operators.class_features import CLASSES, TEST_COLUMNS

    assert set(rows) == set(TEST_COLUMNS)
    r = rows["p_name"]
    for c in CLASSES:
        assert 0.0 <= r[f"{c}_min_jcn_dist"] <= 1.0
        assert 0.0 <= r[f"{c}_min_lin_dist"] <= 1.0
    # p_name tokenizes to a 'name' token -> distance 0 to the name class
    assert r["name_min_jcn_dist"] == 0.0
    # deterministic across runs
    again = {r["col_name"]: r for r in load_all()["class_wordnet_dist"].spark(spark, sf_dir).collect()}
    assert rows == again
