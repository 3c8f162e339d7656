"""Soundex phonetic keying (operators/phonetic.py): pinned against an
independent python implementation of American Soundex, plus classic
textbook vectors driven THROUGH the SQL expression on Spark."""

from __future__ import annotations

import re

import pandas as pd

from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"

_CODE = {}
for letters, d in (("bfpv", "1"), ("cgjkq sxz".replace(" ", ""), "2"),
                   ("dt", "3"), ("l", "4"), ("mn", "5"), ("r", "6"),
                   ("aeiouy", "0")):
    for ch in letters:
        _CODE[ch] = d
# h, w: removed entirely (no entry)


def py_soundex(word: str) -> str:
    w = word.strip().lower()
    first = w[0]
    mapped = "".join(_CODE[ch] for ch in w if ch in _CODE)
    dedup = re.sub(r"(.)\1+", r"\1", mapped)
    tail = dedup if first in "hw" else dedup[1:]
    digits = tail.replace("0", "")
    return first.upper() + (digits + "000")[:3]


def test_textbook_vectors_through_spark_sql(spark):
    from serene_spark.operators.phonetic import soundex_sql
    from serene_spark.functions.sqlgen import SPARK

    vectors = {
        "robert": "R163", "rupert": "R163", "ashcraft": "A261",
        "ashcroft": "A261", "tymczak": "T522", "pfister": "P236",
        "honeyman": "H555", "wright": "W623", "widget": "W323",
        "apple": "A140", "bob": "B100", "ring": "R520", "rung": "R520",
    }
    words_sql = ", ".join(f"('{w}')" for w in vectors)
    df = spark.sql(
        f"SELECT w, {soundex_sql(SPARK, 'w')} AS k FROM (VALUES {words_sql}) AS t(w)"
    ).toPandas()
    for _, r in df.iterrows():
        assert r["k"] == vectors[r["w"]], r["w"]
        assert r["k"] == py_soundex(r["w"]), r["w"]


def test_blocks_match_python_reference(spark):
    out = load_all()["phonetic_blocks_parts"].spark(spark, SF).toPandas()
    parts = pd.read_parquet(f"{SF}/part.parquet")
    nouns = parts.p_name.str.lower().str.split(r"[^a-z]+", regex=True).str[-1]
    ref = pd.DataFrame({"noun": nouns, "key": [py_soundex(n) for n in nouns]})
    grp = ref.groupby("key").agg(n=("noun", "size"), d=("noun", "nunique"))
    assert len(out) == len(grp)
    for _, r in out.iterrows():
        e = grp.loc[r["soundex_key"]]
        assert (r["n_parts"], r["n_distinct_nouns"]) == (e["n"], e["d"])
