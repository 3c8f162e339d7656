"""Readability scores (operators/text_analysis.py readability_sql).

Oracle parity runs in the driver gate; these pin the regex-counting
conventions against python re and the score ordering on constructed
simple vs complex documents.
"""

from __future__ import annotations

import pandas as pd


def test_readability_matches_python(spark, sf_dir):
    """Flesch/FK recomputed with python re over the raw text."""
    import re

    from serene_spark.catalog import load_table
    from serene_spark.registry import load_all

    out = load_all()["readability_scores"].spark(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents").toPandas()
    assert len(out) == len(docs)
    byid = out.set_index("doc_id")
    for _, d in docs.iterrows():
        t = d["text"]
        w = len(re.findall(r"[a-z]+", t.lower()))
        s = max(len(re.findall(r"[.!?]+", t)), 1)
        sy = len(re.findall(r"[aeiouy]+", t.lower()))
        r = byid.loc[d["doc_id"]]
        assert r["n_words"] == w and r["n_sentences"] == s and r["n_syllables"] == sy
        if w == 0:
            assert pd.isna(r["flesch_ease"])
            continue
        ease = 206.835 - 1.015 * (w / s) - 84.6 * (sy / w)
        grade = 0.39 * (w / s) + 11.8 * (sy / w) - 15.59
        assert abs(r["flesch_ease"] - round(ease, 6)) < 2e-6
        assert abs(r["fk_grade"] - round(grade, 6)) < 2e-6


def test_readability_orders_simple_vs_complex(spark):
    """Construct a trivially readable doc and a polysyllabic monster; the
    scores must order them correctly."""
    import os
    import tempfile

    import pandas as pd

    from serene_spark.functions.sqlgen import SPARK as SPARK_D
    from serene_spark.operators.text_analysis import readability_sql

    simple = "The cat sat. The dog ran. It was fun. We all saw it. Good day."
    complex_ = ("Incomprehensibility characterizes institutionalized "
                "epistemological methodologies notwithstanding "
                "multidimensional organizational heterogeneity")
    df = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [simple, complex_],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [len(simple), len(complex_)],
        }
    )
    with tempfile.TemporaryDirectory() as dd:
        spark.createDataFrame(df).write.parquet(os.path.join(dd, "documents.parquet"))
        from serene_spark.catalog import register_views

        register_views(spark, dd, ("documents",))
        got = spark.sql(readability_sql(SPARK_D)).toPandas().set_index("doc_id")
    assert got.loc[1, "flesch_ease"] > 80          # plainly easy
    assert got.loc[2, "flesch_ease"] < 0           # off-scale hard
    assert got.loc[1, "fk_grade"] < 3
    assert got.loc[2, "fk_grade"] > 15


def test_gate_agreement_kappa_python_recheck(spark, sf_dir):
    """Cohen's kappa re-derived from the two gate queries' own outputs:
    the contingency cells must reconcile with the registered gates, and
    kappa must equal the textbook formula."""
    from serene_spark.registry import load_all

    qs = load_all()
    tq = qs["text_quality"].spark(spark, sf_dir).toPandas().set_index("doc_id")
    rep = qs["doc_repetition"].spark(spark, sf_dir).toPandas().set_index("doc_id")
    got = qs["gate_agreement_kappa"].spark(spark, sf_dir).toPandas().iloc[0]

    a = tq["quality_pass"].astype(int)
    b = rep["repetition_pass"].astype(int).reindex(a.index)
    n = len(a)
    n11 = int(((a == 1) & (b == 1)).sum())
    n10 = int(((a == 1) & (b == 0)).sum())
    n01 = int(((a == 0) & (b == 1)).sum())
    n00 = int(((a == 0) & (b == 0)).sum())
    assert (got.n, got.n11, got.n10, got.n01, got.n00) == (n, n11, n10, n01, n00)

    po = (n11 + n00) / n
    pe = (a.mean() * b.mean()) + ((1 - a.mean()) * (1 - b.mean()))
    kappa = (po - pe) / (1 - pe)
    assert abs(got.p_observed - round(po, 6)) <= 1e-6
    assert abs(got.p_expected - round(pe, 6)) <= 1e-6
    assert abs(got.kappa - round(kappa, 6)) <= 1e-6
    # bounded like any kappa
    assert -1.0 <= got.kappa <= 1.0
