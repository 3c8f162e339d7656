"""Property-based tests (hypothesis) over the pure string/distance kernels —
invariants the example-based suites can't sweep: metric axioms for the
distance functions, idempotence/closure for the stemmer and tokenizer, and
round-trips for the storage serializers."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from serene_spark.functions.stemmer import stem
from serene_spark.functions.tokenize import tokenize_name
from serene_spark.operators.class_features import _nw_distance
from serene_spark.operators.pair_features import _jaro

words = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=12)
names = st.text(alphabet=string.ascii_letters + string.digits + "_- ", max_size=24)


@settings(max_examples=300)
@given(names, names)
def test_jaro_axioms(a, b):
    s = _jaro(a, b)
    assert 0.0 <= s <= 1.0
    assert _jaro(b, a) == s          # symmetric
    assert _jaro(a, a) == 1.0        # identity


@settings(max_examples=200)
@given(names, names)
def test_nw_symmetric_and_bounded(a, b):
    d = _nw_distance(a, b)
    assert _nw_distance(b, a) == d
    assert 0.0 <= d <= 1.0
    if a:  # empty names carry the reference's no-metadata convention (1.0)
        assert _nw_distance(a, a) == 0.0
    else:
        assert _nw_distance(a, a) == 1.0


@settings(max_examples=300)
@given(words)
def test_stemmer_closed(w):
    # NOTE: Porter stemming is deliberately NOT idempotent ("agreed" ->
    # "agre" -> "agr" is canonical behavior), so only closure properties hold
    s = stem(w)
    assert s and s == s.lower()
    assert len(s) <= len(w)
    assert stem(w) == s              # deterministic


@settings(max_examples=300)
@given(names)
def test_tokenizer_closed(name):
    toks = tokenize_name(name)
    assert all(t == t.lower() and t for t in toks)
    # tokens contain only characters from the (lowercased) input
    pool = set(name.lower())
    assert all(set(t) <= pool for t in toks)


@settings(max_examples=100)
@given(
    st.dictionaries(
        st.text(alphabet=string.ascii_lowercase + "@", min_size=1, max_size=10),
        st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=10),
        max_size=8,
    )
)
def test_labels_roundtrip(labels):
    """A written manual-labels CSV loads back to the same mapping."""
    import tempfile

    from serene_spark.sources.labels_loader import load_semantic_type_labels

    with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
        f.write("attr_id,class\n")
        for k, v in labels.items():
            f.write(f"{k},{v}\n")
        path = f.name
    back = load_semantic_type_labels(path)
    assert {k: lab.cls for k, lab in back.items()} == labels
