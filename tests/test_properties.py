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


def _py_morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
def test_morton_sql_matches_reference_and_is_injective(pairs):
    """The generated Morton SQL (stats.py) must equal the bit-twiddling
    reference on both dialects' shared arithmetic, and be injective — the
    property Z-order file pruning relies on."""
    import duckdb

    from serene_spark.functions.sqlgen import DUCKDB
    from serene_spark.operators.stats import Z_BITS, _morton

    con = duckdb.connect()
    con.execute("CREATE TABLE pts (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pairs)
    got = dict(
        ((r[0], r[1]), r[2])
        for r in con.execute(
            f"SELECT x, y, {_morton(DUCKDB, 'x', 'y', Z_BITS)} FROM pts"
        ).fetchall()
    )
    want = {(x, y): _py_morton(x, y, Z_BITS) for x, y in pairs}
    assert got == want
    assert len(set(got.values())) == len(pairs)  # injective


# --- generated semantic-model round-trips (ssd_io / karma_io) ---------------

_cls_names = st.sampled_from(["Person", "Place", "Organization", "Event", "City"])
_prop_names = st.sampled_from(["name", "livesIn", "worksFor", "location", "phone"])
_attr_names = st.lists(
    st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8),
    min_size=1, max_size=5, unique=True,
)


@st.composite
def _semantic_models(draw):
    """A random small well-formed SSD: a chain of class nodes + one data
    node per attribute attached to a random class."""
    from serene_spark.modeler.ssd import (
        CLASS_NODE, DATA_NODE, DATA_PROPERTY, OBJECT_PROPERTY,
        SemanticModel, Ssd, SsdLink, SsdNode,
    )

    attrs = draw(_attr_names)
    n_cls = draw(st.integers(min_value=1, max_value=3))
    nodes, links = [], []
    for i in range(n_cls):
        nodes.append(SsdNode(i, draw(_cls_names), CLASS_NODE, index=i + 1))
    for i in range(1, n_cls):  # chain keeps the model connected
        links.append(SsdLink(i - 1, i, draw(_prop_names), OBJECT_PROPERTY))
    mappings = {}
    for a in attrs:
        nid = len(nodes)
        nodes.append(SsdNode(nid, a, DATA_NODE))
        owner = draw(st.integers(min_value=0, max_value=n_cls - 1))
        links.append(SsdLink(owner, nid, draw(_prop_names), DATA_PROPERTY))
        mappings[a] = nid
    return Ssd(
        name="gen.csv", attributes=attrs,
        semantic_model=SemanticModel(nodes=nodes, links=links),
        mappings=mappings,
    )


@settings(max_examples=100)
@given(_semantic_models())
def test_ssd_io_round_trip_generated(ssd):
    from serene_spark.modeler.ssd_io import dump_ssd, parse_ssd

    rt = parse_ssd(dump_ssd(ssd))
    assert rt.attributes == ssd.attributes
    assert rt.mappings == ssd.mappings
    assert rt.semantic_model.triples() == ssd.semantic_model.triples()
    assert rt.is_complete() == ssd.is_complete()


@settings(max_examples=100)
@given(_semantic_models())
def test_karma_io_round_trip_generated(ssd):
    import json

    from serene_spark.modeler.karma_io import KarmaModel, dump_karma_model

    km = KarmaModel(
        name=ssd.name,
        source_columns=[(a, a) for a in ssd.attributes],
        semantic_model=ssd.semantic_model,
        column_types=[],
    )
    text = dump_karma_model(km)
    json.loads(text)  # well-formed
    import tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".model.json", delete=False) as fh:
        fh.write(text)
        path = fh.name
    try:
        from serene_spark.modeler.karma_io import load_karma_model

        rt = load_karma_model(path)
    finally:
        os.unlink(path)
    assert rt.semantic_model.triples() == ssd.semantic_model.triples()
    assert [c for _h, c in rt.source_columns] == ssd.attributes
