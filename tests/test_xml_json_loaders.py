"""XML / DBPedia-style JSON / Freebase / Northix loaders (SURVEY §2.1) —
mirrors the reference's XmlDataLoaderSpec / DBPediaDataLoaderSpec /
FreebaseDataLoaderSpec / NorthixDataLoaderSpec fixtures."""

from __future__ import annotations

import json

from serene_spark.sources.json_loader import (
    load_dbpedia,
    load_freebase,
    load_northix,
    load_northix_labels,
)
from serene_spark.sources.xml_loader import flatten_xml_doc, load_xml

XML_A = """<person><name>Ann</name><contact><phone>123</phone><email>a@x.com</email></contact></person>"""
XML_B = """<person><name>Bob</name><contact><phone>456</phone></contact><age>30</age></person>"""


def test_flatten_reversed_paths_and_first_wins():
    pairs = dict(flatten_xml_doc(XML_A))
    assert pairs == {
        "name@person": "Ann",
        "phone@contact@person": "123",
        "email@contact@person": "a@x.com",
    }
    # repeated leaf path: first occurrence in document order wins
    dup = "<r><x>first</x><x>second</x></r>"
    assert dict(flatten_xml_doc(dup)) == {"x@r": "first"}
    # empty element becomes ""
    assert dict(flatten_xml_doc("<r><e></e></r>")) == {"e@r": ""}


def test_load_xml_union_fill(spark, tmp_path):
    d = tmp_path / "xml"
    d.mkdir()
    (d / "a.xml").write_text(XML_A)
    (d / "b.xml").write_text(XML_B)
    df = load_xml(spark, str(d))
    rows = {(r["doc"].rsplit("/", 1)[-1], r["attr_id"]): r["value"] for r in df.collect()}
    # union of attributes across docs; missing -> ""
    assert rows[("a.xml", "age@person")] == ""
    assert rows[("b.xml", "email@contact@person")] == ""
    assert rows[("b.xml", "age@person")] == "30"
    assert rows[("a.xml", "phone@contact@person")] == "123"
    attrs = {a for (_d, a) in rows}
    assert attrs == {
        "name@person", "phone@contact@person", "email@contact@person", "age@person",
    }
    # excludeElements drops by leaf name
    df2 = load_xml(spark, str(d), exclude_elements={"email"})
    assert "email@contact@person" not in {r["attr_id"] for r in df2.collect()}


def test_load_dbpedia_extract_modes(spark, tmp_path):
    d = tmp_path / "dbp"
    d.mkdir()
    entity = {
        "http://dbpedia.org/ontology/abstract": [
            {"lang": "de", "value": "Deutsch"},
            {"lang": "en", "value": "English abstract"},
        ],
        "http://dbpedia.org/property/origin": [{"value": "Sydney"}],
        "http://www.w3.org/2002/07/owl#sameAs": [
            {"value": "http://other.org/x"},
            {"value": "http://rdf.freebase.com/ns/m.123"},
        ],
    }
    (d / "e1.json").write_text(json.dumps(entity))
    rows = {r["attr_id"]: r["value"] for r in load_dbpedia(spark, str(d)).collect()}
    assert rows["abstract@dbpedia"] == "English abstract"  # lang == en
    assert rows["origin@dbpedia"] == "Sydney"              # head value
    assert rows["sameAs@dbpedia"] == "http://rdf.freebase.com/ns/m.123"  # substring
    assert rows["website@dbpedia"] == ""                   # absent field -> ""


def test_load_freebase_plain_fields(spark, tmp_path):
    d = tmp_path / "fb"
    d.mkdir()
    (d / "e1.json").write_text(json.dumps({"id": "/en/x", "mid": "/m/1", "name": "X"}))
    rows = {r["attr_id"]: r["value"] for r in load_freebase(spark, str(d)).collect()}
    assert rows["id@freebase"] == "/en/x"
    assert rows["name@freebase"] == "X"
    assert rows["origin@freebase"] == ""


def test_load_northix_layout(spark, tmp_path):
    d = tmp_path / "northix"
    d.mkdir()
    (d / "name@companies@db1").write_text("acme\nglobex\n")
    (d / "title@orgs@db2").write_text("ACME Inc\n")
    df = load_northix(spark, str(d))
    rows = [(r["db"], r["table"], r["attr_id"], r["value"]) for r in df.collect()]
    assert ("db1", "companies", "name@companies@db1", "acme") in rows
    assert ("db2", "orgs", "title@orgs@db2", "ACME Inc") in rows

    labels_root = tmp_path / "labels"
    (labels_root / "g1").mkdir(parents=True)
    (labels_root / "g1" / "name@companies@db1").write_text("")
    (labels_root / "g1" / "title@orgs@db2").write_text("")
    assert load_northix_labels(str(labels_root)) == [
        {"name@companies@db1", "title@orgs@db2"}
    ]


def test_xml_melt_query_runs(spark, sf_dir):
    from serene_spark.registry import load_all

    df = load_all()["xml_melt"].spark(spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0 and len(rows) % 4 == 0  # 4 leaves per document
    by_attr = {r["attr_id"] for r in rows}
    assert by_attr == {
        "name@customer", "segment@contact@customer",
        "acctbal@customer", "notes@customer",
    }


def test_xml_entity_bomb_rejected_by_expat():
    """Billion-laughs guard: the flattener parses untrusted XML inside a
    mapInPandas worker, so unbounded internal-entity amplification would
    be the same one-bad-blob-OOMs-an-executor class the media decoders
    guard against. CPython's bundled expat >= 2.4 enforces an
    amplification-factor cap by default — this pins that environmental
    assumption so a runtime downgrade (or a future parser swap) that
    silently removes the protection fails a test instead of an
    executor."""
    import pytest

    from serene_spark.sources.xml_loader import flatten_xml_doc

    ents = ['<!ENTITY a0 "AAAAAAAAAAAAAAAAAAAA">']
    for i in range(1, 9):
        ents.append(f'<!ENTITY a{i} "' + f"&a{i-1};" * 10 + '">')
    bomb = ('<?xml version="1.0"?>\n<!DOCTYPE r ['
            + "".join(ents) + ']>\n<r>&a8;</r>')  # ~2e9 chars if expanded
    assert len(bomb) < 600
    with pytest.raises(Exception, match="amplification|entity"):
        flatten_xml_doc(bomb)
