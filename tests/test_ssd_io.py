"""Reference .ssd format + real-file SuggestModelSpec scenarios
(modeler/ssd_io.py, modeler/report_real.py). All inputs are the reference's
own test resources, read read-only."""

from __future__ import annotations

import os

import pytest

from serene_spark.modeler.report_real import (
    REPORT_ONTOLOGY_TTL,
    SSD_DIR,
    predictions_from_ssd,
    real_report_ontology,
    real_ssd,
    suggest_business_real,
    suggest_cities_cross_real,
)
from serene_spark.modeler.ssd import CLASS_NODE, DATA_NODE
from serene_spark.modeler.ssd_io import dump_ssd, load_ssd, parse_ssd

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SSD_DIR), reason="reference ssd resources not mounted"
)


def _class_triples(sm):
    by = {n.id: n for n in sm.nodes}
    return {
        (by[l.source].uri, l.label, by[l.target].uri)
        for l in sm.links
        if by[l.source].node_type == CLASS_NODE and by[l.target].node_type == CLASS_NODE
    }


def test_load_all_reference_ssds_and_round_trip():
    """All 12 shipped .ssd files parse; the complete ones are complete; every
    file survives a dump->parse round trip (triples, mappings, attributes)."""
    expected_complete = {
        "businessInfo.ssd", "getCities.ssd", "personalInfo.ssd",
        "s03-ima-artists.ssd", "s07-s-13.json.ssd", "s08-s-17-edited.xml.ssd",
    }
    seen = set()
    for fname in sorted(os.listdir(SSD_DIR)):
        if not fname.endswith(".ssd"):
            continue
        seen.add(fname)
        s = load_ssd(os.path.join(SSD_DIR, fname))
        assert s.is_complete() == (fname in expected_complete), fname
        rt = parse_ssd(dump_ssd(s))
        assert rt.semantic_model.triples() == s.semantic_model.triples()
        assert rt.mappings == s.mappings and rt.attributes == s.attributes
    assert len(seen) == 12


def test_business_info_pinned_counts():
    """businessInfo.ssd: the exact counts Karma's alignment reports for it
    (8 vertices / 7 edges, SuggestModelSpec.scala:302-303) = 4 class + 4
    data nodes, 3 object + 4 data links."""
    s = real_ssd("businessInfo")
    sm = s.semantic_model
    assert sum(1 for n in sm.nodes if n.node_type == CLASS_NODE) == 4
    assert sum(1 for n in sm.nodes if n.node_type == DATA_NODE) == 4
    assert len(sm.nodes) == 8 and len(sm.links) == 7
    assert s.attributes == ["company", "ceo", "city", "state"]
    assert _class_triples(sm) == {
        ("Organization1", "ceo", "Person1"),
        ("Organization1", "location", "City1"),
        ("City1", "isPartOf", "State1"),
    }


def test_real_report_ontology_counts():
    """File-level contents of the actual report ontology: 6 classes, 9
    object properties, 7 data properties, City/State < Place. (Karma's
    manager reports 7/12/9 — it adds owl:Thing and internal inverse links
    on top of the file, SuggestModelSpec.scala:309-312.)"""
    onto = real_report_ontology()
    assert sorted(onto.classes) == [
        "City", "Event", "Organization", "Person", "Place", "State",
    ]
    assert len(onto.object_properties) == 9
    assert len(onto.data_properties) == 7
    assert onto.subclass == {"City": "Place", "State": "Place"}


def test_suggest_empty_business_real():
    """'Recommendation for empty businessInfo.csv succeeds'
    (SuggestModelSpec.scala:353-377): ONE suggestion, complete and
    consistent, confidence 1, all 4 attributes mapped, and the class-class
    structure is EXACTLY the known model's."""
    suggestions, known = suggest_business_real()
    assert len(suggestions) == 1
    ssd, scores = suggestions[0]
    assert ssd.is_complete()
    assert scores.node_confidence == 1.0 and scores.karma_rank == 1
    assert len(ssd.mappings) == 4
    assert _class_triples(ssd.semantic_model) == _class_triples(known.semantic_model)
    # each attribute hangs off the right class with the right property
    by_id = {n.id: n for n in ssd.semantic_model.nodes}
    attach = {}
    for l in ssd.semantic_model.links:
        if by_id[l.target].node_type == DATA_NODE:
            attach[by_id[l.target].label] = (by_id[l.source].uri, l.label)
    assert attach == {
        "company": ("Organization1", "name"),
        "ceo": ("Person1", "name"),
        "city": ("City1", "name"),
        "state": ("State1", "name"),
    }


def test_suggest_cities_cross_real():
    """'empty getCities.csv using personalInfo and businessInfo succeeds'
    (SuggestModelSpec.scala:770-800): the City--isPartOf--State link comes
    from the ontology closure (present in businessInfo, but the point is
    the structure connects the two predicted City/State columns)."""
    suggestions, target = suggest_cities_cross_real()
    assert len(suggestions) == 1
    ssd, scores = suggestions[0]
    assert ssd.is_complete()
    assert _class_triples(ssd.semantic_model) == {("City1", "isPartOf", "State1")}
    assert set(ssd.mappings) == {"city", "state"}


def test_predictions_from_ssd_shape():
    preds = predictions_from_ssd(real_ssd("personalInfo"))
    assert len(preds) == 5
    assert all(len(v) == 1 and max(v.values()) == 1.0 for v in preds.values())


def test_registered_real_queries(spark, sf_dir):
    from serene_spark.modeler.report_real import (
        ssd_suggest_business_real,
        ssd_suggest_cities_cross_real,
    )

    biz = ssd_suggest_business_real(spark, sf_dir).collect()
    assert len(biz) == 7  # 3 class-class + 4 data triples of the recovery
    cities = ssd_suggest_cities_cross_real(spark, sf_dir).collect()
    assert {(r.subj, r.pred, r.obj) for r in cities} >= {
        ("City1", "isPartOf", "State1")
    }


def test_evaluation_on_real_files_matches_spec_numbers():
    """EvaluateOctopus pins on the REAL files (SuggestModelSpec.scala:731-769):
    empty vs business (keep types, keep columns) -> all zero; partial vs
    business (keep types, ignore column nodes) -> precision 1.0, recall =
    jaccard = 4/7 (the spec's 2-dp 0.57)."""
    from serene_spark.modeler.evaluate import evaluate_ssd

    biz = real_ssd("businessInfo")
    empty = load_ssd(os.path.join(SSD_DIR, "empty_business.ssd"))
    partial = load_ssd(os.path.join(SSD_DIR, "partial_model.ssd"))

    zero = evaluate_ssd(empty, biz, False, False)
    assert zero == {"precision": 0.0, "recall": 0.0, "jaccard": 0.0}

    part = evaluate_ssd(partial, biz, False, True)
    assert part["precision"] == 1.0
    assert round(part["recall"], 2) == 0.57 and abs(part["recall"] - 4 / 7) < 1e-9
    assert round(part["jaccard"], 2) == 0.57
