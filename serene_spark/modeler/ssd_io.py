"""Reference ``.ssd`` JSON format loader/writer (SURVEY §2.10 data model).

The reference serializes semantic source descriptions as JSON with
``{version, id, name, attributes, ontologies, semanticModel:{nodes, links},
mappings, dateCreated, dateModified}`` (types/.../SsdTypes.scala:164-363;
real instances ship in modeler/src/test/resources/ssd/*.ssd — businessInfo,
getCities, personalInfo, the museum s03/s07/s08 conversions, and the
empty/partial variants SuggestModelSpec drives its scenarios with).

This module parses that PUBLIC format into the repo's :class:`Ssd` and
writes it back. Node types are ``ClassNode``/``DataNode``; class labels may
carry a trailing duplication index in Karma style (``Person1``) or not
(``Person`` = index 1); data-node labels are ``Class.property`` qualified
names. Links are ``ObjectPropertyLink``/``DataPropertyLink``/
``ClassInstanceLink`` (the latter maps to a data link, as in karma_io).
"""

from __future__ import annotations

import json

from serene_spark.modeler.ssd import (
    CLASS_NODE,
    DATA_NODE,
    DATA_PROPERTY,
    OBJECT_PROPERTY,
    SemanticModel,
    Ssd,
    SsdLink,
    SsdNode,
)

_SSD_VERSION = "0.1"


def _split_class_label(label: str) -> tuple[str, int]:
    """``Person`` -> (Person, 1); ``Person2`` -> (Person, 2)."""
    base = label.rstrip("0123456789")
    if base and base != label:
        return base, int(label[len(base):])
    return label, 1


def parse_ssd(text: str) -> Ssd:
    doc = json.loads(text)
    sm_doc = doc.get("semanticModel") or {"nodes": [], "links": []}
    nodes: list[SsdNode] = []
    for n in sm_doc["nodes"]:
        if n.get("type") == "ClassNode":
            label, idx = _split_class_label(n["label"])
            nodes.append(SsdNode(n["id"], label, CLASS_NODE, idx))
        else:
            nodes.append(SsdNode(n["id"], n["label"], DATA_NODE))
    links = [
        SsdLink(
            l["source"],
            l["target"],
            l["label"],
            OBJECT_PROPERTY if l.get("type") == "ObjectPropertyLink" else DATA_PROPERTY,
        )
        for l in sm_doc["links"]
    ]
    attr_names = {a["id"]: a["name"] for a in doc.get("attributes") or []}
    mappings = {
        attr_names.get(m["attribute"], str(m["attribute"])): m["node"]
        for m in doc.get("mappings") or []
    }
    return Ssd(
        name=doc.get("name") or "",
        attributes=[a["name"] for a in doc.get("attributes") or []],
        semantic_model=SemanticModel(nodes=nodes, links=links),
        mappings=mappings,
    )


def load_ssd(path: str) -> Ssd:
    with open(path, encoding="utf-8") as fh:
        return parse_ssd(fh.read())


def dump_ssd(ssd: Ssd, ssd_id: int = 0, ontologies: list[int] | None = None) -> str:
    """Serialize back to the reference's ``.ssd`` schema (attribute ids are
    positional; ``sql`` carries the reference's informational select)."""
    attrs = [
        {
            "id": i,
            "name": a,
            "label": "ident",
            "columnIds": [i],
            "sql": f"select {a} from '{ssd.name}'",
        }
        for i, a in enumerate(ssd.attributes)
    ]
    name_to_id = {a: i for i, a in enumerate(ssd.attributes)}
    sm = ssd.semantic_model
    nodes_json = [
        {
            "id": n.id,
            "label": n.uri if n.node_type == CLASS_NODE and n.index > 1 else n.label,
            "type": "ClassNode" if n.node_type == CLASS_NODE else "DataNode",
        }
        for n in sm.nodes
    ]
    links_json = [
        {
            "id": i,
            "source": l.source,
            "target": l.target,
            "label": l.label,
            "type": "ObjectPropertyLink"
            if l.link_type == OBJECT_PROPERTY
            else "DataPropertyLink",
        }
        for i, l in enumerate(sm.links)
    ]
    return json.dumps(
        {
            "version": _SSD_VERSION,
            "id": ssd_id,
            "name": ssd.name,
            "attributes": attrs,
            "ontologies": ontologies or [],
            "semanticModel": {"nodes": nodes_json, "links": links_json},
            "mappings": [
                {"attribute": name_to_id[a], "node": node_id}
                for a, node_id in sorted(
                    ssd.mappings.items(), key=lambda kv: name_to_id.get(kv[0], 0)
                )
                if a in name_to_id
            ],
            "dateCreated": "1970-01-01T00:00:00Z",
            "dateModified": "1970-01-01T00:00:00Z",
        },
        indent=1,
    )
