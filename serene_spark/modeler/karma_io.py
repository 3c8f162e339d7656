"""Karma semantic-model JSON loader (SURVEY §2.10, round-4 item #2).

The reference embeds the USC/ISI Karma library and reads its on-disk model
format — ``*.model.json`` files with ``{id, name, sourceColumns,
mappingToSourceColumns, graph:{nodes, links}}`` — via ``KarmaSSD.readJson``
(MuseumSpec.scala:55-67) and converts them to its own SSD type with
``KarmaSemanticModel.toSSD`` (MuseumSpec.scala:189-199;
types/.../KarmaSemanticModel in the reference). The 29-source museum
benchmark (modeler/src/test/resources/karma/museum/museum-29-{crm,edm})
ships in exactly this format.

This module is a from-scratch parser of that PUBLIC format (the files
themselves are read-only test INPUT — never copied into the repo):

- node types: ``InternalNode`` (an ontology class instance, id like
  ``http://...#E12_Production1`` — trailing digits disambiguate duplicate
  classes) and ``ColumnNode`` (a source column with
  ``userSemanticTypes``/``learnedSemanticTypes``);
- link types: ``ObjectPropertyLink`` (class→class),
  ``DataPropertyLink``/``ClassInstanceLink`` (class→column; ClassInstanceLink
  is Karma's ``classLink`` — the column holds the class instance URI itself);
- link ids encode ``sourceId---propertyUri---targetId``.

Everything driver-side: a Karma model is O(10-40) nodes.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field

from serene_spark.modeler.ssd import (
    CLASS_NODE,
    DATA_NODE,
    DATA_PROPERTY,
    OBJECT_PROPERTY,
    Ontology,
    SemanticModel,
    Ssd,
    SsdLink,
    SsdNode,
)

# Karma's classLink property URI (seen as the ``type.uri`` of
# ClassInstanceLink semantic types in the museum files).
CLASS_LINK_URI = "http://isi.edu/integration/karma/dev#classLink"

_TRAILING_INT = re.compile(r"(\d+)$")


def local_name(uri: str) -> str:
    """Local name of a URI: the fragment after ``#``, else after the last
    ``/`` (standard RDF prefix-stripping; Karma displays the same)."""
    if "#" in uri:
        return uri.rsplit("#", 1)[1]
    return uri.rstrip("/").rsplit("/", 1)[-1]


@dataclass(frozen=True)
class KarmaSemanticType:
    """One (domain class, property) annotation on a column
    (``userSemanticTypes`` / ``learnedSemanticTypes`` entries)."""

    domain_uri: str
    type_uri: str
    origin: str = "User"
    confidence: float = 1.0

    @property
    def is_class_link(self) -> bool:
        return self.type_uri == CLASS_LINK_URI


@dataclass
class KarmaModel:
    """One parsed ``*.model.json``: the source's columns, its semantic model
    re-expressed in the repo's ``SemanticModel`` type, and the per-column
    semantic-type annotations (the MuseumSpec.scala:70-93 extraction unit)."""

    name: str
    source_columns: list[tuple[str, str]]  # (hNodeId, columnName)
    semantic_model: SemanticModel
    # (columnName, hNodeId, first user sem-type domain uri, type uri) —
    # ("","") when the column carries no user annotation, matching the
    # reference's ``semTypes.isEmpty`` arm (MuseumSpec.scala:81-84).
    column_types: list[tuple[str, str, str, str]]
    # all annotations, keyed by hNodeId, for alignment/terminal derivation
    user_types: dict[str, list[KarmaSemanticType]] = field(default_factory=dict)
    learned_types: dict[str, list[KarmaSemanticType]] = field(default_factory=dict)
    # raw Karma link-type counts, for format-fidelity pins
    link_type_counts: dict[str, int] = field(default_factory=dict)
    # node id -> hNodeId for data nodes (column NAMES may repeat within a
    # source — e.g. two "values" columns in s05-met — so the name alone
    # cannot address a node)
    data_node_hids: dict[int, str] = field(default_factory=dict)

    def to_ssd(self) -> Ssd:
        """The ``KarmaSemanticModel.toSSD`` analog (MuseumSpec.scala:189-199):
        attributes = column names, mappings = column → its data node.

        ``Ssd.mappings`` is keyed by ATTRIBUTE NAME (SsdMapping parity), and
        real sources repeat column names (two "values" columns in s05-met) —
        a plain ``{label: id}`` dict would silently drop one mapping.
        Duplicate names are disambiguated deterministically in source-column
        order (``name``, ``name__2``, ...), applied consistently to the
        attribute list and the mapping keys via the hNodeId pairing, so
        every column keeps its own mapping."""
        seen: dict[str, int] = {}
        hid_to_attr: dict[str, str] = {}
        attributes: list[str] = []
        for hid, col in self.source_columns:
            k = seen.get(col, 0) + 1
            seen[col] = k
            attr = col if k == 1 else f"{col}__{k}"
            hid_to_attr[hid] = attr
            attributes.append(attr)
        mappings: dict[str, int] = {}
        for n in self.semantic_model.nodes:
            if n.node_type != DATA_NODE:
                continue
            hid = self.data_node_hids.get(n.id)
            mappings[hid_to_attr.get(hid, n.label)] = n.id
        return Ssd(
            name=self.name,
            attributes=attributes,
            semantic_model=self.semantic_model,
            mappings=mappings,
        )


def _parse_sem_type(d: dict) -> KarmaSemanticType:
    return KarmaSemanticType(
        domain_uri=(d.get("domain") or {}).get("uri", ""),
        type_uri=(d.get("type") or {}).get("uri", ""),
        origin=d.get("origin") or "User",
        confidence=float(d.get("confidenceScore") or 0.0),
    )


def load_karma_model(path: str) -> KarmaModel:
    """Parse one Karma ``*.model.json`` into a :class:`KarmaModel`."""
    with open(path, encoding="utf-8") as fh:
        doc = json.load(fh)
    graph = doc.get("graph") or {"nodes": [], "links": []}

    nodes: list[SsdNode] = []
    id_map: dict[str, int] = {}
    user_types: dict[str, list[KarmaSemanticType]] = {}
    learned_types: dict[str, list[KarmaSemanticType]] = {}
    column_types: list[tuple[str, str, str, str]] = []
    data_node_hids: dict[int, str] = {}

    for raw in graph["nodes"]:
        nid = len(nodes)
        karma_id = raw["id"]
        id_map[karma_id] = nid
        if raw.get("type") == "ColumnNode":
            col_name = raw.get("columnName") or local_name(karma_id)
            nodes.append(SsdNode(nid, col_name, DATA_NODE))
            h_id = raw.get("hNodeId") or karma_id
            data_node_hids[nid] = h_id
            user_types[h_id] = [
                _parse_sem_type(t) for t in (raw.get("userSemanticTypes") or [])
            ]
            learned_types[h_id] = [
                _parse_sem_type(t) for t in (raw.get("learnedSemanticTypes") or [])
            ]
            first = user_types[h_id][0] if user_types[h_id] else None
            column_types.append(
                (
                    col_name,
                    h_id,
                    first.domain_uri if first else "",
                    first.type_uri if first else "",
                )
            )
        else:  # InternalNode: class instance, trailing digits = dup index
            label_uri = (raw.get("label") or {}).get("uri", karma_id)
            label = local_name(label_uri)
            m = _TRAILING_INT.search(local_name(karma_id))
            index = int(m.group(1)) if m else 1
            nodes.append(SsdNode(nid, label, CLASS_NODE, index))

    links: list[SsdLink] = []
    link_type_counts: dict[str, int] = {}
    for raw in graph["links"]:
        src_id, _prop_uri, tgt_id = raw["id"].split("---")
        ktype = raw.get("type") or "ObjectPropertyLink"
        link_type_counts[ktype] = link_type_counts.get(ktype, 0) + 1
        label = local_name((raw.get("label") or {}).get("uri", _prop_uri))
        link_type = (
            OBJECT_PROPERTY if ktype == "ObjectPropertyLink" else DATA_PROPERTY
        )
        links.append(SsdLink(id_map[src_id], id_map[tgt_id], label, link_type))

    return KarmaModel(
        name=doc.get("name") or os.path.basename(path),
        source_columns=[
            (c.get("hNodeId") or c.get("id"), c.get("columnName", ""))
            for c in doc.get("sourceColumns") or []
        ],
        semantic_model=SemanticModel(nodes=nodes, links=links),
        column_types=column_types,
        user_types=user_types,
        learned_types=learned_types,
        link_type_counts=link_type_counts,
        data_node_hids=data_node_hids,
    )


def dump_karma_model(
    km: KarmaModel, namespace: str = "http://serene-spark/ontology#"
) -> str:
    """Serialize a :class:`KarmaModel` back to the Karma ``*.model.json``
    format — the inverse of :func:`load_karma_model`, so models edited or
    suggested by this engine can flow back into a user's existing Karma
    workspace (the reference round-trips through
    ``KarmaSemanticModel``/``toKarmaSemanticModel``).

    Class nodes whose labels are not already URIs are qualified with
    ``namespace``; column nodes keep their hNodeIds and annotations.
    """
    sm = km.semantic_model
    by_id = {n.id: n for n in sm.nodes}

    def class_uri(n: SsdNode) -> str:
        base = n.label if "://" in n.label else f"{namespace}{n.label}"
        return f"{base}{n.index}"

    def label_uri(n: SsdNode) -> str:
        return n.label if "://" in n.label else f"{namespace}{n.label}"

    def sem_type_json(t: KarmaSemanticType) -> dict:
        return {
            "domain": {"uri": t.domain_uri},
            "type": {"uri": t.type_uri},
            "origin": t.origin,
            "confidenceScore": t.confidence,
        }

    nodes_json = []
    node_karma_id: dict[int, str] = {}
    for n in sm.nodes:
        if n.node_type == CLASS_NODE:
            kid = class_uri(n)
            node_karma_id[n.id] = kid
            nodes_json.append(
                {
                    "id": kid,
                    "label": {"uri": label_uri(n)},
                    "type": "InternalNode",
                    "modelIds": None,
                }
            )
        else:
            h_id = km.data_node_hids.get(n.id, n.label)
            node_karma_id[n.id] = h_id
            nodes_json.append(
                {
                    "id": h_id,
                    "label": {"uri": h_id},
                    "type": "ColumnNode",
                    "hNodeId": h_id,
                    "columnName": n.label,
                    "rdfLiteralType": None,
                    "userSemanticTypes": [
                        sem_type_json(t) for t in km.user_types.get(h_id, [])
                    ],
                    "learnedSemanticTypes": [
                        sem_type_json(t) for t in km.learned_types.get(h_id, [])
                    ],
                    "modelIds": None,
                }
            )

    links_json = []
    for l in sm.links:
        tgt = by_id[l.target]
        prop_uri = l.label if "://" in l.label else f"{namespace}{l.label}"
        if tgt.node_type == CLASS_NODE:
            ktype = "ObjectPropertyLink"
        elif prop_uri == CLASS_LINK_URI or l.label == local_name(CLASS_LINK_URI):
            ktype, prop_uri = "ClassInstanceLink", CLASS_LINK_URI
        else:
            ktype = "DataPropertyLink"
        src_id, tgt_id = node_karma_id[l.source], node_karma_id[l.target]
        links_json.append(
            {
                "id": f"{src_id}---{prop_uri}---{tgt_id}",
                "weight": 1.0,
                "type": ktype,
                "label": {"uri": prop_uri},
                "objectPropertyType": "None",
                "status": "Normal",
                "keyInfo": "None",
                "modelIds": None,
            }
        )

    return json.dumps(
        {
            "id": km.name,
            "name": km.name,
            "description": None,
            "sourceColumns": [
                {"id": h, "hNodeId": h, "columnName": c}
                for h, c in km.source_columns
            ],
            "mappingToSourceColumns": [
                {"id": h, "sourceColumnId": h} for h, _c in km.source_columns
            ],
            "graph": {"nodes": nodes_json, "links": links_json},
        },
        indent=1,
    )


def load_karma_dir(dir_path: str) -> list[KarmaModel]:
    """All ``*.model.json`` under ``dir_path`` in name order — the
    MuseumSpec.scala:55-60 listing (``Params.MODEL_MAIN_FILE_EXT``)."""
    paths = sorted(
        os.path.join(dir_path, f)
        for f in os.listdir(dir_path)
        if f.endswith(".model.json")
    )
    return [load_karma_model(p) for p in paths]


def ontology_from_models(models: list[KarmaModel]) -> Ontology:
    """Derive a minimal ontology from the models themselves: every observed
    class becomes a class; every observed class→class link declares an object
    property with its observed (domain, range) pairs; class→column links
    declare data properties.

    The reference instead preloads full OWL files (museum-29-edm/
    preloaded-ontologies); deriving from the training models is the
    self-contained re-expression — the alignment closure then admits exactly
    the structures the corpus itself exhibits, which is what the
    leave-one-out museum gate measures.
    """
    onto = Ontology()
    for km in models:
        sm = km.semantic_model
        by_id = {n.id: n for n in sm.nodes}
        for n in sm.nodes:
            if n.node_type == CLASS_NODE:
                onto.classes.add(n.label)
        for l in sm.links:
            src, tgt = by_id[l.source], by_id[l.target]
            if src.node_type != CLASS_NODE:
                continue
            if tgt.node_type == CLASS_NODE:
                if l.label not in onto.object_properties:
                    onto.object_properties[l.label] = (src.label, tgt.label)
                else:
                    dom, _rng = onto.object_properties[l.label]
                    if src.label != dom:
                        onto.extra_domains.setdefault(l.label, set()).add(src.label)
            else:
                onto.data_properties.setdefault(l.label, src.label)
    return onto
