"""Semantic Source Description (SSD) data model.

Mirrors the reference's JSON schema (types/.../SsdTypes.scala:164-363 —
``Ssd``/``SsdAttribute``/``SsdMapping``; types/.../SemanticModel.scala:74-172
— ``SsdNode``/``SsdLink`` with ClassNode/DataNode and
ObjectPropertyLink/DataPropertyLink kinds) as plain dataclasses with JSON
round-trip. No Spark here: SSDs describe O(10) columns each.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

CLASS_NODE = "ClassNode"
DATA_NODE = "DataNode"
OBJECT_PROPERTY = "ObjectPropertyLink"
DATA_PROPERTY = "DataPropertyLink"
# Local name of owl:Thing — a property domain/range that admits every class
# (Karma's thingNode / ontology-root behavior, modeling.properties knob).
OWL_THING = "Thing"


@dataclass(frozen=True)
class SsdNode:
    """A node in a semantic model: an ontology class instance or a data node.

    ``label`` is ``Class`` for class nodes (e.g. ``Person1`` → label
    ``Person``, index 1 distinguishes duplicate classes, matching Karma's
    node naming) and the attribute name for data nodes.
    """

    id: int
    label: str
    node_type: str = CLASS_NODE
    index: int = 1  # duplicate-class disambiguator (Person1, Person2, ...)

    @property
    def uri(self) -> str:
        return f"{self.label}{self.index}" if self.node_type == CLASS_NODE else self.label


@dataclass(frozen=True)
class SsdLink:
    source: int
    target: int
    label: str
    link_type: str = OBJECT_PROPERTY


@dataclass
class SemanticModel:
    """A small labeled directed graph (SemanticModel.scala:265)."""

    nodes: list[SsdNode] = field(default_factory=list)
    links: list[SsdLink] = field(default_factory=list)

    def node(self, node_id: int) -> SsdNode:
        for n in self.nodes:
            if n.id == node_id:
                return n
        raise KeyError(node_id)

    def triples(self) -> set[tuple[str, str, str]]:
        """(source_uri, link_label, target_uri) set — the comparison unit of
        SSD evaluation (EvaluateOctopus.scala:66-111 compares RDF triples)."""
        return {
            (self.node(l.source).uri, l.label, self.node(l.target).uri)
            for l in self.links
        }

    def to_json(self) -> str:
        return json.dumps(
            {
                "nodes": [
                    {"id": n.id, "label": n.label, "type": n.node_type, "index": n.index}
                    for n in self.nodes
                ],
                "links": [
                    {"source": l.source, "target": l.target, "label": l.label, "type": l.link_type}
                    for l in self.links
                ],
            },
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, s: str) -> SemanticModel:
        d = json.loads(s)
        return cls(
            nodes=[
                SsdNode(n["id"], n["label"], n["type"], n.get("index", 1))
                for n in d["nodes"]
            ],
            links=[
                SsdLink(l["source"], l["target"], l["label"], l["type"])
                for l in d["links"]
            ],
        )


@dataclass
class Ssd:
    """Semantic source description: columns of one dataset mapped onto a
    semantic model (SsdTypes.scala:164-229). ``mappings`` is attribute name →
    data-node id (SsdMapping, :358-363)."""

    name: str
    attributes: list[str]
    semantic_model: SemanticModel
    mappings: dict[str, int] = field(default_factory=dict)

    def is_complete(self) -> bool:
        """Every attribute mapped, every mapped node exists, model connected
        (the reference's consistency/completeness checks, SsdTypes.scala:181-229)."""
        node_ids = {n.id for n in self.semantic_model.nodes}
        if not all(a in self.mappings for a in self.attributes):
            return False
        if not all(m in node_ids for m in self.mappings.values()):
            return False
        return _is_connected(self.semantic_model)

    def triples(self) -> set[tuple[str, str, str]]:
        return self.semantic_model.triples()


def _is_connected(sm: SemanticModel) -> bool:
    if not sm.nodes:
        return True
    adj: dict[int, set[int]] = {n.id: set() for n in sm.nodes}
    for l in sm.links:
        adj[l.source].add(l.target)
        adj[l.target].add(l.source)
    seen = {sm.nodes[0].id}
    stack = [sm.nodes[0].id]
    while stack:
        for nb in adj[stack.pop()]:
            if nb not in seen:
                seen.add(nb)
                stack.append(nb)
    return len(seen) == len(sm.nodes)


@dataclass
class Ontology:
    """Minimal OWL-subset ontology: class hierarchy + typed properties.

    Stands in for the reference's Jena-loaded OWL store
    (types/.../SsdTypes.scala:117-160; modeling.properties inference knobs
    SURVEY §2.10). ``object_properties[label] = (domain_class, range_class)``;
    ``data_properties[label] = domain_class``; ``subclass[c] = parent``.
    """

    classes: set[str] = field(default_factory=set)
    object_properties: dict[str, tuple[str, str]] = field(default_factory=dict)
    data_properties: dict[str, str] = field(default_factory=dict)
    subclass: dict[str, str] = field(default_factory=dict)
    # Secondary rdfs:domain axioms for multi-domain properties (OWL allows
    # several; Karma adds a candidate link per domain). Primary domain stays
    # in ``object_properties`` so the common single-domain shape is unchanged.
    extra_domains: dict[str, set[str]] = field(default_factory=dict)

    def ancestors(self, cls: str) -> list[str]:
        out, cur = [], cls
        while cur in self.subclass:
            cur = self.subclass[cur]
            out.append(cur)
        return out

    def compatible_domain(self, prop_domain: str, cls: str) -> bool:
        """Class closure: a property applies to its domain class and all its
        subclasses; ``Thing`` admits every class (modeling.properties
        ``nodeClosure``/``subclass``/thingNode flags)."""
        if prop_domain == OWL_THING:
            return True
        return prop_domain == cls or prop_domain in self.ancestors(cls)

    def property_specs(self):
        """Yield ``(property, domain, range)`` once per declared domain —
        the unit the alignment-graph closure iterates."""
        for prop, (dom, rng) in sorted(self.object_properties.items()):
            yield prop, dom, rng
            for extra in sorted(self.extra_domains.get(prop, ())):
                if extra != dom:
                    yield prop, extra, rng
