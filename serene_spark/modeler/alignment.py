"""Alignment-graph construction (SURVEY §2.10).

Reference: ``KarmaBuildAlignmentGraph.constructInitialAlignment`` merges the
known SSDs (as Karma models weighted by the JWS-paper formula) with the
ontology closure into one weighted directed multigraph; ``add``/``realign``
incrementally fold in new models
(modeler/.../karma/KarmaBuildAlignmentGraph.scala:103-216).

Rebuild: a networkx ``MultiDiGraph`` built driver-side. Weighting follows the
published Taheriyan/Knoblock JWS formula shape: links observed in known
models are cheap and get cheaper the more models agree —

    w(link) = 1 / (1 + count(link across known models))

— while links that exist only in the ontology carry a uniform high default
weight so the Steiner search prefers structures seen in training models and
falls back to ontology paths to connect novel classes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import networkx as nx

from serene_spark.modeler.ssd import (
    CLASS_NODE,
    Ontology,
    SemanticModel,
)

# Weight of a link present only in the ontology, never seen in a known model
# (Karma's default-link cost; keeps model-derived links strictly preferred).
ONTOLOGY_LINK_WEIGHT = 1.0

SUBCLASS_LINK = "subClassOf"
THING = "Thing"


@dataclass(frozen=True)
class GraphInference:
    """The reference's Graph Builder flag block (modeling.properties:17-37).

    ``compatible_properties`` is the always-on inference (links between
    class pairs compatible with a property's domain/range under the subclass
    closure); the fine-grained flags below only take effect when
    ``ontology_alignment`` is True — modeling.properties documents that the
    Graph Builder section is gated on ``ontology.alignment`` — with the
    reference's defaults:

    - ``properties_direct``: property's declared domain/range equal the
      node classes exactly;
    - ``properties_indirect``: property applies through INHERITANCE — the
      declared domain/range is an ancestor of the node's class;
    - ``properties_subclass``: materialize ``rdfs:subClassOf`` links between
      class nodes (child -> parent) so the search can route through the
      hierarchy;
    - ``properties_with_only_domain`` / ``properties_with_only_range``:
      admit properties whose range (resp. domain) is undeclared, toward
      (resp. from) any class;
    - ``properties_without_domain_range``: admit fully-undeclared
      properties between every class pair (reference default: off);
    - ``node_closure``: give every ontology class a node even if unseen in
      any known model;
    - ``thing_node``: add an ``owl:Thing`` node with subClassOf links from
      every root class.
    """

    compatible_properties: bool = True
    ontology_alignment: bool = False
    properties_direct: bool = True
    properties_indirect: bool = True
    properties_subclass: bool = True
    properties_with_only_domain: bool = True
    properties_with_only_range: bool = True
    properties_without_domain_range: bool = False
    node_closure: bool = True
    thing_node: bool = False


@dataclass
class AlignmentGraph:
    """Weighted class-level alignment graph.

    Nodes are class URIs (``Person1`` style — class label + duplication
    index); edges carry ``label`` (the object property) and ``weight``.
    Data nodes are NOT materialized here — column→class attachment happens at
    suggestion time (KarmaSuggestModel adds ColumnNodes per request,
    KarmaSuggestModel.scala:175-226).
    """

    ontology: Ontology
    graph: nx.MultiDiGraph = field(default_factory=nx.MultiDiGraph)
    inference: GraphInference = field(default_factory=GraphInference)
    _link_counts: dict[tuple[str, str, str], int] = field(default_factory=dict)

    def construct_initial_alignment(self, known: list[SemanticModel]) -> AlignmentGraph:
        """Merge known models, then close over the ontology
        (KarmaBuildAlignmentGraph.scala:103-150)."""
        for sm in known:
            self.add(sm)
        self._add_ontology_closure()
        return self

    def add(self, sm: SemanticModel) -> None:
        """Fold one known model in: count each class-to-class link and
        re-weight (KarmaBuildAlignmentGraph.scala:157-186)."""
        nodes = {n.id: n for n in sm.nodes}
        for link in sm.links:
            src, tgt = nodes[link.source], nodes[link.target]
            if src.node_type != CLASS_NODE or tgt.node_type != CLASS_NODE:
                continue  # data-property links are per-request, not alignment
            key = (src.uri, tgt.uri, link.label)
            self._link_counts[key] = self._link_counts.get(key, 0) + 1
            self.graph.add_node(src.uri, label=src.label)
            self.graph.add_node(tgt.uri, label=tgt.label)
            w = 1.0 / (1.0 + self._link_counts[key])
            self.graph.add_edge(src.uri, tgt.uri, key=link.label, label=link.label, weight=w)

    def _add_ontology_closure(self) -> None:
        """Add ontology object properties between compatible node pairs that
        are not already present, gated by the Graph Builder flags
        (modeling.properties:17-37; see ``GraphInference``). With
        ``ontology_alignment`` off (the reference default) every
        (sub)class-compatible pair links — the plain ``compatibleProperties``
        inference; with it on, direct/indirect/only-domain/only-range/
        no-domain-range matches are admitted individually and subClassOf /
        Thing structure can be materialized."""
        inf = self.inference
        if not inf.compatible_properties:
            return  # manual alignment: known-model links only
        # Every ontology class gets at least one node BEFORE property closure,
        # so classes unseen in known models (e.g. a new source's class) are
        # reachable terminals (nodeClosure).
        if inf.node_closure:
            for cls in self.ontology.classes:
                uri = f"{cls}1"
                if uri not in self.graph:
                    self.graph.add_node(uri, label=cls)
        if inf.ontology_alignment and inf.thing_node:
            self.graph.add_node(f"{THING}1", label=THING)
        for prop, dom, rng in self.ontology.property_specs():
            for u, du in list(self.graph.nodes(data=True)):
                for v, dv in list(self.graph.nodes(data=True)):
                    if u == v:
                        continue
                    if not self._admits(dom, du["label"], rng, dv["label"]):
                        continue
                    if not self.graph.has_edge(u, v, key=prop):
                        self.graph.add_edge(
                            u, v, key=prop, label=prop, weight=ONTOLOGY_LINK_WEIGHT
                        )
        if inf.ontology_alignment and inf.properties_subclass:
            # child -> parent subClassOf links (and roots -> Thing when on)
            for u, du in list(self.graph.nodes(data=True)):
                parent = self.ontology.subclass.get(du["label"])
                if parent is None and inf.thing_node and du["label"] != THING:
                    parent = THING
                if parent is None:
                    continue
                p_uri = f"{parent}1"
                if p_uri in self.graph and not self.graph.has_edge(
                    u, p_uri, key=SUBCLASS_LINK
                ):
                    self.graph.add_edge(
                        u, p_uri, key=SUBCLASS_LINK, label=SUBCLASS_LINK,
                        weight=ONTOLOGY_LINK_WEIGHT,
                    )

    def _admits(self, dom: str, src_cls: str, rng: str, dst_cls: str) -> bool:
        """Does the (dom, rng) declaration admit a link src_cls -> dst_cls
        under the active Graph Builder flags?"""
        inf = self.inference
        if not inf.ontology_alignment:
            # plain compatibleProperties: subclass-closed compatibility
            return self.ontology.compatible_domain(
                dom, src_cls
            ) and self.ontology.compatible_domain(rng, dst_cls)
        from serene_spark.modeler.ssd import OWL_THING

        dom_thing, rng_thing = dom == OWL_THING, rng == OWL_THING
        if dom_thing and rng_thing:
            return inf.properties_without_domain_range
        if dom_thing:
            return inf.properties_with_only_range and self._side_ok(rng, dst_cls)
        if rng_thing:
            return inf.properties_with_only_domain and self._side_ok(dom, src_cls)
        return self._side_ok(dom, src_cls) and self._side_ok(rng, dst_cls)

    def _side_ok(self, declared: str, cls: str) -> bool:
        """One side of a declared property: exact match needs
        properties_direct; inherited (declared class is an ancestor) needs
        properties_indirect."""
        inf = self.inference
        if declared == cls:
            return inf.properties_direct
        if declared in self.ontology.ancestors(cls):
            return inf.properties_indirect
        # includes Thing1: it participates only via explicitly-undeclared sides
        return False

    def realign(self, known: list[SemanticModel]) -> AlignmentGraph:
        """Rebuild from scratch over the CURRENT known-model set — required
        after ontology changes or SSD edits/deletes
        (KarmaBuildAlignmentGraph.scala:190-216 empties the learning graph
        and re-adds every model; incremental removal is not defined by the
        weight formula, since counts only grow). Equivalent to fresh
        construction by construction — pinned by golden-count tests."""
        self.graph = nx.MultiDiGraph()
        self._link_counts = {}
        return self.construct_initial_alignment(known)

    def export_json(self) -> str:
        """Serialize nodes + weighted labeled edges + model-agreement counts
        (the ``modelLearningGraph.exportJson()`` debugging artifact,
        KarmaBuildAlignmentGraph.scala:75-82). Round-trips via
        :meth:`import_json`."""
        import json

        return json.dumps(
            {
                "nodes": [
                    {"id": u, "label": d["label"]}
                    for u, d in sorted(self.graph.nodes(data=True))
                ],
                "edges": [
                    {
                        "source": u,
                        "target": v,
                        "label": d["label"],
                        "weight": d["weight"],
                        "count": self._link_counts.get((u, v, k), 0),
                    }
                    for u, v, k, d in sorted(self.graph.edges(keys=True, data=True))
                ],
            },
            sort_keys=True,
        )

    @classmethod
    def import_json(cls, s: str, ontology: Ontology) -> AlignmentGraph:
        """Restore an exported alignment graph (structure, weights, and
        agreement counts) over the given ontology."""
        import json

        d = json.loads(s)
        out = cls(ontology)
        for n in d["nodes"]:
            out.graph.add_node(n["id"], label=n["label"])
        for e in d["edges"]:
            out.graph.add_edge(
                e["source"], e["target"], key=e["label"],
                label=e["label"], weight=e["weight"],
            )
            if e["count"]:
                out._link_counts[(e["source"], e["target"], e["label"])] = e["count"]
        return out

    def export_graphviz(self) -> str:
        """DOT rendering (``modelLearningGraph.exportGraphviz()``,
        KarmaBuildAlignmentGraph.scala:75-82): class nodes as boxes, one edge
        per property with its weight — the debugging view for inspecting why
        a suggestion chose a structure."""
        lines = ["digraph alignment {", '  node [shape=box];']
        for u, d in sorted(self.graph.nodes(data=True)):
            lines.append(f'  "{u}" [label="{d["label"]}"];')
        for u, v, k, d in sorted(self.graph.edges(keys=True, data=True)):
            lines.append(
                f'  "{u}" -> "{v}" [label="{d["label"]} ({d["weight"]:g})"];'
            )
        lines.append("}")
        return "\n".join(lines)

    def undirected_weighted(self) -> nx.Graph:
        """Simple undirected view keeping, per node pair, the cheapest edge —
        the search graph for the Steiner heuristic."""
        g = nx.Graph()
        g.add_nodes_from(self.graph.nodes(data=True))
        for u, v, k, d in self.graph.edges(keys=True, data=True):
            if g.has_edge(u, v) and g[u][v]["weight"] <= d["weight"]:
                continue
            g.add_edge(u, v, weight=d["weight"], label=d["label"], src=u, dst=v)
        return g

    def steiner_tree(self, terminals: list[str]) -> tuple[list[tuple[str, str, str]], float]:
        """One minimum Steiner tree over ``terminals`` (class URIs), via the
        classic Kou-Markowsky-Berman metric-closure 2-approximation —
        equivalent in role to Karma's ``alignmentGraph.computeSteinerNodes`` +
        tree search (KarmaSuggestModel.scala:577-595).

        Returns (directed labeled edges, total weight).
        """
        g = self.undirected_weighted()
        terms = [t for t in terminals if t in g]
        if len(terms) <= 1 or not _same_component(g, terms):
            return [], 0.0
        st = nx.algorithms.approximation.steiner_tree(g, terms, weight="weight")
        edges, total = [], 0.0
        for u, v, d in st.edges(data=True):
            src, dst = d["src"], d["dst"]
            edges.append((src, dst, d["label"]))
            total += d["weight"]
        return sorted(edges), round(total, 9)

    def top_k_steiner(
        self, terminals: list[str], k: int = 10, penalty: float = 2.0
    ) -> list[tuple[list[tuple[str, str, str]], float]]:
        """Top-k distinct Steiner trees by iterative edge-penalization: after
        each tree, multiply its edges' weights by ``penalty`` and re-solve —
        a documented heuristic stand-in for Karma's ranked
        ``ModelLearner.hypothesize`` top-k enumeration
        (KarmaSuggestModel.scala:595-611; knob ``topkSteinerTrees``,
        SsdTypes.scala:449-471). Costs reported are against ORIGINAL weights.
        """
        base = {  # original weights for honest scoring
            (min(u, v), max(u, v)): d["weight"]
            for u, v, d in self.undirected_weighted().edges(data=True)
        }
        seen: set[tuple[tuple[str, str, str], ...]] = set()
        out: list[tuple[list[tuple[str, str, str]], float]] = []
        bumped: dict[tuple[str, str, str], float] = {}
        for _ in range(k * 3):  # a few extra rounds to skip duplicate trees
            if len(out) >= k:
                break
            edges, _ = self._steiner_with_bumps(terminals, bumped)
            key = tuple(edges)
            if not edges:
                break
            if key not in seen:
                seen.add(key)
                cost = sum(
                    base.get((min(u, v), max(u, v)), ONTOLOGY_LINK_WEIGHT)
                    for u, v, _lbl in edges
                )
                out.append((edges, round(cost, 9)))
            for e in edges:
                bumped[e] = bumped.get(e, 1.0) * penalty
        return sorted(out, key=lambda t: (t[1], t[0]))[:k]

    def _steiner_with_bumps(
        self, terminals: list[str], bumped: dict[tuple[str, str, str], float]
    ) -> tuple[list[tuple[str, str, str]], float]:
        g = self.undirected_weighted()
        for u, v, d in g.edges(data=True):
            f = bumped.get((d["src"], d["dst"], d["label"]))
            if f:
                d["weight"] *= f
        terms = [t for t in terminals if t in g]
        if len(terms) <= 1 or not _same_component(g, terms):
            return [], 0.0
        st = nx.algorithms.approximation.steiner_tree(g, terms, weight="weight")
        edges = sorted(
            (d["src"], d["dst"], d["label"]) for _, _, d in st.edges(data=True)
        )
        return edges, 0.0


def _same_component(g: nx.Graph, terms: list[str]) -> bool:
    """True when all terminals are mutually reachable. An alignment graph
    with no (or too few) known models and an edge-less ontology leaves class
    nodes disconnected — there is no connecting structure to find, which the
    suggestion layer reports as 'no suggestion' (the reference's Karma
    returns None in this situation, SuggestModelSpec.scala:321-352)."""
    it = iter(terms)
    first = next(it)
    reachable = nx.descendants(g, first) | {first}
    return all(t in reachable for t in it)
