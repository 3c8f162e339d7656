"""Top-k semantic-model suggestion (SURVEY §2.10).

Reference flow (``KarmaSuggestModel.suggestModels``,
modeler/.../karma/KarmaSuggestModel.scala:569-680; ``PredictOctopus.predict``
modeler/.../PredictOctopus.scala:46-126):

1. matcher column predictions arrive as ``class---property`` labels with
   confidence scores; unknown-class and zero-score columns are dropped
   (unknownThreshold filter, PredictOctopus.scala:101-126);
2. each surviving column contributes candidate semantic types (top
   ``num_semantic_types`` scored (class, property) pairs,
   KarmaSuggestModel.scala:122-173);
3. candidate column→type mappings are enumerated (bounded by
   ``num_candidate_mappings`` / branching factor);
4. for each mapping the class nodes become Steiner terminals; top-k Steiner
   trees over the alignment graph give ranked models;
5. each ranked model is converted to an SSD + ``SemanticScores``
   (KarmaSuggestModel.scala:281-370; types/.../SsdPrediction.scala:34-62).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass

from serene_spark.modeler.alignment import AlignmentGraph
from serene_spark.modeler.ssd import (
    CLASS_NODE,
    DATA_NODE,
    DATA_PROPERTY,
    SemanticModel,
    Ssd,
    SsdLink,
    SsdNode,
)

UNKNOWN_CLASS = "unknown"  # reserved label (types/.../ModelTypes.scala:35)


@dataclass(frozen=True)
class ModelingProperties:
    """The modeler's full user-facing knob surface with the reference's
    defaults and validation rules (SsdTypes.scala:449-525; README "Modeling
    properties" table). Graph-inference booleans are consumed by
    ``AlignmentGraph``/``Ontology`` (nodeClosure/subclass/Thing handling);
    caps, weights, and the unknown threshold feed ``suggest_models``."""

    compatible_properties: bool = True
    ontology_alignment: bool = False
    add_ontology_paths: bool = False
    mapping_branching_factor: int = 50
    num_candidate_mappings: int = 10
    topk_steiner_trees: int = 10
    multiple_same_property: bool = False
    confidence_weight: float = 1.0
    coherence_weight: float = 1.0
    size_weight: float = 0.5
    num_semantic_types: int = 4
    thing_node: bool = False
    node_closure: bool = True
    properties_direct: bool = True
    properties_indirect: bool = True
    properties_subclass: bool = True
    properties_with_only_domain: bool = True
    properties_with_only_range: bool = True
    properties_without_domain_range: bool = False
    unknown_threshold: float = 0.5

    def graph_inference(self):
        """The Graph Builder flag block for ``AlignmentGraph`` —
        modeling.properties:17-37 wired through the user-facing knob object:
        ``AlignmentGraph(onto, inference=props.graph_inference())``."""
        from serene_spark.modeler.alignment import GraphInference

        return GraphInference(
            compatible_properties=self.compatible_properties,
            ontology_alignment=self.ontology_alignment,
            properties_direct=self.properties_direct,
            properties_indirect=self.properties_indirect,
            properties_subclass=self.properties_subclass,
            properties_with_only_domain=self.properties_with_only_domain,
            properties_with_only_range=self.properties_with_only_range,
            properties_without_domain_range=self.properties_without_domain_range,
            node_closure=self.node_closure,
            thing_node=self.thing_node,
        )

    def broken_rules(self) -> list[str]:
        """ModelingProperties.PropertyRules (SsdTypes.scala:475-525)."""
        rules = [
            (self.mapping_branching_factor > 0,
             "Property mappingBranchingFactor should be positive."),
            (self.num_candidate_mappings > 0,
             "Property numCandidateMappings should be positive."),
            (self.topk_steiner_trees > 0,
             "Property topkSteinerTrees should be positive."),
            (self.num_semantic_types > 0,
             "Property numSemanticTypes should be positive."),
            (0 <= self.confidence_weight <= 1,
             "Property confidenceWeight should be in range [0, 1]"),
            (0 <= self.coherence_weight <= 1,
             "Property coherenceWeight should be in range [0, 1]"),
            (0 < self.unknown_threshold <= 1,
             "Property unknownThreshold should be in range (0, 1]"),
            (0 <= self.size_weight <= 1,
             "Property sizeWeight should be in range [0, 1]"),
        ]
        return [msg for ok, msg in rules if not ok]


@dataclass(frozen=True)
class SemanticScores:
    """Ranking diagnostics (SsdPrediction.scala:34-62)."""

    link_cost: float
    node_confidence: float
    node_coverage: float
    karma_score: float
    karma_rank: int


def filter_predictions(
    predictions: dict[str, dict[str, float]], unknown_threshold: float = 0.0
) -> dict[str, dict[str, float]]:
    """Reference-exact column filter (PredictOctopus.scala:101-122):

    * the reserved unknown label is stripped from every score map (it is
      not in the ontology) — compared exactly, so a legitimate class
      named e.g. "unknownCarrier---name" survives;
    * a column is DISCARDED only when the unknown class is its argmax
      with score above ``unknown_threshold`` (the reference checks
      ``label == UknownClass && confidence > threshold``; our prediction
      shape has no separate label field, so argmax stands in for it), or
      when every remaining class score is zero;
    * sub-threshold CLASS scores are kept — the reference resets the
      column's label/confidence to the best remaining class
      (``filterScores.maxBy``), it never prunes individual scores. The
      unknown-max spec scenario (SuggestModelSpec.scala:527-556) turns
      red if they are pruned: {unknown 0.4, City 0.3, State 0.3} must
      survive as a 2-score column, not vanish.

    Tie policy (explicit, pinned in tests/test_modeler_golden.py): when
    the unknown score exactly TIES the best class score (``unk == best``
    with ``unk > threshold``) the column is DISCARDED. The reference's
    behavior on a tie is unspecified — it branches on which label the
    upstream argmax happened to pick, and Scala's ``Map.maxBy``
    iteration order on equal values is arbitrary — so this is a policy
    choice, not a parity fact. Discard-on-tie is chosen because an
    unknown score at least as large as every class score means the
    matcher has no positive evidence for ANY ontology class; a
    tie-break that keeps the column would label it with a class whose
    evidence is indistinguishable from "unknown"."""
    out: dict[str, dict[str, float]] = {}
    for col, scores in predictions.items():
        kept = {
            lbl: s
            for lbl, s in scores.items()
            if lbl.partition("---")[0] != UNKNOWN_CLASS
        }
        unk = max(
            (
                s
                for lbl, s in scores.items()
                if lbl.partition("---")[0] == UNKNOWN_CLASS
            ),
            default=0.0,
        )
        best = max(kept.values(), default=0.0)
        if unk > unknown_threshold and unk >= best:
            continue  # confidently-unknown column: discard
        if best > 0:
            out[col] = kept
    return out


def suggest_models(
    alignment: AlignmentGraph,
    predictions: dict[str, dict[str, float]],
    num_semantic_types: int = 4,
    num_candidate_mappings: int = 10,
    top_k: int = 10,
    unknown_threshold: float = 0.0,
    props: ModelingProperties | None = None,
) -> list[tuple[Ssd, SemanticScores]]:
    """Ranked SSD suggestions for one dataset.

    ``predictions``: column name → {"Class---property": confidence} (the
    matcher output shape, OctopusInterface.scala:580-660). Deterministic:
    candidate enumeration and ranking tie-break lexicographically.
    Passing ``props`` (the reference's ModelingProperties object) overrides
    the individual caps/threshold after validating its rules.
    """
    # Karma's scoring coefficients (modeling.properties:65-67 ships
    # confidence=1.0, coherence=1.0, size=0.5). The operational default
    # here runs size at 0.0 with LINK COST as the deterministic tie-break
    # instead: the size term penalizes a model for carrying one more
    # pattern-agreed (cheap but nonzero) link, which on the museum-29
    # noisy-matcher LOO is exactly how true classes get dropped — measured
    # size=0.0 lifts crm learned-types class recall 0.932 -> 0.962 (0.911
    # before the link-coherence rework) while the ground-truth gates stay
    # at crm 0.978 / edm 0.974 and every SuggestModelSpec golden ordering
    # holds via the tie-break. Passing ModelingProperties restores the
    # reference's documented 0.5 if a caller wants it.
    w_conf, w_coh, w_size = 1.0, 1.0, 0.0
    if props is not None:
        broken = props.broken_rules()
        if broken:
            raise ValueError("; ".join(broken))
        num_semantic_types = props.num_semantic_types
        num_candidate_mappings = min(props.num_candidate_mappings, props.mapping_branching_factor)
        top_k = props.topk_steiner_trees
        unknown_threshold = props.unknown_threshold
        w_conf, w_coh, w_size = (
            props.confidence_weight, props.coherence_weight, props.size_weight,
        )
    preds = filter_predictions(predictions, unknown_threshold)
    if not preds:
        return []

    # Per column: top-N candidate (class, property, confidence), best first.
    cand_types: dict[str, list[tuple[str, str, float]]] = {}
    for col, scores in sorted(preds.items()):
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        cands = []
        for lbl, s in ranked[:num_semantic_types]:
            cls, _, prop = lbl.partition("---")
            cands.append((cls, prop, s))
        cand_types[col] = cands

    cols = sorted(cand_types)
    # Candidate mappings in GENUINE best-first order by total confidence
    # (lazy k-best over the per-column candidate lists). A plain
    # itertools.product islice only ever varies the lexicographically-last
    # columns before the cap bites, so a second-ranked candidate on an
    # early column was never explored — on the museum-29 noisy-matcher
    # workload that alone cost ~4 points of class recall.
    mappings = _kbest_mappings(
        [cand_types[c] for c in cols], num_candidate_mappings
    )

    # Pass 1 — enumerate hypotheses with their raw components.
    hyps: list[tuple[Ssd, float, float, float]] = []  # ssd, cost, conf, link_coh
    seen_models: set[tuple[tuple[str, str, str], ...]] = set()
    for mapping in mappings:
        terminals = sorted({f"{cls}1" for cls, _p, _s in mapping})
        confidence = sum(s for _c, _p, s in mapping) / len(mapping)
        trees = alignment.top_k_steiner(terminals, k=top_k) or [([], 0.0)]
        for edges, link_cost in trees:
            if len(terminals) > 1 and not edges:
                # No connecting structure exists (empty/undertrained alignment
                # graph, or ontology missing): a multi-class model with no
                # links is not a model. The reference returns no suggestion in
                # this situation ("fails since there are no preloaded
                # ontologies" / "alignment graph is not constructed",
                # SuggestModelSpec.scala:321-352).
                continue
            key = tuple(edges) + tuple(f"{c}|{cls}|{p}" for c, (cls, p, _s) in zip(cols, mapping))
            if key in seen_models:
                continue
            seen_models.add(key)
            ssd = _build_ssd(cols, mapping, edges)
            # linkCoherence (Karma SortableSemanticModel.getLinkCoherence):
            # how strongly the tree's class-class links are supported by
            # known patterns. Alignment edge weights are 1/(1+seen_count)
            # for pattern links and 1.0 for inferred/unseen ones, so the
            # mean weight IS the un-supportedness; empty-edge (single
            # class) models are vacuously coherent.
            link_coh = 1.0 - (link_cost / len(edges)) if edges else 1.0
            hyps.append((ssd, link_cost, confidence, max(0.0, link_coh)))

    # Pass 2 — the reference's weighted blend (Karma SortableSemanticModel
    # ranking driven by scoring.{confidence,coherence,size}.coefficient,
    # ModelerConfig.scala:114-118, defaults modeling.properties:65-67):
    # confidence = mean type confidence, coherence = link pattern support,
    # sizeReduction = 1/(1+link_cost) — deliberately ABSOLUTE, not Karma's
    # across-the-batch min-max: batch normalization makes the ranking
    # depend on which competitors happen to be enumerated (measured on
    # museum-29: winners flip when top_k changes the batch), while the
    # absolute transform is stable and preserves the same ordering signal.
    suggestions: list[tuple[float, Ssd, float, float]] = []
    for ssd, link_cost, confidence, link_coh in hyps:
        size_red = 1.0 / (1.0 + link_cost)
        total_w = w_conf + w_coh + w_size
        karma = round(
            (w_conf * confidence + w_coh * link_coh + w_size * size_red)
            / (total_w if total_w > 0 else 1.0),
            9,
        )
        suggestions.append((karma, ssd, link_cost, confidence))

    # Cheapest (most pattern-supported) structure breaks karma ties — the
    # reference's golden expectations (SuggestModelSpec: known isPartOf /
    # location links beat alternatives at equal confidence) live on this
    # tie-break, while non-tied decisions stay with confidence+coherence.
    suggestions.sort(key=lambda t: (-t[0], t[2], t[1].semantic_model.to_json()))
    out = []
    for rank, (karma, ssd, link_cost, confidence) in enumerate(suggestions[:top_k], 1):
        covered = {n.uri for n in ssd.semantic_model.nodes if n.node_type == CLASS_NODE}
        out.append(
            (
                ssd,
                SemanticScores(
                    link_cost=round(link_cost, 9),
                    node_confidence=round(confidence, 9),
                    node_coverage=round(
                        len([n for n in ssd.semantic_model.nodes if n.node_type == DATA_NODE])
                        / max(len(covered), 1),
                        9,
                    ),
                    karma_score=karma,
                    karma_rank=rank,
                ),
            )
        )
    return out


def _kbest_mappings(
    cand_lists: list[list[tuple[str, str, float]]], k: int
) -> list[tuple[tuple[str, str, float], ...]]:
    """Top-``k`` full column→type mappings by TOTAL confidence — the lazy
    k-best cartesian product (heap over index vectors; each pop pushes its
    single-increment successors). Deterministic: ties break on the index
    vector itself. Cost O(k · n_cols · log k), never materializes the
    product."""
    import heapq

    if not cand_lists or any(not c for c in cand_lists):
        return []
    start = (0,) * len(cand_lists)

    def total(ix: tuple[int, ...]) -> float:
        return sum(cand_lists[c][i][2] for c, i in enumerate(ix))

    heap = [(-total(start), start)]
    seen = {start}
    out: list[tuple[tuple[str, str, float], ...]] = []
    while heap and len(out) < k:
        _neg, ix = heapq.heappop(heap)
        out.append(tuple(cand_lists[c][i] for c, i in enumerate(ix)))
        for c in range(len(ix)):
            if ix[c] + 1 < len(cand_lists[c]):
                nxt = ix[:c] + (ix[c] + 1,) + ix[c + 1:]
                if nxt not in seen:
                    seen.add(nxt)
                    heapq.heappush(heap, (-total(nxt), nxt))
    return out


def _build_ssd(
    cols: list[str],
    mapping: tuple[tuple[str, str, float], ...],
    edges: list[tuple[str, str, str]],
) -> Ssd:
    """Assemble the SSD: class nodes from the Steiner tree + mapped classes,
    one data node per column, data-property links column→class
    (KarmaSuggestModel.scala:281-370 conversion)."""
    uris: dict[str, int] = {}
    nodes: list[SsdNode] = []

    def class_node(uri: str) -> int:
        if uri not in uris:
            nid = len(nodes)
            label = uri.rstrip("0123456789") or uri
            idx = int(uri[len(label):] or 1)
            nodes.append(SsdNode(nid, label, CLASS_NODE, idx))
            uris[uri] = nid
        return uris[uri]

    links: list[SsdLink] = []
    for u, v, lbl in edges:
        links.append(SsdLink(class_node(u), class_node(v), lbl))
    mappings: dict[str, int] = {}
    for col, (cls, prop, _s) in zip(cols, mapping):
        cid = class_node(f"{cls}1")
        nid = len(nodes)
        nodes.append(SsdNode(nid, col, DATA_NODE))
        links.append(SsdLink(cid, nid, prop, DATA_PROPERTY))
        mappings[col] = nid
    return Ssd(
        name="suggested",
        attributes=list(cols),
        semantic_model=SemanticModel(nodes=nodes, links=links),
        mappings=mappings,
    )
