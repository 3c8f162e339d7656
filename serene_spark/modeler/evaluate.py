"""SSD evaluation (SURVEY §2.10/§2.11).

Reference: ``EvaluateOctopus.evaluate`` scores a predicted SSD against the
gold SSD as precision / recall / jaccard over their RDF-triple sets, with
flags to ignore semantic types (data-property triples) or column nodes
(modeler/.../EvaluateOctopus.scala:66-111). Pure set arithmetic — driver-side.
"""

from __future__ import annotations

from serene_spark.modeler.ssd import DATA_NODE, Ssd


def evaluate_ssd(
    predicted: Ssd,
    gold: Ssd,
    ignore_semantic_types: bool = False,
    ignore_column_nodes: bool = False,
) -> dict[str, float]:
    pt = _triples(predicted, ignore_semantic_types, ignore_column_nodes)
    gt = _triples(gold, ignore_semantic_types, ignore_column_nodes)
    inter = len(pt & gt)
    union = len(pt | gt)
    precision = inter / len(pt) if pt else 0.0
    recall = inter / len(gt) if gt else 0.0
    jaccard = inter / union if union else 1.0
    return {
        "precision": round(precision, 9),
        "recall": round(recall, 9),
        "jaccard": round(jaccard, 9),
    }


def _triples(ssd: Ssd, ignore_semantic_types: bool, ignore_column_nodes: bool):
    data_uris = {n.uri for n in ssd.semantic_model.nodes if n.node_type == DATA_NODE}
    out = set()
    for s, p, o in ssd.triples():
        is_data = o in data_uris
        if is_data and ignore_semantic_types:
            continue
        if ignore_column_nodes and is_data:
            out.add((s, p, "_column_"))  # keep the typing, drop the column id
        else:
            out.add((s, p, o))
    return out
