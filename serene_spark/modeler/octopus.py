"""Octopus end-to-end: alignment-train + SSD suggestion over the corpus
star schema (SURVEY §2.10, orchestration OctopusInterface.scala:219-540).

The TPC-H-ish domain plays the role of the reference's museum/businessInfo
fixtures: known SSDs describe ``customer`` and ``orders``; the octopus then
suggests a model for ``supplier`` whose columns got matcher-style
``Class---property`` scores. Registered as a rows-only query (graph search is
not SQL-expressible; the driver records the weaker check — SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

import os

from serene_spark.modeler.alignment import AlignmentGraph
from serene_spark.modeler.owl import load_ontology
from serene_spark.modeler.ssd import (
    CLASS_NODE,
    DATA_NODE,
    DATA_PROPERTY,
    SemanticModel,
    Ssd,
    SsdLink,
    SsdNode,
)
from serene_spark.modeler.suggest import suggest_models
from serene_spark.registry import register

# --- domain ontology over the star schema -----------------------------------
# Shipped as Turtle and parsed through the OWL loader (owl.py), mirroring the
# reference's upload-an-OWL-file flow (OwlAPI.scala:181) instead of a
# hand-built in-code ontology.

ONTOLOGY = load_ontology(os.path.join(os.path.dirname(__file__), "tpch_ontology.ttl"))


def _model(nodes, links) -> SemanticModel:
    return SemanticModel(
        nodes=[SsdNode(*n) for n in nodes], links=[SsdLink(*l) for l in links]
    )


# Known SSD 1: customer → nation → region.
CUSTOMER_SSD = Ssd(
    name="customer",
    attributes=["c_name", "c_acctbal", "n_name"],
    semantic_model=_model(
        nodes=[
            (0, "Customer", CLASS_NODE, 1),
            (1, "Nation", CLASS_NODE, 1),
            (2, "Region", CLASS_NODE, 1),
            (3, "c_name", DATA_NODE, 1),
            (4, "c_acctbal", DATA_NODE, 1),
            (5, "n_name", DATA_NODE, 1),
        ],
        links=[
            (0, 1, "locatedIn"),
            (1, 2, "partOf"),
            (0, 3, "name", DATA_PROPERTY),
            (0, 4, "acctBal", DATA_PROPERTY),
            (1, 5, "name", DATA_PROPERTY),
        ],
    ),
    mappings={"c_name": 3, "c_acctbal": 4, "n_name": 5},
)

# Known SSD 2: orders placed by customers located in nations.
ORDERS_SSD = Ssd(
    name="orders",
    attributes=["o_totalprice", "c_name", "n_name"],
    semantic_model=_model(
        nodes=[
            (0, "Order", CLASS_NODE, 1),
            (1, "Customer", CLASS_NODE, 1),
            (2, "Nation", CLASS_NODE, 1),
            (3, "o_totalprice", DATA_NODE, 1),
            (4, "c_name", DATA_NODE, 1),
            (5, "n_name", DATA_NODE, 1),
        ],
        links=[
            (0, 1, "placedBy"),
            (1, 2, "locatedIn"),
            (0, 3, "totalPrice", DATA_PROPERTY),
            (1, 4, "name", DATA_PROPERTY),
            (2, 5, "name", DATA_PROPERTY),
        ],
    ),
    mappings={"o_totalprice": 3, "c_name": 4, "n_name": 5},
)

def ssd_semantic_type_labels(ssd: Ssd) -> dict[str, str]:
    """Derive matcher training labels from an SSD's mappings: each mapped
    attribute gets ``Class---property`` from its incoming data-property link
    (OctopusInterface.getSemanticTypes, core/.../OctopusInterface.scala:580-660).
    """
    sm = ssd.semantic_model
    labels: dict[str, str] = {}
    for attr, node_id in ssd.mappings.items():
        for link in sm.links:
            if link.target == node_id and link.link_type == DATA_PROPERTY:
                labels[attr] = f"{sm.node(link.source).label}---{link.label}"
                break
    return labels


KNOWN_SSDS = (CUSTOMER_SSD, ORDERS_SSD)
# Tables whose columns are the lobster's training pool; columns an SSD maps
# carry Class---property labels, the rest train the reserved "unknown" class
# (ModelTypes.scala:35; HOWTO unknown-class threading).
TRAIN_TABLES = ("customer", "orders", "nation")
PREDICT_TABLE = "supplier"
# ModelingProperties.unknownThreshold semantics (SsdTypes.scala:449-525) —
# user-settable knob; demo value keeps s_acctbal's 0.2-confidence candidates.
UNKNOWN_THRESHOLD = 0.15


def octopus_training_labels() -> dict[str, str]:
    labels: dict[str, str] = {}
    for ssd in KNOWN_SSDS:
        labels.update(ssd_semantic_type_labels(ssd))
    return labels


def train_octopus() -> AlignmentGraph:
    """Alignment training half of octopus train (TrainOctopus.scala:37-60)."""
    return AlignmentGraph(ONTOLOGY).construct_initial_alignment(
        [ssd.semantic_model for ssd in KNOWN_SSDS]
    )


def train_lobster(spark: SparkSession, sf_dir: str):
    """Lobster (matcher) half of octopus train: fit the §2.9 RF on the
    known-SSD tables' profiled columns, labels derived from SSD mappings,
    unlabeled columns → "unknown" (ModelInterface.lobsterTraining,
    core/.../ModelInterface.scala:277). Returns ``(model, classes)``."""
    from serene_spark.catalog import load_table
    from serene_spark.functions.melt import melt
    from serene_spark.ml.pipeline import (
        profile_features_from_long,
        train_semantic_classifier,
    )

    labels = octopus_training_labels()
    train_long = None
    for t in TRAIN_TABLES:
        part = melt(load_table(spark, sf_dir, t))
        train_long = part if train_long is None else train_long.unionByName(part)
    feats = profile_features_from_long(spark, train_long)
    label_rows = [(c, labels.get(c, "unknown")) for t in TRAIN_TABLES
                  for c in load_table(spark, sf_dir, t).columns]
    labels_df = spark.createDataFrame(label_rows, "column_name string, class string")
    model, _conv = train_semantic_classifier(spark, feats.join(labels_df, "column_name"))
    classes = sorted(set(labels.values())) + ["unknown"]
    return model, classes


def supplier_predictions(
    spark: SparkSession, sf_dir: str, model=None, classes=None
) -> dict[str, dict[str, float]]:
    """Matcher half of octopus predict: score the target table's columns with
    the full reordered score map (MLibSemanticTypeClassifier.scala:68-103).
    Replaces the former hardcoded prediction dict — the matcher→modeler seam
    is now the reference's real flow (OctopusInterface.scala:491-540).
    """
    from serene_spark.catalog import load_table
    from serene_spark.functions.melt import melt
    from serene_spark.ml.pipeline import (
        predict_with_scores,
        profile_features_from_long,
    )

    if model is None:
        model, classes = train_lobster(spark, sf_dir)
    target = profile_features_from_long(
        spark, melt(load_table(spark, sf_dir, PREDICT_TABLE))
    )
    scored = predict_with_scores(model, target, classes)
    out: dict[str, dict[str, float]] = {}
    from serene_spark.ml.pipeline import score_column_name

    for row in scored.collect():  # O(#columns) rows — column metadata, not data
        out[row["column_name"]] = {
            cls: float(row[score_column_name(cls)]) for cls in classes
        }
    return out


def predict_supplier_ssd(spark: SparkSession, sf_dir: str):
    alignment = train_octopus()
    preds = supplier_predictions(spark, sf_dir)
    return suggest_models(
        alignment, preds, top_k=3, unknown_threshold=UNKNOWN_THRESHOLD
    )


@register(
    "ssd_suggest_supplier",
    oracle=None,  # graph search is not SQL-expressible; rows-only check
    doc="SURVEY §2.10 octopus end-to-end: RF matcher scores (trained from "
    "known-SSD labels) -> Class---property map -> alignment-graph Steiner "
    "suggestion for supplier, flattened to ranked triples",
)
def ssd_suggest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = []
    for ssd, scores in predict_supplier_ssd(spark, sf_dir):
        for s, p, o in sorted(ssd.triples()):
            rows.append((scores.karma_rank, float(scores.karma_score), s, p, o))
    return spark.createDataFrame(
        rows, "rank int, karma_score double, subj string, pred string, obj string"
    ).orderBy("rank", "subj", "pred", "obj")
