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

from serene_spark.modeler.alignment import AlignmentGraph
from serene_spark.modeler.ssd import (
    CLASS_NODE,
    DATA_NODE,
    DATA_PROPERTY,
    Ontology,
    SemanticModel,
    Ssd,
    SsdLink,
    SsdNode,
)
from serene_spark.modeler.suggest import suggest_models
from serene_spark.registry import register

# --- domain ontology over the star schema -----------------------------------

ONTOLOGY = Ontology(
    classes={"Party", "Customer", "Supplier", "Order", "Nation", "Region"},
    subclass={"Customer": "Party", "Supplier": "Party"},
    object_properties={
        "placedBy": ("Order", "Customer"),
        "locatedIn": ("Party", "Nation"),
        "partOf": ("Nation", "Region"),
        "memberOf": ("Party", "Region"),  # alternative route: party→region direct
    },
    data_properties={
        "name": "Party",
        "acctBal": "Party",
        "key": "Party",
        "totalPrice": "Order",
        "orderDate": "Order",
    },
)


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

# Matcher-style predictions for supplier's columns: Class---property scores
# (in the full flow these come from the §2.9 RF pipeline over §2.3 features;
# fixed here so the query is deterministic for the driver's rows check).
SUPPLIER_PREDICTIONS: dict[str, dict[str, float]] = {
    "s_name": {"Supplier---name": 0.83, "Customer---name": 0.61, "unknown": 0.05},
    "s_acctbal": {"Supplier---acctBal": 0.77, "Order---totalPrice": 0.40},
    "s_nation_name": {"Nation---name": 0.91, "Region---name": 0.30},
}


def train_octopus() -> AlignmentGraph:
    """Alignment training half of octopus train (TrainOctopus.scala:37-60)."""
    return AlignmentGraph(ONTOLOGY).construct_initial_alignment(
        [CUSTOMER_SSD.semantic_model, ORDERS_SSD.semantic_model]
    )


def predict_supplier_ssd():
    alignment = train_octopus()
    return suggest_models(alignment, SUPPLIER_PREDICTIONS, top_k=3)


@register(
    "ssd_suggest_supplier",
    oracle=None,  # graph search is not SQL-expressible; rows-only check
    doc="SURVEY §2.10 octopus: alignment graph from known SSDs + ontology, "
    "top-k Steiner suggestion for supplier, flattened to ranked triples",
)
def ssd_suggest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = []
    for ssd, scores in predict_supplier_ssd():
        for s, p, o in sorted(ssd.triples()):
            rows.append((scores.karma_rank, float(scores.karma_score), s, p, o))
    return spark.createDataFrame(
        rows, "rank int, karma_score double, subj string, pred string, obj string"
    ).orderBy("rank", "subj", "pred", "obj")
