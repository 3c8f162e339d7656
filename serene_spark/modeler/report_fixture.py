"""Golden modeler benchmark: the reference's flagship suggestion scenarios.

Two fixture families over the report-example ontology
(``report_ontology.ttl``; ref modeler/src/test/resources/ssd/
dataintegration_report_ontology.owl):

- the **businessInfo / getCities** scenario matrix of
  ``SuggestModelSpec.scala:321-582`` — full predictions, tied predictions,
  zero-score ("problematic") columns, unknown-dominated columns, discarded
  columns, missing columns, and the no-ontology / no-alignment failure
  modes;
- a **museum-29-style multi-model corpus** (``MuseumSpec.scala:54-99``;
  ``AlignmentGraphSpec.scala:102-333``): four known SSDs sharing classes,
  so link weights disagree (seen-twice < seen-once < ontology-only) and the
  Steiner search must rank competing structures, not merely connect one.

Tests (tests/test_modeler_golden.py) pin ranked structure per scenario —
alignment node/edge counts, top-1 mapping identity, score ordering — the
AlignmentGraphSpec/SuggestModelSpec assertion style. Three scenarios are
registered as rows-only queries (graph search is not SQL-expressible).

Everything is driver-side: ontologies and SSDs are O(10) objects. The
matcher half of the pipeline (RF scores at corpus scale) is exercised by
``octopus.py``; here the predictions are the controlled variable, exactly as
the reference's ``getBusinessDataSetPredictions`` fixtures hardcode them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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

REPORT_ONTOLOGY = load_ontology(
    os.path.join(os.path.dirname(__file__), "report_ontology.ttl")
)

# Matches the reference suite's unknownThreshold (SuggestModelSpec.scala:103).
UNKNOWN_THRESHOLD = 0.49


def _model(nodes, links) -> SemanticModel:
    return SemanticModel(
        nodes=[SsdNode(*n) for n in nodes], links=[SsdLink(*l) for l in links]
    )


# --- known SSDs --------------------------------------------------------------

# businessInfo.csv (ref ssd/businessInfo.ssd): company/ceo/city/state ->
# Organization -ceo-> Person, Organization -location-> City -isPartOf-> State.
BUSINESS_SSD = Ssd(
    name="businessInfo",
    attributes=["company", "ceo", "city", "state"],
    semantic_model=_model(
        nodes=[
            (0, "Organization", CLASS_NODE, 1),
            (1, "Person", CLASS_NODE, 1),
            (2, "City", CLASS_NODE, 1),
            (3, "State", CLASS_NODE, 1),
            (4, "company", DATA_NODE, 1),
            (5, "ceo", DATA_NODE, 1),
            (6, "city", DATA_NODE, 1),
            (7, "state", DATA_NODE, 1),
        ],
        links=[
            (0, 1, "ceo"),
            (0, 2, "location"),
            (2, 3, "isPartOf"),
            (0, 4, "name", DATA_PROPERTY),
            (1, 5, "name", DATA_PROPERTY),
            (2, 6, "name", DATA_PROPERTY),
            (3, 7, "name", DATA_PROPERTY),
        ],
    ),
    mappings={"company": 4, "ceo": 5, "city": 6, "state": 7},
)

# personalInfo (ref ssd/personalInfo.ssd in spirit): a person, their
# employer, and their birth city.
PERSONAL_SSD = Ssd(
    name="personalInfo",
    attributes=["p_name", "p_birth", "employer", "birth_city"],
    semantic_model=_model(
        nodes=[
            (0, "Person", CLASS_NODE, 1),
            (1, "Organization", CLASS_NODE, 1),
            (2, "City", CLASS_NODE, 1),
            (3, "p_name", DATA_NODE, 1),
            (4, "p_birth", DATA_NODE, 1),
            (5, "employer", DATA_NODE, 1),
            (6, "birth_city", DATA_NODE, 1),
        ],
        links=[
            (0, 1, "worksFor"),
            (0, 2, "bornIn"),
            (0, 3, "name", DATA_PROPERTY),
            (0, 4, "birthDate", DATA_PROPERTY),
            (1, 5, "name", DATA_PROPERTY),
            (2, 6, "name", DATA_PROPERTY),
        ],
    ),
    mappings={"p_name": 3, "p_birth": 4, "employer": 5, "birth_city": 6},
)

# events: an event organized by a person who works for an organization.
EVENTS_SSD = Ssd(
    name="eventsInfo",
    attributes=["ev_start", "ev_end", "organizer_name", "venue_city", "host_org"],
    semantic_model=_model(
        nodes=[
            (0, "Event", CLASS_NODE, 1),
            (1, "Person", CLASS_NODE, 1),
            (2, "City", CLASS_NODE, 1),
            (3, "Organization", CLASS_NODE, 1),
            (4, "ev_start", DATA_NODE, 1),
            (5, "ev_end", DATA_NODE, 1),
            (6, "organizer_name", DATA_NODE, 1),
            (7, "venue_city", DATA_NODE, 1),
            (8, "host_org", DATA_NODE, 1),
        ],
        links=[
            (0, 1, "organizer"),
            (0, 2, "location"),
            (1, 3, "worksFor"),
            (0, 4, "startDate", DATA_PROPERTY),
            (0, 5, "endDate", DATA_PROPERTY),
            (1, 6, "name", DATA_PROPERTY),
            (2, 7, "name", DATA_PROPERTY),
            (3, 8, "name", DATA_PROPERTY),
        ],
    ),
    mappings={
        "ev_start": 4,
        "ev_end": 5,
        "organizer_name": 6,
        "venue_city": 7,
        "host_org": 8,
    },
)

# residents: people born in cities that are part of states.
RESIDENTS_SSD = Ssd(
    name="residents",
    attributes=["r_name", "r_city", "r_postcode", "r_state"],
    semantic_model=_model(
        nodes=[
            (0, "Person", CLASS_NODE, 1),
            (1, "City", CLASS_NODE, 1),
            (2, "State", CLASS_NODE, 1),
            (3, "r_name", DATA_NODE, 1),
            (4, "r_city", DATA_NODE, 1),
            (5, "r_postcode", DATA_NODE, 1),
            (6, "r_state", DATA_NODE, 1),
        ],
        links=[
            (0, 1, "bornIn"),
            (1, 2, "isPartOf"),
            (0, 3, "name", DATA_PROPERTY),
            (1, 4, "name", DATA_PROPERTY),
            (1, 5, "postalCode", DATA_PROPERTY),
            (2, 6, "name", DATA_PROPERTY),
        ],
    ),
    mappings={"r_name": 3, "r_city": 4, "r_postcode": 5, "r_state": 6},
)

MUSEUM_STYLE_SSDS = (BUSINESS_SSD, PERSONAL_SSD, EVENTS_SSD, RESIDENTS_SSD)


def business_alignment() -> AlignmentGraph:
    """One known model + ontology closure — the SuggestModelSpec setting
    (constructKarmaSuggestModel, SuggestModelSpec.scala:295-318)."""
    return AlignmentGraph(REPORT_ONTOLOGY).construct_initial_alignment(
        [BUSINESS_SSD.semantic_model]
    )


def museum_alignment() -> AlignmentGraph:
    """Four known models sharing classes — the museum-29 setting in
    miniature: link weights now encode cross-model agreement
    (worksFor/bornIn/isPartOf seen twice -> 1/3; ceo/location/organizer seen
    once -> 1/2; everything else ontology-only -> 1.0)."""
    return AlignmentGraph(REPORT_ONTOLOGY).construct_initial_alignment(
        [ssd.semantic_model for ssd in MUSEUM_STYLE_SSDS]
    )


# --- prediction fixtures (SuggestModelSpec.scala:112-258) --------------------

# getBusinessDataSetPredictions: one confident type per column.
BUSINESS_PREDICTIONS: dict[str, dict[str, float]] = {
    "company": {"Organization---name": 0.5},
    "ceo": {"Person---name": 1.0},
    "city": {"City---name": 1.0},
    "state": {"State---name": 1.0},
}

# getCitiesDataSetPredictions: two columns, each TIED between City and State.
CITIES_TIED_PREDICTIONS: dict[str, dict[str, float]] = {
    "city1": {"City---name": 0.5, "State---name": 0.5},
    "city2": {"City---name": 0.5, "State---name": 0.5},
}

# getProblematicCitiesDataSetPredictions: second column scores all zero.
CITIES_PROBLEMATIC_PREDICTIONS: dict[str, dict[str, float]] = {
    "city1": {"City---name": 0.5, "State---name": 0.5},
    "city2": {"City---name": 0.0, "State---name": 0.0},
}

# getDiscardCitiesDataSetPredictions: second column is confidently unknown.
CITIES_DISCARD_PREDICTIONS: dict[str, dict[str, float]] = {
    "city1": {"City---name": 0.5, "State---name": 0.5},
    "city2": {"unknown": 1.0, "City---name": 0.0, "State---name": 0.0},
}

# getUnknownCitiesDataSetPredictions: second column carries a LOW unknown
# score beside real class scores — the unknown label is stripped, both
# columns survive filtering (SuggestModelSpec.scala:484-525).
CITIES_UNKNOWN_PREDICTIONS: dict[str, dict[str, float]] = {
    "city1": {"City---name": 0.5, "State---name": 0.5},
    "city2": {"unknown": 0.1, "City---name": 0.4, "State---name": 0.5},
}

# getUnknownMaxCitiesDataSetPredictions: unknown is the ARGMAX of the
# second column but below the threshold — the filter must reset the
# column to its best class scores (both sub-threshold!), not discard it
# (SuggestModelSpec.scala:527-556: filtered size 2, then 4 suggestions).
CITIES_UNKNOWN_MAX_PREDICTIONS: dict[str, dict[str, float]] = {
    "city1": {"City---name": 0.5, "State---name": 0.5},
    "city2": {"unknown": 0.4, "City---name": 0.3, "State---name": 0.3},
}

# getCitiesDataSetPredictions2 (SuggestModelSpec.scala:164-180): the
# ASYMMETRIC matcher output — city1 prefers City---name 0.6/0.4, city2
# prefers State---name 0.6/0.4. The one cities scenario where the ranked
# order is fully determined by scores, which is what makes it the
# order-pin fixture (the reference asserts 10 suggestions, all complete
# and consistent, SuggestModelSpec.scala:790-814).
CITIES_ASYMMETRIC_PREDICTIONS: dict[str, dict[str, float]] = {
    "city1": {"City---name": 0.6, "State---name": 0.4},
    "city2": {"City---name": 0.4, "State---name": 0.6},
}

# Museum-family scenario matrix over a new "employees" source
# (SuggestModelSpec's correct / wrong / unknown / missing variants).
EMPLOYEE_PREDICTIONS: dict[str, dict[str, float]] = {
    "emp_name": {"Person---name": 0.9},
    "emp_birth": {"Person---birthDate": 0.85},
    "company": {"Organization---name": 0.8},
    "city": {"City---name": 0.75},
}


def employee_predictions_wrong_type() -> dict[str, dict[str, float]]:
    """The matcher mistypes the city column as a State name."""
    preds = {k: dict(v) for k, v in EMPLOYEE_PREDICTIONS.items()}
    preds["city"] = {"State---name": 0.75}
    return preds


def employee_predictions_unknown() -> dict[str, dict[str, float]]:
    """The company column is dominated by the reserved unknown class."""
    preds = {k: dict(v) for k, v in EMPLOYEE_PREDICTIONS.items()}
    preds["company"] = {"unknown": 0.9, "Organization---name": 0.05}
    return preds


def employee_predictions_missing() -> dict[str, dict[str, float]]:
    """The company column never reaches the modeler at all."""
    return {k: dict(v) for k, v in EMPLOYEE_PREDICTIONS.items() if k != "company"}


# --- scenario runners --------------------------------------------------------


def suggest_business(top_k: int = 10):
    return suggest_models(
        business_alignment(),
        BUSINESS_PREDICTIONS,
        top_k=top_k,
        unknown_threshold=UNKNOWN_THRESHOLD,
    )


def suggest_cities(predictions=None, top_k: int = 10):
    return suggest_models(
        business_alignment(),
        CITIES_TIED_PREDICTIONS if predictions is None else predictions,
        top_k=top_k,
        unknown_threshold=UNKNOWN_THRESHOLD,
    )


def suggest_employees(predictions=None, top_k: int = 10):
    return suggest_models(
        museum_alignment(),
        EMPLOYEE_PREDICTIONS if predictions is None else predictions,
        top_k=top_k,
        unknown_threshold=UNKNOWN_THRESHOLD,
    )


def _suggestions_df(spark: SparkSession, suggestions) -> DataFrame:
    rows = []
    for ssd, scores in suggestions:
        for s, p, o in sorted(ssd.triples()):
            rows.append(
                (
                    scores.karma_rank,
                    float(scores.karma_score),
                    float(scores.link_cost),
                    s,
                    p,
                    o,
                )
            )
    return spark.createDataFrame(
        rows,
        "rank int, karma_score double, link_cost double, "
        "subj string, pred string, obj string",
    ).orderBy("rank", "subj", "pred", "obj")


@register(
    "ssd_suggest_business",
    oracle=None,  # graph search is not SQL-expressible; rows-only check
    doc="golden modeler benchmark: businessInfo.csv suggestion over the "
    "report ontology (SuggestModelSpec.scala:354-380 analog), ranked triples",
)
def ssd_suggest_business(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _suggestions_df(spark, suggest_business())


@register(
    "ssd_suggest_cities_tied",
    oracle=None,
    doc="golden modeler benchmark: getCities.csv with tied City/State "
    "predictions -> one suggestion per competing mapping "
    "(SuggestModelSpec.scala:445-467 analog), ranked triples",
)
def ssd_suggest_cities_tied(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _suggestions_df(spark, suggest_cities())


@register(
    "ssd_suggest_museum",
    oracle=None,
    doc="golden modeler benchmark: museum-29-style 4-model alignment; "
    "suggestion must prefer links seen in more known models "
    "(MuseumSpec/AlignmentGraphSpec analog), ranked triples",
)
def ssd_suggest_museum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _suggestions_df(spark, suggest_employees())
