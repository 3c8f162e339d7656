"""Semantic-modeler subsystem (SURVEY §2.10) — driver-side graph algorithms.

The reference wraps the USC/ISI Karma library for alignment-graph
construction and top-k Steiner-tree model suggestion
(modeler/.../karma/KarmaBuildAlignmentGraph.scala,
modeler/.../karma/KarmaSuggestModel.scala). The graphs involved are tiny
(O(10^2) nodes — ontology classes + known-model nodes), so per SURVEY §1.4
the rebuild runs them driver-side in pure Python/networkx while all
data-scale work (column profiling, ML scoring) stays in Spark DataFrames.
"""

from serene_spark.modeler.ssd import (  # noqa: F401
    Ontology,
    SemanticModel,
    Ssd,
    SsdLink,
    SsdNode,
)
from serene_spark.modeler.alignment import AlignmentGraph  # noqa: F401
from serene_spark.modeler.suggest import SemanticScores, suggest_models  # noqa: F401
from serene_spark.modeler.evaluate import evaluate_ssd  # noqa: F401
