"""Labels loaders (SURVEY §2.1): semantic-type labels plus the legacy
positive-only / pos-and-ambiguous label sets.

Reference: matcher/.../ingestion/loader/LabelsLoader.scala —
``SemanticTypeLabelsLoader`` (:32-75) walks a file or directory recursively
(dot-files excluded), drops each file's header line, and accepts two row
shapes: 2-column manual labels ``attr_id,class`` and 6-column predicted
labels ``attr_id,predicted,confidence,date_predicted,actual,date_validated``
where rows whose ``actual`` field is ``"?"`` (not yet validated) are skipped.
Later files override earlier ones (the reference's ``Map ++`` fold); we make
that deterministic by ordering files lexicographically.
``PositiveOnlyLabelsLoader`` (:9-13) and ``PosAndAmbigLabelsLoader``
(:15-30) parse ``#``-commented line-sets for the legacy unsupervised matcher.

Scale note: a labels file has one row per COLUMN of a dataset — column
metadata, not data — so parsing is driver-side like the reference
(SURVEY §2.7 note on header metadata); the result is handed to Spark as a
small DataFrame for joining against profiled features. The 100 TB scaling
axis is table rows, which never flow through here.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

UNKNOWN_CLASS = "unknown"
_DOTFILE = re.compile(r"^\..*$")

LABEL_SCHEMA = (
    "attr_id string, class string, label_type string, confidence double, "
    "date_predicted string, actual_class string, date_validated string"
)


@dataclass(frozen=True)
class SemanticTypeLabel:
    attr_id: str
    cls: str
    label_type: str = "manual"  # ManualSemanticTypeLabel | PredictedSemanticTypeLabel
    confidence: float | None = None
    date_predicted: str | None = None
    actual_class: str | None = None
    date_validated: str | None = None


def _parse_line(line: str) -> SemanticTypeLabel | None:
    tokens = line.rstrip("\n").split(",")
    if len(tokens) == 2:
        return SemanticTypeLabel(tokens[0], tokens[1])
    if len(tokens) == 6:
        if tokens[4] == "?":  # unvalidated prediction — skip (LabelsLoader.scala:62-66)
            return None
        return SemanticTypeLabel(
            tokens[0], tokens[4], "predicted", float(tokens[2]), tokens[3], tokens[4], tokens[5]
        )
    return None


def _label_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    out: list[str] = []
    for root, dirs, files in os.walk(path):
        dirs[:] = sorted(d for d in dirs if not _DOTFILE.match(d))
        out.extend(os.path.join(root, f) for f in sorted(files) if not _DOTFILE.match(f))
    return out


def load_semantic_type_labels(path: str) -> dict[str, SemanticTypeLabel]:
    """File-or-directory recursive load; per-file header drop; last file wins
    per attr_id (deterministic lexicographic order)."""
    labels: dict[str, SemanticTypeLabel] = {}
    for f in _label_files(path):
        with open(f, encoding="utf-8") as fh:
            for line in list(fh)[1:]:  # drop(1): header
                lab = _parse_line(line)
                if lab is not None:
                    labels[lab.attr_id] = lab
    return labels


def find_label(labels: dict[str, SemanticTypeLabel], attr_id: str) -> str:
    """``SemanticTypeLabels.findLabel`` (Labels.scala:45-61): missing → the
    reserved "unknown" class (ModelTypes.scala:35)."""
    lab = labels.get(attr_id)
    return lab.cls if lab is not None else UNKNOWN_CLASS


def labels_df(spark: SparkSession, path: str) -> DataFrame:
    """The loaded labels as a Spark DataFrame (attr_id, class, provenance
    fields) ready to join against profiled columns. Adds ``column_name`` =
    the first ``@``-segment of attr_id (CsvDataLoader id scheme
    ``name@table@dataset``, split back per CSVDataWriter.scala:55-62)."""
    from pyspark.sql import functions as F

    rows = [
        (
            lab.attr_id,
            lab.cls,
            lab.label_type,
            lab.confidence,
            lab.date_predicted,
            lab.actual_class,
            lab.date_validated,
        )
        for lab in load_semantic_type_labels(path).values()
    ]
    df = spark.createDataFrame(rows, LABEL_SCHEMA)
    return df.withColumn("column_name", F.split(F.col("attr_id"), "@").getItem(0))


def load_positive_only(path: str) -> list[set[str]]:
    """``PositiveOnlyLabelsLoader`` (LabelsLoader.scala:9-13): each
    non-comment line is a set of attr ids that share a class."""
    out: list[set[str]] = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            if line.startswith("#") or not line.strip():
                continue
            out.append(set(line.rstrip("\n").split(",")))
    return out


_AMBIG = re.compile(r"\(\(([^()]*)\),\(([^()]*)\)\)")


def load_pos_and_ambig(pos_path: str, ambig_path: str):
    """``PosAndAmbigLabelsLoader`` (LabelsLoader.scala:15-30): positive sets
    plus ``((a,b),(c,d))`` ambiguous set-pairs; malformed lines → empty pair."""
    pos = load_positive_only(pos_path)
    ambig: list[tuple[set[str], set[str]]] = []
    with open(ambig_path, encoding="utf-8") as fh:
        for line in fh:
            if line.startswith("#") or not line.strip():
                continue
            m = _AMBIG.match(line.strip())
            if m:
                ambig.append((set(m.group(1).split(",")), set(m.group(2).split(","))))
            else:
                ambig.append((set(), set()))
    return pos, ambig
