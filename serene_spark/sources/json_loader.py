"""Entity-JSON loaders (DBPedia / Freebase style) and the Northix benchmark
loader (SURVEY §2.1).

Reference:
- ``DBPediaDataLoader`` (matcher/.../ingestion/loader/DBPediaDataLoader.scala:14-113):
  one JSON document per entity; a hardcoded extractor list pulls attributes
  out of URI-keyed fields whose values are arrays of ``{lang, value}``
  objects — modes: HEAD value of the array, first ENGLISH (``lang == "en"``)
  value, first value CONTAINING a substring. Attribute ids ``name@dbpedia``.
- ``FreebaseDataLoader`` (FreebaseDataLoader.scala:14-111): same pattern with
  plain string fields (id, mid, name, type, ...), ids ``name@freebase``.
- ``NorthixDataLoader`` (NorthixDataLoader.scala:14-56): a directory of files
  named ``attr@table@db``, one value per line, loaded into a db → table →
  attribute tree; labels are directories of matched column-id sets.

Spark-first shape: ``spark.read.json(multiLine)`` distributes the parse;
extraction modes are pure Column expressions (``element_at`` / ``filter``
lambdas — JVM-side, no Python); Northix reads all column files in one
``spark.read.text`` and derives (attr, table, db) from ``input_file_name``.
Missing/unmatched values become ``""`` (the reference emits sentinel strings
like "NO LANG==EN"; the rebuild uses the empty string — documented
divergence, cleaner for downstream profiling).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HEAD = "head"          # first array element's .value
ENGLISH = "english"    # first element with lang == 'en'
SUBSTRING = "substring"  # first element whose .value contains arg
PLAIN = "plain"        # scalar string field


@dataclass(frozen=True)
class Extractor:
    name: str          # output attribute name
    field: str         # JSON field (URI key for DBPedia-style dumps)
    mode: str = HEAD
    arg: str | None = None


DBPEDIA_EXTRACTORS: tuple[Extractor, ...] = (
    Extractor("abstract", "http://dbpedia.org/ontology/abstract", ENGLISH),
    Extractor("givenName", "http://xmlns.com/foaf/0.1/givenName", ENGLISH),
    Extractor("origin", "http://dbpedia.org/property/origin", HEAD),
    Extractor("activeYearsEndYear", "http://dbpedia.org/ontology/activeYearsEndYear", HEAD),
    Extractor("dbpedia_id", "http://dbpedia.org/ontology/wikiPageID", HEAD),
    Extractor("birthDate", "http://dbpedia.org/property/birthDate", HEAD),
    Extractor("placeOfBirth", "http://dbpedia.org/property/birthPlace", HEAD),
    Extractor("yearsActive", "http://dbpedia.org/property/yearsActive", HEAD),
    Extractor("website", "http://dbpedia.org/property/website", HEAD),
    Extractor("occupation", "http://dbpedia.org/ontology/occupation", HEAD),
    Extractor("surname", "http://xmlns.com/foaf/0.1/surname", ENGLISH),
    Extractor("sameAs", "http://www.w3.org/2002/07/owl#sameAs", SUBSTRING, "freebase"),
)

FREEBASE_EXTRACTORS: tuple[Extractor, ...] = (
    Extractor("id", "id", PLAIN),
    Extractor("mid", "mid", PLAIN),
    Extractor("name", "name", PLAIN),
    Extractor("type", "type", PLAIN),
    Extractor("origin", "origin", PLAIN),
)


def _extract_expr(df: DataFrame, ex: Extractor):
    if ex.field not in df.columns:
        return F.lit("")
    col = F.col(f"`{ex.field}`")
    if ex.mode == PLAIN:
        return F.coalesce(col.cast("string"), F.lit(""))
    if ex.mode == HEAD:
        return F.coalesce(F.element_at(col, 1)["value"].cast("string"), F.lit(""))
    if ex.mode == ENGLISH:
        eng = F.filter(col, lambda x: x["lang"] == "en")
        return F.coalesce(F.element_at(eng, 1)["value"].cast("string"), F.lit(""))
    if ex.mode == SUBSTRING:
        hit = F.filter(col, lambda x: x["value"].contains(ex.arg or ""))
        return F.coalesce(F.element_at(hit, 1)["value"].cast("string"), F.lit(""))
    raise ValueError(f"unknown extractor mode {ex.mode!r}")


def load_entity_json(
    spark: SparkSession,
    path: str,
    extractors: tuple[Extractor, ...],
    database_id: str,
) -> DataFrame:
    """Long-format ``(doc, attr_id, value)`` for one-entity-per-file JSON
    dumps; ``attr_id = name@database_id`` (DBPediaDataLoader.scala:95-113)."""
    df = spark.read.json(path, multiLine=True).withColumn(
        "doc", F.input_file_name()
    )
    pairs = []
    for ex in extractors:
        pairs.append(F.lit(f"{ex.name}@{database_id}"))
        pairs.append(_extract_expr(df, ex))
    return df.select(
        "doc", F.explode(F.create_map(*pairs)).alias("attr_id", "value")
    )


def load_dbpedia(spark: SparkSession, path: str) -> DataFrame:
    return load_entity_json(spark, path, DBPEDIA_EXTRACTORS, "dbpedia")


def load_freebase(spark: SparkSession, path: str) -> DataFrame:
    return load_entity_json(spark, path, FREEBASE_EXTRACTORS, "freebase")


# --- Northix ----------------------------------------------------------------

_NORTHIX_NAME_RE = r"([^/@]+)@([^/@]+)@([^/@]+)$"


def load_northix(spark: SparkSession, root: str) -> DataFrame:
    """Long-format ``(db, table, attr_id, value)`` from a Northix-layout
    directory (one ``attr@table@db`` file per column, one value per line)."""
    raw = spark.read.text(f"{root}/*@*@*").withColumn("f", F.input_file_name())
    return raw.select(
        F.regexp_extract("f", _NORTHIX_NAME_RE, 3).alias("db"),
        F.regexp_extract("f", _NORTHIX_NAME_RE, 2).alias("table"),
        F.concat_ws(
            "@",
            F.regexp_extract("f", _NORTHIX_NAME_RE, 1),
            F.regexp_extract("f", _NORTHIX_NAME_RE, 2),
            F.regexp_extract("f", _NORTHIX_NAME_RE, 3),
        ).alias("attr_id"),
        F.col("value"),
    )


def load_northix_labels(root: str) -> list[set[str]]:
    """BasicLabels: each subdirectory's file names form one matched-column
    set (NorthixDataLoader.loadLabels, :52-56). Driver-side: label metadata."""
    import os

    out = []
    for d in sorted(os.listdir(root)):
        full = os.path.join(root, d)
        if os.path.isdir(full):
            out.append(set(os.listdir(full)))
    return out
