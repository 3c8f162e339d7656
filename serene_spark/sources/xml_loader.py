"""XML ingestion with the reference loader's semantics (SURVEY §2.1).

Reference: ``XmlDataLoader``
(matcher/.../ingestion/loader/XmlDataLoader.scala:18-76): each XML file is one
instance (row); every leaf text node becomes an attribute whose id is the
REVERSED element path joined with ``@`` (``leaf@parent@root``); the dataset's
attribute set is the union across instances, with missing values filled as
``""``; when an instance repeats a leaf path, the FIRST occurrence in
document order wins; ``exclude_elements`` drops attributes by leaf name.

Spark-first shape: ``spark.read.text(wholetext)`` distributes one row per
file; flattening runs as an Arrow-batched ``mapInPandas`` over Python's
stdlib XML parser (no per-row Python UDF — documents are parsed per batch);
the union-of-attributes fill is a crossJoin of two tiny distinct sets plus a
left join — all relational, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FLAT_SCHEMA = "doc string, attr_id string, value string"


def flatten_xml_doc(text: str) -> list[tuple[str, str]]:
    """(attr_id, value) pairs for one document: leaf text nodes keyed by
    reversed path (XmlDataLoader.parseXml, :62-76). First occurrence of a
    repeated path wins (:23-28 ``find`` takes the head)."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(text)
    out: list[tuple[str, str]] = []
    seen: set[str] = set()

    def walk(node, parent_path: str) -> None:
        tag = node.tag.split("}", 1)[-1]  # strip namespace
        path = f"{tag}@{parent_path}" if parent_path else tag
        children = list(node)
        if not children:
            if path not in seen:
                seen.add(path)
                out.append((path, (node.text or "").strip()))
            return
        for ch in children:
            walk(ch, path)

    walk(root, "")
    return out


def load_xml(
    spark: SparkSession,
    path: str,
    exclude_elements: set[str] | None = None,
) -> DataFrame:
    """Long-format ``(doc, attr_id, value)`` DataFrame for the XML files at
    ``path`` (file, dir, or glob), with the union-of-attributes "" fill."""
    raw = (
        spark.read.text(path, wholetext=True)
        .withColumn("doc", F.input_file_name())
        .select("doc", "value")
    )

    excluded = set(exclude_elements or ())

    def parse_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc, text in zip(pdf["doc"], pdf["value"]):
                for attr_id, value in flatten_xml_doc(text):
                    leaf = attr_id.split("@", 1)[0]
                    if leaf in excluded:
                        continue
                    rows.append((doc, attr_id, value))
            yield pd.DataFrame(rows, columns=["doc", "attr_id", "value"])

    flat = raw.mapInPandas(parse_batches, schema=FLAT_SCHEMA)
    docs = flat.select("doc").distinct()
    attrs = flat.select("attr_id").distinct()
    return (
        docs.crossJoin(attrs)
        .join(flat, ["doc", "attr_id"], "left")
        .select("doc", "attr_id", F.coalesce("value", F.lit("")).alias("value"))
    )


# --- oracle-checked query: the flattener's semantics, end to end -------------
#
# XML documents are synthesized relationally from `customer` rows, flattened
# by the REAL parser (mapInPandas path above), and compared against DuckDB's
# direct construction of the expected (doc, leaf@path, value) triples — so
# the path-reversal, leaf-text and empty-element semantics are oracle-exact.

from serene_spark.registry import register  # noqa: E402

_XML_DOC_KEYS = 150


def _xml_melt_oracle() -> str:
    return f"""
WITH base AS (SELECT * FROM customer WHERE c_custkey <= {_XML_DOC_KEYS})
SELECT CAST(c_custkey AS VARCHAR) AS doc, 'name@customer' AS attr_id, c_name AS value FROM base
UNION ALL
SELECT CAST(c_custkey AS VARCHAR), 'segment@contact@customer', c_mktsegment FROM base
UNION ALL
SELECT CAST(c_custkey AS VARCHAR), 'acctbal@customer',
       CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) FROM base
UNION ALL
SELECT CAST(c_custkey AS VARCHAR), 'notes@customer', '' FROM base
"""


@register(
    "xml_melt",
    oracle=_xml_melt_oracle(),
    doc="SURVEY §2.1 XML loader: documents flattened to leaf@parent@root "
    "long format by the real parser; oracle constructs the expected triples "
    "directly (XmlDataLoader.scala:18-76)",
)
def xml_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serene_spark.catalog import load_table

    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= _XML_DOC_KEYS
    )
    xml = cust.select(
        F.col("c_custkey").cast("string").alias("doc"),
        F.concat(
            F.lit("<customer><name>"),
            F.col("c_name"),
            F.lit("</name><contact><segment>"),
            F.col("c_mktsegment"),
            F.lit("</segment></contact><acctbal>"),
            F.col("c_acctbal").cast("decimal(12,2)").cast("string"),
            F.lit("</acctbal><notes></notes></customer>"),
        ).alias("value"),
    )

    def parse_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc, text in zip(pdf["doc"], pdf["value"]):
                for attr_id, value in flatten_xml_doc(text):
                    rows.append((doc, attr_id, value))
            yield pd.DataFrame(rows, columns=["doc", "attr_id", "value"])

    return xml.mapInPandas(parse_batches, schema=FLAT_SCHEMA)
