"""Ontology ingest (S8) — OBO parsing + hierarchy DataFrames.

The reference parses OBO/OWL with pronto on the driver and computes the
term closure there too (jobs/extract/ontology_hierarchy_extractor.py:
181-367). Ontologies are small (≤ ~100k terms), so driver-side PARSING is
the right call — but the CLOSURE belongs to the engine
(operators/graph.transitive_closure), where it is a reusable, tested,
distributed operator instead of bespoke driver recursion.

``parse_obo`` handles the OBO subset the hierarchy needs: [Term] stanzas
with id / name / is_a / is_obsolete. ``ontology_dataframe`` emits one row
per term with its direct parents; compose with ``transitive_closure`` +
``ancestor_arrays`` for the flattened per-term hierarchy the reference
materializes.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import ArrayType, BooleanType, StringType, StructField, StructType

TERM_SCHEMA = StructType([
    StructField("term_id", StringType()),
    StructField("name", StringType()),
    StructField("parents", ArrayType(StringType())),
    StructField("is_obsolete", BooleanType()),
])


_QUALIFIER_RE = re.compile(r"\s*\{[^}]*\}\s*$")


def parse_obo(text: str) -> list[dict]:
    """Parse OBO text into term dicts (id, name, parents, is_obsolete)."""
    terms: list[dict] = []
    cur: dict | None = None
    in_term = False
    for raw in text.splitlines():
        line = raw.strip()
        if line.startswith("["):
            if cur is not None:
                terms.append(cur)
                cur = None
            in_term = line == "[Term]"
            if in_term:
                cur = {"term_id": None, "name": None, "parents": [], "is_obsolete": False}
            continue
        if not in_term or cur is None or not line or line.startswith("!"):
            continue
        key, _, val = line.partition(":")
        val = val.strip().split(" !")[0].strip()
        # strip OBO trailing qualifier blocks ('is_a: MP:1 {source="x"}')
        # — leaving them in corrupts the parent id and silently drops the
        # edge (and every ancestor through it) from the closure
        val = _QUALIFIER_RE.sub("", val).strip()
        if key == "id":
            cur["term_id"] = val
        elif key == "name":
            cur["name"] = val
        elif key == "is_a":
            cur["parents"].append(val)
        elif key == "is_obsolete":
            cur["is_obsolete"] = val.lower() == "true"
    if cur is not None:
        terms.append(cur)
    return [t for t in terms if t["term_id"]]


def ontology_dataframe(spark: SparkSession, obo_text: str) -> DataFrame:
    """Term table with direct parents (explicit schema — no inference on
    ingestion paths, per the reference's own practice for ontologies)."""
    rows = [
        (t["term_id"], t["name"], t["parents"], t["is_obsolete"])
        for t in parse_obo(obo_text)
    ]
    return spark.createDataFrame(rows, TERM_SCHEMA)


def term_edges(terms: DataFrame) -> DataFrame:
    """(child, parent) edge list for graph.transitive_closure (obsolete
    terms excluded, like the reference's hierarchy extractor)."""
    from pyspark.sql import functions as F

    return (
        terms.where(~F.col("is_obsolete"))
        .select(F.col("term_id").alias("child"), F.explode("parents").alias("parent"))
    )
