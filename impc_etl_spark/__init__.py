"""impc_etl_spark — a PySpark-native analytics engine.

A clean-room, Spark-first re-expression of the operator/data semantics of the
IMPC ETL reference pipeline (mpi2/impc-etl): multi-source ingest, cleaning and
conformance, keyed cross-referencing, nested→flat explosion, rule-based
annotation, wide-mart assembly — plus the large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing) a 100 TB
pipeline needs.

Design principles (see SURVEY.md §7):
- Declarative DataFrame plans; Catalyst/Tungsten pick the physical strategy.
- No row-at-a-time Python UDFs in hot paths; Arrow-batched Pandas UDFs only
  where built-ins genuinely cannot express the semantics.
- Broadcast small dimensions; unionByName over positional union; window
  dedup over self-joins; split disjunctive joins into priority equi-joins.
"""

__version__ = "0.1.0"

from impc_etl_spark.session import get_spark  # noqa: F401
