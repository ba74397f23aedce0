"""Legacy multi-format date parsing, as one encapsulated operator.

The reference parses timestamps through an ordered cascade of 9 legacy
formats under ``spark.sql.legacy.timeParserPolicy=LEGACY``
(config/constants.py:454-464 DATE_FORMATS; observation_mapper.py:736-754).
Setting LEGACY globally poisons every other date expression in the session,
so here the cascade is a single ``coalesce(try_to_timestamp(...))`` chain —
per-expression, side-effect-free, and codegen'd. ``try_to_timestamp``
returns null instead of raising on mismatch, which is exactly the cascade
semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mirrors the reference's DATE_FORMATS cascade order (most → least specific).
DEFAULT_DATE_FORMATS: tuple[str, ...] = (
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ssX",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm",
    "yyyy-MM-dd",
    "dd/MM/yyyy HH:mm:ss",
    "dd/MM/yyyy",
    "yyyy/MM/dd",
)


def parse_date_cascade(
    col: str | Column,
    formats: Sequence[str] = DEFAULT_DATE_FORMATS,
) -> Column:
    """First format that parses wins; null if none do."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)) for fmt in formats])


def valid_date_str(col: str | Column) -> Column:
    """ISO yyyy-MM-dd validation predicate (observation_mapper.py:999-1024)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(r"^\d{4}-\d{2}-\d{2}") & F.try_to_timestamp(
        F.substring(c, 1, 10), F.lit("yyyy-MM-dd")
    ).isNotNull()
