"""String helpers (SURVEY.md §2.8) — regexp-based, no Python UDFs.

The reference does these with scalar Python UDFs (truncate_specimen_id,
truncate_colony_id — shared/utils.py:79-91); each is a one-line regexp
expression here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def strip_prefix(col: str | Column, prefix: str) -> Column:
    """Remove a literal prefix (e.g. 'MGI:' — specimen_cleaner.py:225-233)."""
    import re
    return F.regexp_replace(_c(col), f"^{re.escape(prefix)}", "")


def unescape_html_brackets(col: str | Column) -> Column:
    """&lt;/&gt; → </> (specimen_cleaner.py:204-223 allele symbols)."""
    return F.regexp_replace(F.regexp_replace(_c(col), "&lt;", "<"), "&gt;", ">")


def extract_group(col: str | Column, pattern: str = r"(.+_.+)_.+", idx: int = 1) -> Column:
    """procedure_group extraction (observation_mapper.py:464-467)."""
    return F.regexp_extract(_c(col), pattern, idx)


def basename(col: str | Column) -> Column:
    """Path basename — source-file tagging (observation_mapper.py:1462-1469),
    done with regexp instead of the reference's Python UDF."""
    return F.regexp_extract(_c(col), r"([^/]+)$", 1)


def truncate_after_last(col: str | Column, sep: str) -> Column:
    """Drop everything after the LAST occurrence of ``sep`` (EuroPhenome
    specimen-id truncation semantics)."""
    import re
    return F.regexp_replace(_c(col), f"{re.escape(sep)}[^{re.escape(sep)}]*$", "")
