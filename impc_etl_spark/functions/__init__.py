"""Scalar function surface (SURVEY.md §2.8) — Column-level helpers.

Everything here returns ``Column`` expressions (JVM-side); the only UDF kept
is gzip+base64 bundling, which has no native equivalent (the reference keeps
it too — stats_results_mapper.py:855-861).
"""

from impc_etl_spark.functions.dates import parse_date_cascade, DEFAULT_DATE_FORMATS  # noqa: F401
from impc_etl_spark.functions.strings import (  # noqa: F401
    strip_prefix,
    unescape_html_brackets,
    extract_group,
    basename,
)
from impc_etl_spark.functions.bundles import gzip_b64_udf  # noqa: F401
