"""Compressed JSON bundling — the one genuinely-custom UDF the engine keeps.

The reference gzips+base64s collected JSON bundles for the gene mart
(gene_mapper.py:393-399, stats_results_mapper.py:855-861). There is no
native Spark gzip-to-base64 expression, so this stays a UDF — but as an
Arrow-batched pandas_udf (vectorized transfer) rather than a row-at-a-time
Python UDF.
"""

from __future__ import annotations

import base64
import gzip

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


@pandas_udf(StringType())
def gzip_b64_udf(s: pd.Series) -> pd.Series:
    """gzip + base64 a string column (null-safe). mtime pinned to 0 so the
    output is deterministic across runs (gzip embeds a timestamp otherwise)."""
    def _enc(x):
        if x is None:
            return None
        return base64.b64encode(
            gzip.compress(x.encode("utf-8"), mtime=0)
        ).decode("ascii")

    return s.map(_enc)


@pandas_udf(StringType())
def gunzip_b64_udf(s: pd.Series) -> pd.Series:
    """base64-decode + gunzip back to the original string (null-safe) —
    the exact inverse of ``gzip_b64_udf``, letting compressed bundles be
    round-trip-verified inside a plan (and letting the driver's SQL
    oracle hash-check the gzip path via the DECOMPRESSED payload)."""
    def _dec(x):
        if x is None:
            return None
        return gzip.decompress(base64.b64decode(x)).decode("utf-8")

    return s.map(_dec)
