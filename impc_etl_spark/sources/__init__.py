"""Sources & sinks (SURVEY.md §2.1 S1-S15)."""

from impc_etl_spark.sources.readers import (  # noqa: F401
    read_parquet,
    read_csv,
    read_tsv,
    read_jsonl,
    read_xml_entities,
)
from impc_etl_spark.sources.sinks import (  # noqa: F401
    write_parquet,
    write_sized_json,
    write_single_csv,
)
