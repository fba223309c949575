"""Engine operators.

Each module re-expresses one family from the reference's transform engine
(SURVEY.md §2) or the LLM-data-pipeline extensions as composable,
Catalyst-friendly DataFrame transformations: pure functions
``DataFrame -> DataFrame`` (or ``-> Column``), no driver-side row
iteration, built-ins first, Arrow-batched pandas UDFs only where
semantics demand Python.
"""

from gov_ec_pipeline_etl_spark.operators.normalize import (
    drop_all_null_rows,
    normalize_column_names,
    replace_na_tokens,
    trim_strings,
)
from gov_ec_pipeline_etl_spark.operators.category import apply_category_rules
from gov_ec_pipeline_etl_spark.operators.numeric import apply_numeric_bounds
from gov_ec_pipeline_etl_spark.operators.dedup import (
    dedup_keep_first,
    dedup_keep_latest,
    duplicate_key_count,
)

__all__ = [
    "apply_category_rules",
    "apply_numeric_bounds",
    "dedup_keep_first",
    "dedup_keep_latest",
    "drop_all_null_rows",
    "duplicate_key_count",
    "normalize_column_names",
    "replace_na_tokens",
    "trim_strings",
]
