"""Engine scalar functions.

Only two capabilities genuinely need Python UDFs (SURVEY.md §2.15):
accent stripping (no Spark builtin) and RFC-4122 uuid5 (bit-exactness
required for upsert idempotency). Both are Arrow-batched pandas UDFs.
Everything else composes pyspark.sql.functions builtins and stays inside
whole-stage codegen.
"""

from gov_ec_pipeline_etl_spark.functions.text import (
    norm_colname,
    norm_text,
    norm_text_py,
    strip_accents,
    strip_accents_py,
)
from gov_ec_pipeline_etl_spark.functions.ids import (
    business_key,
    surrogate_sha256,
    surrogate_uuid5,
)

__all__ = [
    "business_key",
    "norm_colname",
    "norm_text",
    "norm_text_py",
    "strip_accents",
    "strip_accents_py",
    "surrogate_sha256",
    "surrogate_uuid5",
]
