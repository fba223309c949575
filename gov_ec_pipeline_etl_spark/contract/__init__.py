"""Declarative schema-contract subsystem.

The reference pipeline's defining feature (SURVEY.md §1.3, §2.5-2.10):
a YAML contract declares column types, normalization, category domains,
numeric bounds, deterministic IDs, dedup policy, quality gates, and
drift policy; the engine compiles it to a lazy Spark transformation
chain plus a one-pass validation aggregate — no eager per-step copies,
no driver-side row iteration.
"""

from gov_ec_pipeline_etl_spark.contract.loader import load_config
from gov_ec_pipeline_etl_spark.contract.model import Contract, TransformHardFail
from gov_ec_pipeline_etl_spark.contract.compiler import ContractPipeline

__all__ = ["Contract", "ContractPipeline", "TransformHardFail", "load_config"]
