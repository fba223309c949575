"""gov_ec_pipeline_etl_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine reproducing the query and data-processing
capabilities of the reference ETL pipeline (dfevx/gov-ec-pipeline-etl,
surveyed in SURVEY.md), generalized to a full relational + LLM-data-pipeline
surface designed for 100 TB scale:

- ``contract``   — YAML schema-contract compiler (types, rules, IDs, drift policy)
- ``functions``  — engine scalar functions (text normalize, uuid5, keys)
- ``operators``  — normalize / coerce / category / numeric / dedup /
                   minhash / simhash / similarity / text-stats / multimodal
- ``sources``    — incremental catalog + state, CSV/Excel ingest
- ``sinks``      — keyed upsert, audit ledger, artifact store
- ``plans``      — the declared query surface (driver-checked vs DuckDB)
- ``streaming``  — Structured Streaming analogs of the incremental path

Everything is DataFrame/Catalyst-first: logical plans are declared with the
DataFrame API, Catalyst picks the physical strategy, and Python UDFs appear
only where built-ins genuinely cannot express the semantics (accent
stripping, uuid5).
"""

from gov_ec_pipeline_etl_spark.session import get_spark
from gov_ec_pipeline_etl_spark.tables import TABLES, load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views", "TABLES"]

__version__ = "0.1.0"
