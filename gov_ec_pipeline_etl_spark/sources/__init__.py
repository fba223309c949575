"""Sources: incremental catalog state + messy-file ingest.

Catalog metadata and per-resource fingerprints are driver-side (tiny);
data files land in distributed storage and are read by Spark. The header
heuristic runs on a 5-row sample at ingest, never inside the lazy plan
(SURVEY.md §4 — not expressible as a Catalyst op, by design).
"""

from gov_ec_pipeline_etl_spark.sources.state import (
    ResourceState,
    diff_resources,
    fingerprint,
    load_state,
    save_state,
    seed_state,
)
from gov_ec_pipeline_etl_spark.sources.ingest import (
    fix_header,
    read_csv_resource,
    read_excel_resource,
)

__all__ = [
    "ResourceState",
    "diff_resources",
    "fingerprint",
    "fix_header",
    "load_state",
    "read_csv_resource",
    "read_excel_resource",
    "save_state",
    "seed_state",
]
