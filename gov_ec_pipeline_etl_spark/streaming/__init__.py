"""Structured Streaming surface.

The reference's incremental path (SURVEY.md §2.2/§2.14: fingerprint diff,
process-each-file-once, commit-gated state) maps onto Structured
Streaming's file source + checkpoint + Trigger.AvailableNow; its one
dedup pattern maps onto dropDuplicates/dropDuplicatesWithinWatermark.
"""

from gov_ec_pipeline_etl_spark.streaming.events import (
    run_tumbling_window_stream,
    session_window_agg,
)

__all__ = ["run_tumbling_window_stream", "session_window_agg"]
