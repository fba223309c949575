"""SparkSession factory with scale-aware defaults.

Local tests run on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads), but
every default here is chosen to also hold on a 1000-executor cluster:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  broadcast-join demotion/promotion) — the single most important knob at
  100 TB where static planning guesses wrong.
- Arrow-accelerated Pandas UDF transfer for the few Python-side operators.
- Session timezone pinned to UTC so timestamp semantics are deterministic
  across driver/executor locales (the reference pipeline used naive
  timestamps; see SURVEY.md §1.2 / etl/transform.py:170-172).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

def _default_driver_memory() -> str:
    """Local-mode executors live inside the driver JVM; the Spark default
    heap (1g) OOMs wide shuffles. Size to min(32g, ~1/4 of physical RAM,
    floor 2g) so smaller hosts spill instead of getting OOM-killed;
    ``SPARK_GRAFT_DRIVER_MEM`` overrides (any JVM size string). Applied
    only when this factory creates the first session in the process
    (driver memory is a JVM-start setting); external harnesses that pass
    their own session keep their own sizing."""
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    try:
        ram_gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / 2**30
    except (ValueError, OSError, AttributeError):
        return "4g"
    return f"{max(2, min(32, int(ram_gb / 4)))}g"


DEFAULT_CONF: dict[str, str] = {
    "spark.driver.memory": _default_driver_memory(),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dim tables (region/nation/supplier/part at typical ratios) should
    # broadcast; 64 MB is safe with multi-GB executors.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Local-mode shuffle width. AQE coalesces down from the initial
    # number at runtime; 64 keeps task-dispatch overhead negligible on
    # local[32]. On a real cluster RAISE initialPartitionNum (e.g. 2-4×
    # total cores) and let AQE coalesce — never hand-tune per query.
    "spark.sql.shuffle.partitions": "64",
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "64",
    # 128 MB split targets keep scan tasks balanced on wide parquet.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Whole-stage-codegen class cache (driver AND executors compile the
    # generated source per JVM). The default (100 entries) thrashes as
    # soon as one session runs more than a handful of distinct plans:
    # this engine's 41-query bench re-executes ~1-2k codegen fragments
    # per pass, so every execution Janino-RECOMPILED byte-identical
    # source and the resulting class-loading churn deoptimized other
    # queries' JIT-compiled methods (measured r11: 105 s of JIT
    # recompilation per bench pass, u31's exec leg 2.2 s -> 0.76 s and
    # the 6-query heavy probe 35.3 -> 26.7 s once the cache fits the
    # working set; C1-only JIT measured WORSE, 47.1 s). Compiled-code
    # memoization only — same class as the JIT itself, never data or
    # results. Cost: bounded metaspace for up to 4096 compiled classes;
    # right trade for any long-lived driver/executor running a multi-
    # operator pipeline, exactly the 100 TB deployment shape.
    "spark.sql.codegen.cache.maxEntries": "4096",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # The oracle gate collects full results for the DuckDB diff; at sf1
    # some dedup queries return multi-million-row pair sets and trip the
    # 1g default mid-compare. Engine data paths never collect (the
    # plan-shape tests pin that), so this only sizes the VERIFICATION
    # harness, not production behavior.
    "spark.driver.maxResultSize": "8g",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "gov-ec-pipeline-etl-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine defaults.

    The driver harness passes its own session into ``__spark_entry__``
    functions; this factory is for tests, ``bench.py``, and standalone use.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
