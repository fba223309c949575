"""Headline benchmark: runs the bench-tagged queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Queries execute via the noop sink (full physical execution, nothing
collected to the driver) — the honest measurement for an engine meant to
write results out, not show them.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

from gov_ec_pipeline_etl_spark.plans import all_queries  # noqa: E402
from gov_ec_pipeline_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("gov-ec-pipeline-etl-spark-bench")
    bench_queries = {n: q for n, q in sorted(all_queries().items()) if q.bench}

    # Warm the JVM + parquet footers once so timings measure the engine,
    # not first-touch JIT/IO (same treatment for every query).
    for name, q in bench_queries.items():
        q.spark(spark, sf_dir).schema  # analysis only

    timings: dict[str, float] = {}
    for name, q in bench_queries.items():
        t0 = time.perf_counter()
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
