"""Headline benchmark: runs the bench-tagged queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The driver records only the LAST ~2000 characters of stdout; rounds 5-6
lost their bench evidence because the per-query dict (70 entries with
cold legs) outran that window and Spark's console progress bar polluted
the tail. So the final line is kept COMPACT — steady per-query walls at
2 decimals only — while the full-precision detail (including the cold
leg) is written to BENCH_DETAIL.json next to this script, committed to
git, and pointed to by the line's "detail" key. Console progress is
disabled for the bench session.

Queries execute via the noop sink (full physical execution, nothing
collected to the driver) — the honest measurement for an engine meant to
write results out, not show them.

Why 8-vs-32-core ratios are ~1 at sf0.1 (the driver's scaling probe):
every sf0.1 table is ONE parquet file with ONE row group (documents 5 k
rows / 0.6 MB, lineitem 600 k / 10 MB), so scans and all map-side work
run as a single task at ANY core count; the residue is driver dispatch,
which 8 cores do slightly cheaper. $SPARK_GRAFT_CPUS is honored
(session.py builds local[$SPARK_GRAFT_CPUS]); the parallelism signal is
only meaningful at sf>=1 — see SCALE_CORES_sf1.json for a heavy-tier
core-scaling probe on multi-task inputs.
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
    # float-shaped pattern on the basename (ADVICE r8: `sf([0-9.]+)`
    # let 'sf0.1.bak' capture '0.1.' and crash float())
    m = re.search(r"sf(\d+(?:\.\d+)?)", os.path.basename(os.path.normpath(sf_dir)))
    sf = float(m.group(1)) if m else None

    # showConsoleProgress writes \r-escaped progress bars into the
    # session's console output; the driver's tail capture must see only
    # the final JSON line (BENCH_r05's recorded tail was 100% progress
    # escapes).
    spark = get_spark(
        "gov-ec-pipeline-etl-spark-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # The partition-count-scale offset windows (k-row / n_buckets-row
    # frames in sampling/packing) emit a benign `WARN WindowExec: No
    # Partition Defined` per execution; ERROR level keeps the console
    # clean near the driver's stdout-tail recorder window.
    spark.sparkContext.setLogLevel("ERROR")
    bench_queries = {n: q for n, q in sorted(all_queries().items()) if q.bench}

    # Steady-state measurement (TPC-style): one full warmup execution per
    # query amortizes JVM JIT / codegen compilation / parquet footer
    # caches, then TWO timed passes per query and the min is reported —
    # multi-stage plans (d02) keep JIT-compiling into their second
    # execution, and min-of-2 also rejects one-off GC pauses. Cold-start
    # is a JVM property, not a plan property (~2.5× inflation on the
    # heaviest query here).
    def run_once(q) -> float:
        t0 = time.perf_counter()
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        # inter-query quiesce, outside the timed window: clear persisted
        # sketch tables AND force a driver GC so Spark's ContextCleaner
        # releases accumulated broadcasts/shuffle files. Without it one
        # heavy query's garbage taxes the NEXT query's measurement
        # (observed 4 s -> 77 s on d02 right after u12's band joins).
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        return dt

    # COLD leg: the first-ever execution of each plan in this JVM —
    # what a fresh job submission pays (codegen compile, JIT, footer
    # cache misses). Recorded separately so round-over-round
    # comparisons can use the steady-state leg, where ±30% cold-start
    # noise on sub-second queries would otherwise swamp real movement.
    cold = {name: run_once(q) for name, q in bench_queries.items()}
    # STEADY leg: two further timed passes, min reported (rejects
    # one-off GC pauses; multi-stage plans keep JIT-compiling into
    # their second execution).
    timings = {name: run_once(q) for name, q in bench_queries.items()}
    timings = {
        name: min(t, run_once(bench_queries[name])) for name, t in timings.items()
    }

    total = round(sum(timings.values()), 3)
    value_cold = round(sum(cold.values()), 3)
    # Full-precision per-query record (steady + cold) goes to a committed
    # file; the stdout line carries only what fits the driver's 2000-char
    # tail window with margin (~35 chars/query at 2 dp — room for ~50
    # bench queries before the window is at risk again). Only the default
    # sf0.1 run writes the committed BENCH_DETAIL.json — smoke/trajectory
    # runs at other sfs get an sf-stamped filename so they can't clobber
    # the round's committed record (ADVICE r7).
    # sf-less custom dirs get an explicit name rather than the
    # accidental 'BENCH_DETAIL_sfNone.json' (ADVICE r8)
    detail_name = (
        "BENCH_DETAIL.json"
        if sf == 0.1
        else f"BENCH_DETAIL_sf{sf}.json"
        if sf is not None
        else "BENCH_DETAIL_custom.json"
    )
    detail_path = os.path.join(REPO_ROOT, detail_name)
    with open(detail_path, "w") as f:
        json.dump(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "value_cold": value_cold,
                "unit": "sec",
                "queries": timings,
                "queries_cold": cold,
                "sf": sf,
            },
            f,
            indent=1,
            sort_keys=True,
        )
        f.write("\n")
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": {n: round(t, 2) for n, t in timings.items()},
                "value_cold": value_cold,
                "sf": sf,
                "detail": detail_name,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
