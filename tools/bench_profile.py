"""Per-query decomposition profiler for the bench set (guide §1).

For every bench-tagged query, measures separately:
- build_s:   Python plan construction (DataFrame composition, py4j)
- analyze_s: Catalyst analysis (forced via df.schema)
- exec_s:    physical execution into the noop sink (warm, min of 2)
- jobs:      Spark jobs launched by one execution (status tracker delta)

and writes plans/<tag>/<query>_before.txt with .explain("formatted")
captured AFTER execution (AQE final plan where available).

    python tools/bench_profile.py --tag r10 [--queries u68_capped_funnel ...]

Output: one JSON line per query to stdout plus a summary file
/tmp/bench_profile_<tag>.json.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gov_ec_pipeline_etl_spark.plans import all_queries  # noqa: E402
from gov_ec_pipeline_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r10")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--suffix", default="before",
                    help="plan file suffix (before/after)")
    ap.add_argument("--no-plans", action="store_true",
                    help="skip writing plan files (timing only)")
    args = ap.parse_args()

    spark = get_spark(
        "bench-profile",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = {n: q for n, q in sorted(all_queries().items()) if q.bench}
    if args.queries:
        unknown = [n for n in args.queries if n not in qs]
        if unknown:
            sys.exit(
                f"unknown bench queries: {unknown}; choose from "
                f"{sorted(qs)}"
            )
        qs = {n: qs[n] for n in args.queries}

    plan_dir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(plan_dir, exist_ok=True)
    tracker = spark.sparkContext.statusTracker()

    results = {}
    for name, q in qs.items():
        # fresh job group per query: getJobIdsForGroup counts within the
        # group, so the spark.ui.retainedJobs cap (default 1000) can't
        # make long runs under-count (ADVICE r10)
        spark.sparkContext.setJobGroup(f"profile:{name}", name)
        # cold leg (includes codegen/JIT) — run once untimed to warm
        df = q.spark(spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

        # timed decomposition, twice; keep min for exec
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = q.spark(spark, args.sf_dir)
            t1 = time.perf_counter()
            _ = df.schema
            t2 = time.perf_counter()
            jobs_before = len(tracker.getJobIdsForGroup(f"profile:{name}") or [])
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            jobs_after = len(tracker.getJobIdsForGroup(f"profile:{name}") or [])
            rec = {
                "build_s": round(t1 - t0, 3),
                "analyze_s": round(t2 - t1, 3),
                "exec_s": round(t3 - t2, 3),
                "total_s": round(t3 - t0, 3),
                "jobs": jobs_after - jobs_before,
            }
            if best is None or rec["exec_s"] < best["exec_s"]:
                best = rec
            if not args.no_plans:
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(
                    os.path.join(plan_dir, f"{name}_{args.suffix}.txt"), "w"
                ) as f:
                    f.write(buf.getvalue())
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        results[name] = best
        print(json.dumps({"query": name, **best}), flush=True)

    out = f"/tmp/bench_profile_{args.tag}_{args.suffix}.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    total = sum(r["total_s"] for r in results.values())
    build = sum(r["build_s"] + r["analyze_s"] for r in results.values())
    print(
        f"# total {total:.1f}s  of which build+analyze {build:.1f}s "
        f"-> {out}",
        flush=True,
    )


if __name__ == "__main__":
    main()
