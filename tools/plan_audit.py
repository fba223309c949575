"""Regenerable plan-shape evidence: structural audit of executed plans.

PERF.md asserts plan properties ("every dimension join broadcasts",
"filters reach the scan", "two exchanges on the sketch side"). This
tool regenerates that evidence from the live optimizer instead of
prose: for each audited query it builds the executed plan at a small
scale factor (plan SHAPE is scale-invariant — AQE may coalesce
partition counts but not the operator structure asserted here) and
records structural counters into PLAN_AUDIT.json at the repo root.

    python tools/plan_audit.py                   # bench set, sf0.001
    python tools/plan_audit.py --sf-dir ... --queries d02_minhash_lsh

Counters per query:
- exchanges:        shuffle boundaries (Exchange nodes; cache-backed
                    InMemoryTableScan subtrees embed their own, so the
                    cache is cleared per query)
- broadcast_joins / sortmerge_joins / shuffled_hash_joins
- bloom_filters:    runtime bloom-filter pruning sites
- pushed_filters:   parquet scans carrying PushedFilters
- scans / scans_all_columns: scans reading the full table schema
                    (column-pruning regressions)
- codegen_spans:    WholeStageCodegen regions
- python_nodes:     ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
                    (the deliberate Arrow-path sites; anything else
                    Python in a hot path is a regression)

Caveats: queries whose operators persist intermediates (LSH sketch
tables) print InMemoryTableScan subtrees that embed their build-side
exchanges, inflating absolute counts — the numbers are run-to-run
comparable REGRESSION BASELINES, not literal shuffle counts of one
execution. Plans are captured after execution so AQE's final join
strategies and codegen spans are the ones that actually ran.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_SCAN = re.compile(r"FileScan parquet", re.IGNORECASE)
_PUSHED = re.compile(r"PushedFilters: \[(?!\])")
_WSCG = re.compile(r"\*\((\d+)\)")  # codegen'd operators print as *(id)


def audit_plan(plan: str) -> dict[str, int]:
    # an executed AdaptiveSparkPlan prints "== Final Plan ==" followed by
    # "== Initial Plan ==" — audit only what actually ran
    plan = plan.split("== Initial Plan ==")[0]
    return {
        "exchanges": plan.count("Exchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "bloom_filters": plan.lower().count("might_contain"),
        "scans": len(_SCAN.findall(plan)),
        "pushed_filters": len(_PUSHED.findall(plan)),
        "codegen_spans": len(set(_WSCG.findall(plan)))
        or plan.count("WholeStageCodegen"),
        "python_nodes": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated names (default: the bench set)",
    )
    ap.add_argument("--out", default=os.path.join(REPO, "PLAN_AUDIT.json"))
    args = ap.parse_args()

    from gov_ec_pipeline_etl_spark.caching import unpersist_inputs
    from gov_ec_pipeline_etl_spark.plans import all_queries
    from gov_ec_pipeline_etl_spark.session import get_spark

    qs = all_queries()
    names = (
        args.queries.split(",")
        if args.queries
        else sorted(n for n, q in qs.items() if q.bench)
    )
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark("plan-audit")
    out: dict[str, dict] = {}
    skipped: dict[str, str] = {}
    for name in names:
        spark.catalog.clearCache()
        try:
            df = qs[name].spark(spark, args.sf_dir)
            # execute so AQE finalizes: join strategies and codegen
            # spans in the captured plan are the ones that actually ran
            df.collect()
        except Exception as e:  # streaming runners execute, etc.
            skipped[name] = f"{type(e).__name__}: {e}"
            continue
        plan = df._jdf.queryExecution().executedPlan().toString()
        rec = audit_plan(plan)
        rec["aqe_final"] = int("isFinalPlan=true" in plan)
        out[name] = rec
        unpersist_inputs(df)
    spark.catalog.clearCache()

    summary = {
        "sf_dir": args.sf_dir,
        "generated_unix": int(time.time()),
        "queries": out,
        "skipped": skipped,
        "totals": {
            k: sum(q[k] for q in out.values())
            for k in next(iter(out.values()), {})
        },
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    wide = max((len(n) for n in out), default=5)
    print(
        f"{'query'.ljust(wide)}  exch  bcast  smj  shj  bloom  scans  pushed  wscg  py  final"
    )
    for n, q in sorted(out.items()):
        print(
            f"{n.ljust(wide)}  {q['exchanges']:4d}  {q['broadcast_joins']:5d}"
            f"  {q['sortmerge_joins']:3d}  {q['shuffled_hash_joins']:3d}"
            f"  {q['bloom_filters']:5d}  {q['scans']:5d}  {q['pushed_filters']:6d}"
            f"  {q['codegen_spans']:4d}  {q['python_nodes']:2d}  {q['aqe_final']:5d}"
        )
    for n, why in skipped.items():
        print(f"{n}: SKIPPED ({why.splitlines()[0][:100]})")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
