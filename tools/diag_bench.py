"""Diagnostic twin of bench.py: same order, same quiesce, same noop sink,
but records per-query per-pass: build time (plan construction+analysis),
exec time, and JVM counter deltas (GC ms, JIT compile ms, loaded classes,
total threads) measured across the TIMED window only.
"""
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from gov_ec_pipeline_etl_spark.plans import all_queries  # noqa: E402
from gov_ec_pipeline_etl_spark.session import get_spark  # noqa: E402

spark = get_spark(
    "diag-bench",
    extra_conf={"spark.ui.showConsoleProgress": "false"},
)
spark.sparkContext.setLogLevel("ERROR")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
bench_queries = {n: q for n, q in sorted(all_queries().items()) if q.bench}

jvm = spark.sparkContext._jvm
mf = jvm.java.lang.management.ManagementFactory


def jvm_stats():
    gc_ms = 0
    for b in mf.getGarbageCollectorMXBeans():
        gc_ms += b.getCollectionTime()
    return {
        "gc_ms": gc_ms,
        "jit_ms": mf.getCompilationMXBean().getTotalCompilationTime(),
        "classes": mf.getClassLoadingMXBean().getLoadedClassCount(),
        "threads": mf.getThreadMXBean().getThreadCount(),
        "heap_used_mb": mf.getMemoryMXBean().getHeapMemoryUsage().getUsed() // 2**20,
    }


records = []


def run_once(name, q, leg):
    s0 = jvm_stats()
    t0 = time.perf_counter()
    df = q.spark(spark, sf_dir)
    t1 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    s1 = jvm_stats()
    rec = {
        "q": name,
        "leg": leg,
        "build_s": round(t1 - t0, 3),
        "exec_s": round(t2 - t1, 3),
        "total_s": round(t2 - t0, 3),
        "d_gc_ms": s1["gc_ms"] - s0["gc_ms"],
        "d_jit_ms": s1["jit_ms"] - s0["jit_ms"],
        "d_classes": s1["classes"] - s0["classes"],
        "classes": s1["classes"],
        "threads": s1["threads"],
        "heap_mb": s1["heap_used_mb"],
    }
    records.append(rec)
    print(json.dumps(rec), flush=True)
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    return t2 - t0


for name, q in bench_queries.items():
    run_once(name, q, "cold")
for name, q in bench_queries.items():
    run_once(name, q, "steady1")
for name, q in bench_queries.items():
    run_once(name, q, "steady2")

with open("/tmp/diag_bench.json", "w") as f:
    json.dump(records, f, indent=1)
print("WROTE /tmp/diag_bench.json", flush=True)
