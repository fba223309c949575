"""Driver-contract guards for bench.py's stdout line.

The driver records only the last ~2000 characters of session stdout;
rounds 5-6 lost their bench evidence when the JSON line outgrew that
window. These tests re-derive the worst-case line from the CURRENT
bench set without running Spark, so adding bench queries fails fast
here instead of silently truncating the round's record.
"""

from __future__ import annotations

import json

TAIL_WINDOW = 2000
SAFETY_MARGIN = 200  # stray trailing newline/noise allowance


def _bench_names() -> list[str]:
    from gov_ec_pipeline_etl_spark.plans import all_queries

    return sorted(n for n, q in all_queries().items() if q.bench)


def test_bench_line_fits_tail_window():
    names = _bench_names()
    assert names, "bench set is empty?"
    # worst case: every wall prints as 999.99 (2 dp, as bench.py emits)
    line = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": 99999.999,
            "unit": "sec",
            "queries": {n: 999.99 for n in names},
            "value_cold": 99999.999,
            "sf": 0.1,
            "detail": "BENCH_DETAIL.json",
        }
    )
    assert len(line) <= TAIL_WINDOW - SAFETY_MARGIN, (
        f"bench line worst-case {len(line)} chars for {len(names)} queries "
        "— shrink the line (or move more fields to BENCH_DETAIL.json) "
        "before the driver's tail capture truncates it again"
    )


def test_bench_session_disables_console_progress():
    # path resolved from this test file, not the cwd (ADVICE r7: pytest
    # invoked outside the repo root used to FileNotFoundError here)
    import os

    bench_path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    src = open(bench_path).read()
    assert "spark.ui.showConsoleProgress" in src and '"false"' in src
    assert 'setLogLevel("ERROR")' in src  # keeps WARN noise off the tail
