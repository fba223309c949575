"""Compare a skewed scale-gate artifact against its uniform twin.

VERDICT round-5 item #2's done-criterion: any query that regresses more
than THRESHOLD (default 3x) on the zipf/hot-key data versus uniform data
at the same scale factor gets a root-cause note in PERF.md. This tool
produces that worklist deterministically from the two committed
artifacts instead of eyeballing JSON:

    python tools/skew_compare.py SCALE_sf1.json SCALE_sf1_skew.json

Prints one line per common query — ratio, both wall times, status on
both sides — sorted by ratio descending, then a summary block. Exit 0
always (the gate artifacts carry the pass/fail; this is analysis).

Caveat: per-query walls under ~2 s are harness-dominated (JVM/cache
state when the gate reaches them), so ratios are only flagged when the
skewed wall also exceeds MIN_WALL — a 0.3 s -> 1.2 s swing is noise,
not a skew hazard.
"""

from __future__ import annotations

import argparse
import json

MIN_WALL = 2.0  # seconds on the skewed side before a ratio can flag


def load(path: str) -> dict:
    with open(path) as f:
        art = json.load(f)
    gate = art.get("gate") or {}
    return {
        "per_query": gate.get("per_query_sec") or {},
        "split": gate.get("per_query_split") or {},
        "skipped": gate.get("skipped") or {},
        "n_ok": gate.get("n_ok"),
        "exit_code": gate.get("exit_code"),
        "commit": art.get("commit"),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("uniform")
    ap.add_argument("skewed")
    ap.add_argument("--threshold", type=float, default=3.0)
    args = ap.parse_args()

    uni, skw = load(args.uniform), load(args.skewed)
    common = sorted(set(uni["per_query"]) & set(skw["per_query"]))
    rows = []
    for name in common:
        u, s = uni["per_query"][name], skw["per_query"][name]
        # When BOTH artifacts carry the eng/orc split for this query, the
        # flag ratio is computed on the ENGINE leg only — a DuckDB-side
        # slowdown on skewed data (the r6 u13/u02/d06 pattern: 1400-1700 s
        # pair-replay oracles with flat engine legs) must not flag a query
        # as an engine skew hazard. Total wall is the fallback for
        # artifacts predating per_query_split.
        us = uni["split"].get(name)
        ss = skw["split"].get(name)
        if us and ss:
            eu, es = us["eng"], ss["eng"]
            ratio = es / eu if eu > 0 else float("inf")
            rows.append((ratio, name, u, s, eu, es))
        else:
            ratio = s / u if u > 0 else float("inf")
            rows.append((ratio, name, u, s, None, None))
    rows.sort(key=lambda r: (r[0], r[1]), reverse=True)

    # the wall floor applies to the leg the ratio was computed on
    flagged = [
        r
        for r in rows
        if r[0] > args.threshold and (r[5] if r[5] is not None else r[3]) >= MIN_WALL
    ]
    wide = max((len(r[1]) for r in rows), default=5)
    print(f"{'query':<{wide}}  uniform_s  skewed_s  eng_u_s  eng_s_s  ratio(basis)")
    for r in rows[:25]:
        ratio, name, u, s, eu, es = r
        mark = " <-- FLAG" if r in flagged else ""
        if eu is not None:
            print(
                f"{name:<{wide}}  {u:9.1f}  {s:8.1f}  {eu:7.1f}  {es:7.1f}"
                f"  {ratio:5.2f} (eng){mark}"
            )
        else:
            print(
                f"{name:<{wide}}  {u:9.1f}  {s:8.1f}  {'-':>7}  {'-':>7}"
                f"  {ratio:5.2f} (wall){mark}"
            )
    print()
    print(
        f"common={len(common)}  uniform_only="
        f"{sorted(set(uni['per_query']) - set(skw['per_query']))}  "
        f"skew_only={sorted(set(skw['per_query']) - set(uni['per_query']))}"
    )
    print(
        f"skew-only skips: "
        f"{sorted(set(skw['skipped']) - set(uni['skipped']))}"
    )
    print(
        f"flagged >{args.threshold}x on ratio basis (flagged-side wall >= "
        f"{MIN_WALL}s): {[r[1] for r in flagged] or 'none'}"
    )
    tot_u = sum(r[2] for r in rows)
    tot_s = sum(r[3] for r in rows)
    print(
        f"common-query wall: uniform {tot_u:.1f}s -> skewed {tot_s:.1f}s "
        f"({tot_s / tot_u:.2f}x)" if tot_u else "no common queries"
    )


if __name__ == "__main__":
    main()
