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
        ratio = s / u if u > 0 else float("inf")
        rows.append((ratio, name, u, s))
    rows.sort(reverse=True)

    flagged = [
        r for r in rows if r[0] > args.threshold and r[3] >= MIN_WALL
    ]
    wide = max((len(n) for _, n, _, _ in rows), default=5)
    print(f"{'query':<{wide}}  uniform_s  skewed_s  ratio")
    for ratio, name, u, s in rows[:25]:
        mark = " <-- FLAG" if (ratio, name, u, s) in flagged else ""
        print(f"{name:<{wide}}  {u:9.1f}  {s:8.1f}  {ratio:5.2f}{mark}")
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
        f"flagged >{args.threshold}x (skewed wall >= {MIN_WALL}s): "
        f"{[n for _, n, _, _ in flagged] or 'none'}"
    )
    tot_u = sum(u for _, _, u, _ in rows)
    tot_s = sum(s for _, _, _, s in rows)
    print(
        f"common-query wall: uniform {tot_u:.1f}s -> skewed {tot_s:.1f}s "
        f"({tot_s / tot_u:.2f}x)" if tot_u else "no common queries"
    )


if __name__ == "__main__":
    main()
