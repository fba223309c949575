"""Deterministic synthetic-testdata generator (any scale factor).

Reproduces the SCHEMA and distribution SHAPE of the driver-generated
tables in /root/testdata (TESTDATA.md) so the engine can be
scale-proofed beyond the provided sf0.1 — the driver's own generator is
not available, so row values will differ, but dtypes, key ranges,
cardinality ratios, categorical domains, vocab, unit-norm embeddings,
and the naive-micros timestamp physical (Spark 4 infers TIMESTAMP_NTZ;
tables.read_table normalizes) all match. Correctness at the generated
scale is judged by the same DuckDB-oracle gate (both engines read the
SAME files), so exact value parity with the driver data is not needed.

Usage: python tools/gen_testdata.py SF OUTDIR   (e.g. 1 .localdata/sf1)

Row counts scale linearly from the observed driver data (sf0.01 →
sf0.1 ratios), except embeddings which follow the driver's observed
sub-linear curve 500·(100·sf)^0.6 (500 → 2000 over that decade).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260814

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
ADJ = ["small", "red", "blue", "green", "big", "shiny", "dark", "light"]
NOUN = ["ring", "widget", "bolt", "gear", "cog", "lever", "plate", "rod"]
# the 31-word vocabulary observed in the driver documents
VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark a "
    "the line sort window order data column join small customer query big "
    "group stream filter vector"
).split()


def _hot_mix(rng, n_keys: int, n: int, hot_frac: float = 0.30):
    """Hot-entity key skew: ``hot_frac`` of all draws hit key 0, the
    rest stay uniform — the 30%-hot-key shape that breaks naive
    hash-partitioned joins/aggregations at scale (one reducer gets
    hot_frac of the table). Used by ``--skew`` to give the salting /
    AQE-skew-join machinery a data-level proof, not just a plan test."""
    u = rng.integers(0, max(n_keys, 1), n)
    return np.where(rng.random(n) < hot_frac, 0, u)


def _zipf_p(k: int, alpha: float = 1.2):
    """Truncated zipf(alpha) pmf over ranks 1..k (top rank ~28% mass at
    k=31, alpha=1.2)."""
    p = 1.0 / np.arange(1, k + 1) ** alpha
    return p / p.sum()


def _ts_us(days_from: str, span_days: float, rng, n, midnight=False):
    base = np.datetime64(days_from, "us")
    if midnight:
        offs = rng.integers(0, int(span_days), n) * 86_400_000_000
        return base + offs.astype("timedelta64[us]")
    offs = rng.integers(0, int(span_days * 86_400_000_000), n)
    return base + offs.astype("timedelta64[us]")


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows")


def generate(sf: float, outdir: str, skew: bool = False) -> None:
    """``skew=True`` switches the foreign keys and the document token
    distribution from uniform to skewed (30%-hot key via ``_hot_mix``,
    zipf(1.2) vocabulary) while keeping schema, domains, and row counts
    identical — the adversarial layout for shuffle-heavy plans."""
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(round(500 * (100 * sf) ** 0.6))

    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(0, 10_000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))
    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(0, 10_000, n_supp), 2),
    }))
    pk = np.arange(n_part)
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(pk, pa.int64()),
        "p_name": [
            f"{ADJ[i % len(ADJ)]} {NOUN[(i // len(ADJ)) % len(NOUN)]}"
            for i in range(n_part)
        ],
        "p_brand": [f"Brand#{1 + i % 25}" for i in range(n_part)],
        "p_type": np.array(PTYPES)[rng.integers(0, len(PTYPES), n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + pk * 0.1, 2),
    }))
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(
            _hot_mix(rng, n_cust, n_ord) if skew
            else rng.integers(0, max(n_cust, 1), n_ord), pa.int64()),
        "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1_000, 500_000, n_ord), 2),
        "o_orderdate": pa.array(
            _ts_us("1995-01-01", 2404, rng, n_ord, midnight=True),
            pa.timestamp("us"),
        ),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(
            _hot_mix(rng, n_ord, n_li, hot_frac=0.10) if skew
            else rng.integers(0, max(n_ord, 1), n_li), pa.int64()),
        "l_partkey": pa.array(
            _hot_mix(rng, n_part, n_li) if skew
            else rng.integers(0, max(n_part, 1), n_li), pa.int64()),
        "l_suppkey": pa.array(
            _hot_mix(rng, n_supp, n_li) if skew
            else rng.integers(0, max(n_supp, 1), n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(
            _ts_us("1995-01-01", 2500, rng, n_li, midnight=True),
            pa.timestamp("us"),
        ),
    }))
    _write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(_ts_us("2024-01-01", 30, rng, n_ev), pa.timestamp("us")),
        "user_id": pa.array(
            _hot_mix(rng, n_users, n_ev) if skew
            else rng.integers(0, max(n_users, 1), n_ev), pa.int64()),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0.01, 490.02, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))
    # documents: 10-110 words over the 31-word vocab (unique w.h.p.)
    lens = rng.integers(10, 111, n_doc)
    flat = (
        rng.choice(len(VOCAB), int(lens.sum()), p=_zipf_p(len(VOCAB)))
        if skew
        else rng.integers(0, len(VOCAB), int(lens.sum()))
    )
    texts, pos = [], 0
    varr = np.array(VOCAB)
    for ln in lens:
        texts.append(" ".join(varr[flat[pos : pos + ln]]))
        pos += ln
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": np.where(rng.random(n_doc) < 0.9, "en", "es"),
        "source": [f"src{i}" for i in (
            _hot_mix(rng, 20, n_doc) if skew else rng.integers(0, 20, n_doc))],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))
    # embeddings: unit-norm 64-dim, weak label clusters (centroid pull
    # ~0.12 reproduces the observed within-label dot ≈ 0.013)
    labels = rng.integers(0, 10, n_emb)
    cents = rng.standard_normal((10, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    v = rng.standard_normal((n_emb, 64)) + 0.35 * cents[labels]
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(
            [row for row in v.astype(np.float32)], pa.list_(pa.float32())
        ),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--skew"]
    generate(float(argv[0]), argv[1], skew="--skew" in sys.argv[1:])
