"""Embedding similarity search.

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Queries broadcast against the corpus (one scan, no shuffle of the
  corpus side); per-pair cosine is a zip_with/aggregate expression
  (JVM-side, codegen). Linear in |corpus|×|queries|: right when the
  query set is small or recall must be exact.
- ``lsh_cosine_topk``: random-hyperplane LSH — the 100 TB path. Each
  vector maps to a small bucket key (sign bits against P fixed
  hyperplanes); candidates share a bucket (multi-probe within Hamming
  radius optional), then exact rerank. Corpus side is bucketed once
  (reusable across query batches).
- ``cosine_near_pairs``: all-pairs near-duplicate detection above a
  cosine threshold, LSH-bucketed to avoid the quadratic cross join.

Hyperplanes are deterministic (seeded numpy, embedded as literals) so
results are reproducible across runs and engines.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query (self-matches excluded).
    Output: query_id, neighbor_id, rnk — ties broken by neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def bucket_key(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id against fixed hyperplanes (int key)."""
    key = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        key = key + bit.cast("bigint")
    return key


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    multi_probe: int = 0,
) -> DataFrame:
    """ANN top-k: bucket join on hyperplane sign keys, exact rerank
    within bucket. ``multi_probe=p`` also probes every bucket within
    Hamming distance 1 of the query's key for the first p planes —
    recall rises toward exact at the cost of (1+p)× candidate volume
    (the standard LSH recall/cost dial; the corpus stays bucketed
    once either way)."""
    dim = len(corpus.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", bucket_key(F.col("qv"), planes))
    if multi_probe > 0:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i))
                for i in range(min(multi_probe, n_planes))
            ],
        )
        q = q.withColumn("bucket", F.explode(probes))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    ).withColumn("bucket", bucket_key(F.col("cv"), planes))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos")
        )
    )
    if multi_probe > 0:
        # a neighbor can surface via several probed buckets — dedupe
        # before ranking or it would occupy multiple top-k slots
        scored = scored.dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk")
    )


def cosine_near_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.999,
    n_planes: int = 8,
    seed: int = 42,
    bucketed: bool = True,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold, id_a < id_b).
    ``bucketed=False`` runs the exact quadratic variant (oracle mode)."""
    v = df.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    )
    if bucketed:
        dim = len(df.select(vec_col).first()[0])
        planes = hyperplanes(dim, n_planes, seed)
        v = v.withColumn("bucket", bucket_key(F.col("v"), planes))
        joined = v.alias("a").join(
            v.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
    else:
        joined = v.alias("a").join(v.alias("b"), F.col("a.id") < F.col("b.id"))
    return (
        joined.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 3).alias("cos_r"))
    )
