"""Similarity-search query surface over ``embeddings``.

s01 (brute-force exact) and s02 (threshold near-dup) are oracle-checked
against DuckDB list arithmetic; s03 is the LSH scale path whose recall
is validated in unit tests against the brute-force baseline (rows-only
for the driver, as an approximate operator has no exact SQL oracle).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from gov_ec_pipeline_etl_spark.operators.similarity import (
    cosine_near_pairs,
    cosine_topk,
    lsh_cosine_topk,
)
from gov_ec_pipeline_etl_spark.plans.registry import register
from gov_ec_pipeline_etl_spark.plans.util import T

_COS_SQL = """
  list_dot_product(a.emb_d, b.emb_d)
  / (sqrt(list_dot_product(a.emb_d, a.emb_d)) * sqrt(list_dot_product(b.emb_d, b.emb_d)))
"""


@register(
    "s01_cosine_topk",
    oracle=f"""
        WITH vecs AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb_d
          FROM embeddings
        ),
        scored AS (
          SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id,
                 {_COS_SQL} AS cos
          FROM vecs a, vecs b
          WHERE b.vec_id < 10 AND a.vec_id <> b.vec_id
        )
        SELECT query_id, neighbor_id, rnk FROM (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY cos DESC, neighbor_id
                 ) AS rnk
          FROM scored
        ) WHERE rnk <= 5
    """,
    doc="Exact brute-force cosine top-5 for 10 query vectors: broadcast "
    "queries × corpus scan, unrolled whole-stage-codegen dot products "
    "(norms precomputed per side), window top-k. The exact-recall "
    "baseline every ANN variant is judged against.",
    bench=True,
    tags=("similarity", "llm-pipeline"),
)
def s01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = T(spark, sf_dir, "embeddings")
    return cosine_topk(emb.where(F.col("vec_id") < 10), emb, k=5)


_S02_CORPUS_CTE = """corpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 1000000,
                 list_transform(embedding, x -> CAST(x * 1.5 AS FLOAT))
          FROM embeddings
        ),
        vecs AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb_d
          FROM corpus
        )"""


def _s02_exact_oracle() -> str:
    """The original intentionally-quadratic exact scan. No longer the
    registered oracle (>20 min in DuckDB at sf1 — the last uniform-sf1
    gate skip, VERDICT r9 #6); kept as the ground truth the bounded
    oracle is equality-tested against at small sf
    (tests/test_llm_ops.py::test_s02_bounded_oracle_equals_exact)."""
    return f"""
        WITH {_S02_CORPUS_CTE}
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND({_COS_SQL}, 3) AS cos_r
        FROM vecs a, vecs b
        WHERE a.vec_id < b.vec_id
          AND {_COS_SQL} >= 0.999
    """


def _s02_bounded_sql(dim: int, plane_sets: list[list[list[float]]]) -> str:
    """Bounded s02 oracle: replay the engine's banded hyperplane
    bucketing in SQL (candidates = pairs sharing ANY band key), then
    exact-cosine verify — the same candidate-then-verify shape the
    engine runs, so oracle cost is bucket-join-bounded instead of
    quadratic. Sign bits use the left-associated literal chain; the
    engine's ``band_keys_udf`` uses a BLAS matmul, which is not
    bit-identical on near-zero projections, but the admissible pairs
    (cosine ≥ 0.999, i.e. near-parallel — in this fixture exactly
    positively-scaled copies) get proportional projections whose signs
    agree under EVERY summation order, so the true-pair candidate sets
    coincide and the exact verify kills any differing false candidates
    on both sides identically (the same argument band_keys_udf's
    docstring makes for banded-vs-single-table engine equality,
    regression-tested there; bounded-vs-exact oracle equality is
    unit-tested for both branch shapes)."""
    band_structs = []
    for b, planes in enumerate(plane_sets):
        bits = []
        for i, p in enumerate(planes):
            proj = " + ".join(
                f"emb_d[{j + 1}]*CAST('{float(c)!r}' AS DOUBLE)"
                for j, c in enumerate(p)
            )
            bits.append(
                f"(CASE WHEN {proj} >= 0 THEN CAST({1 << i} AS BIGINT)"
                " ELSE CAST(0 AS BIGINT) END)"
            )
        band_structs.append(f"{{'b': {b}, 'k': {' + '.join(bits)}}}")
    return f"""
        WITH {_S02_CORPUS_CTE},
        keyed AS (
          SELECT vec_id, unnest([{', '.join(band_structs)}]) AS bk FROM vecs
        ),
        cand AS (
          SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
          FROM keyed x JOIN keyed y
            ON x.bk.b = y.bk.b AND x.bk.k = y.bk.k AND x.vec_id < y.vec_id
        )
        SELECT c.id_a, c.id_b, ROUND({_COS_SQL}, 3) AS cos_r
        FROM cand c
        JOIN vecs a ON a.vec_id = c.id_a
        JOIN vecs b ON b.vec_id = c.id_b
        WHERE {_COS_SQL} >= 0.999
    """


def _s02_bounded_oracle(sf_dir: str, dim: int = 64) -> str:
    """sf-aware bounded oracle mirroring s02's stats-based strategy
    pick EXACTLY (same footer row count, same threshold, same plane
    seeds), so the replayed bucketing is the one the engine ran."""
    from gov_ec_pipeline_etl_spark.operators.similarity import hyperplanes
    from gov_ec_pipeline_etl_spark.tables import table_rows

    if table_rows(sf_dir, "embeddings") * 2 > 10_000:
        plane_sets = [hyperplanes(dim, 12, 42 + 101 * b) for b in range(4)]
    else:
        plane_sets = [hyperplanes(dim, 8, 42)]
    return _s02_bounded_sql(dim, plane_sets)


@register(
    "s02_embedding_neardup",
    bench=True,
    oracle=_s02_bounded_oracle,
    doc="Embedding near-duplicate pairs (cosine ≥ 0.999) on a corpus "
    "with planted scaled copies (scaling preserves cosine). The engine "
    "runs the LSH-BUCKETED path (hyperplane sign buckets → in-bucket "
    "pairs only — no quadratic cross join); the oracle replays the "
    "SAME banded bucketing + exact-cosine verify in SQL (VERDICT r9 "
    "#6: the previous exact-quadratic oracle was the last uniform-sf1 "
    "gate skip at >20 min DuckDB), picking the branch via the same "
    "footer-row-count rule the engine uses. The quadratic ground truth "
    "is retained as _s02_exact_oracle and the bounded form is "
    "equality-tested against it for both branch shapes at small sf, "
    "preserving the LSH recall validation the old oracle provided.",
    tags=("similarity", "dedup", "lsh", "llm-pipeline"),
)
def s02_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.tables import table_rows

    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # one planted scaled copy per corpus vector — PLANT_COPIES sizes the
    # strategy pick below, so changing the planting rule changes both
    PLANT_COPIES = 1
    planted = emb.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(1.5)).cast("float")
        ).alias("embedding"),
    )
    corpus = emb.unionByName(planted)
    # Stats-based physical strategy (output identical either way —
    # scaled copies share signs under every plane set): small corpora
    # take the single 8-plane table; past ~10k vectors switch to banded
    # LSH (12 planes × 4 bands), whose driver-side plan constant
    # amortizes while bucket occupancy stays ~1 (the sf1 bench measured
    # the fixed-256-bucket table going quadratic in occupancy: 5.1×
    # cost for 4× corpus; banded crossover measured at ~6k vectors).
    # 4-band OR-construction holds ≥0.999-recall at ~0.9994 — math in
    # cosine_near_pairs. Corpus size comes from parquet FOOTER metadata
    # (table_rows): merely constructing this plan must not run a count
    # job over the source.
    if table_rows(sf_dir, "embeddings") * (1 + PLANT_COPIES) > 10_000:
        return cosine_near_pairs(
            corpus, threshold=0.999, bucketed=True, n_planes=12, bands=4
        )
    return cosine_near_pairs(corpus, threshold=0.999, bucketed=True)


def _keyed_cte(dim: int = 64, n_planes: int = 8) -> str:
    """``keyed AS (…)`` CTE replaying the engine's hyperplane bucket key
    in DuckDB SQL. The LSH is DETERMINISTIC literal arithmetic (seeded
    hyperplanes embedded as double literals), so DuckDB can reproduce
    the bucket keys — each sign bit is the same left-associated
    projection sum the engine's ``bucket_key_udf`` folds
    dimension-by-dimension in its Arrow kernel (strict sequential
    accumulation, no matmul, precisely so this replay stays
    bit-identical). ``dim`` is
    pinned to the testdata embedding width (64 at every sf); the engine
    side still reads it from data, and a mismatch surfaces as an oracle
    failure rather than silence. Shared by s03 (full bucket+rerank
    replay) and u19 (recall measurement against the exact scan)."""
    from gov_ec_pipeline_etl_spark.operators.similarity import hyperplanes

    bits = []
    for i, p in enumerate(hyperplanes(dim, n_planes)):
        # v is 1-indexed in DuckDB; CAST('…' AS DOUBLE) is strtod — the
        # same correctly-rounded double Spark parses from the D-suffixed
        # literal, so the sign tests agree bit-for-bit
        proj = " + ".join(
            f"v[{j + 1}]*CAST('{float(c)!r}' AS DOUBLE)" for j, c in enumerate(p)
        )
        bits.append(
            f"(CASE WHEN {proj} >= 0 THEN CAST({1 << i} AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END)"
        )
    bucket_sql = " + ".join(bits)
    return f"""keyed AS (
          SELECT vec_id, v,
                 sqrt(list_dot_product(v, v)) AS n,
                 ({bucket_sql}) AS bucket
          FROM (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
          )
        )"""


def _lsh_oracle(
    dim: int = 64, n_planes: int = 8, k: int = 5, n_queries: int = 10
) -> str:
    """Full SQL oracle for the hyperplane-LSH ANN: bucket equi-join,
    exact cosine rerank, and top-k, exactly as d02's MinHash signature
    math is oracled (bucket-key replay in ``_keyed_cte``)."""
    return f"""
        WITH {_keyed_cte(dim, n_planes)},
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 list_dot_product(q.v, c.v) / (q.n * c.n) AS cos
          FROM keyed c JOIN keyed q ON c.bucket = q.bucket
          WHERE q.vec_id < {n_queries} AND c.vec_id <> q.vec_id
        )
        SELECT query_id, neighbor_id, rnk FROM (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY cos DESC, neighbor_id
                 ) AS rnk
          FROM scored
        ) WHERE rnk <= {k}
    """


@register(
    "s03_ann_lsh_topk",
    oracle=_lsh_oracle(),
    doc="Random-hyperplane LSH ANN top-5: bucket join + exact rerank. "
    "The production path at corpus scale — the corpus is bucketed once "
    "and reused; per-query work is one bucket, not the full corpus. "
    "The hyperplanes are deterministic literals, so the oracle replays "
    "the full bucket+rerank math in SQL (recall vs brute force is "
    "additionally unit-tested).",
    tags=("similarity", "ann", "lsh", "llm-pipeline"),
)
def s03_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = T(spark, sf_dir, "embeddings")
    return lsh_cosine_topk(
        emb.where(F.col("vec_id") < 10), emb, k=5, n_planes=8
    )


@register(
    "s04_centroid_assign",
    oracle=f"""
        WITH vecs AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb_d
          FROM embeddings
        ),
        cents AS (SELECT vec_id AS cent_id, emb_d AS cv FROM vecs WHERE vec_id < 8),
        scored AS (
          SELECT v.vec_id, c.cent_id,
                 {_COS_SQL.replace('a.emb_d', 'v.emb_d').replace('b.emb_d', 'c.cv')} AS cos
          FROM vecs v, cents c
        )
        SELECT cent_id, COUNT(*) AS n_assigned FROM (
          SELECT vec_id, arg_max(cent_id, cos) AS cent_id
          FROM scored
          GROUP BY vec_id
        ) GROUP BY cent_id
    """,
    doc="IVF building block: assign every vector to its nearest of K=8 "
    "fixed centroids (cosine argmax), return cluster sizes. Exact cosine "
    "ties cannot occur on continuous embeddings, so argmax is "
    "well-defined on both engines (the Spark side still carries an "
    "explicit low-centroid-id tie-break for total determinism). One "
    "corpus scan; centroids broadcast.",
    tags=("similarity", "ivf", "llm-pipeline"),
)
def s04_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.similarity import (
        as_double,
        cosine,
        vec_dim,
    )

    emb = T(spark, sf_dir, "embeddings")
    dim = vec_dim(emb, "embedding")
    vecs = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    cents = vecs.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cent_id", cosine("v", "cv", dim).alias("cos")
    )
    assigned = scored.groupBy("vec_id").agg(
        F.min_by("cent_id", F.struct((-F.col("cos")).alias("s"), "cent_id")).alias(
            "cent_id"
        )
    )
    return assigned.groupBy("cent_id").agg(F.count(F.lit(1)).alias("n_assigned"))


@register(
    "s05_kmeans_step",
    oracle=f"""
        WITH vecs AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb_d
          FROM embeddings
        ),
        cents AS (SELECT vec_id AS cent_id, emb_d AS cv FROM vecs WHERE vec_id < 8),
        scored AS (
          SELECT v.vec_id, c.cent_id, v.emb_d,
                 {_COS_SQL.replace('a.emb_d', 'v.emb_d').replace('b.emb_d', 'c.cv')} AS cos
          FROM vecs v, cents c
        ),
        assigned AS (
          SELECT vec_id, arg_max(cent_id, cos) AS cent_id
          FROM scored GROUP BY vec_id
        )
        SELECT a.cent_id,
               COUNT(*) AS n_members,
               ROUND(AVG(list_sum(v.emb_d)), 6) AS mean_component_sum
        FROM assigned a JOIN vecs v USING (vec_id)
        GROUP BY a.cent_id
    """,
    doc="One Lloyd iteration of k-means (k=8 seeded from the corpus): "
    "assign → per-cluster mean statistics. The full iterative loop runs "
    "this plan to a fixpoint driver-side; each iteration is one broadcast "
    "join + two aggregations, no collect of vectors.",
    tags=("similarity", "kmeans", "iterative", "llm-pipeline"),
)
def s05_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.similarity import (
        as_double,
        cosine,
        vec_dim,
    )

    emb = T(spark, sf_dir, "embeddings")
    dim = vec_dim(emb, "embedding")
    vecs = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    cents = vecs.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id", "v", "cent_id", cosine("v", "cv", dim).alias("cos")
    )
    assigned = scored.groupBy("vec_id").agg(
        F.max_by("cent_id", "cos").alias("cent_id"),
        F.first("v").alias("v"),
    )
    # unrolled component sum (same left-to-right order as list_sum),
    # built as one SQL string for plan-time economy
    comp_sum = F.expr(" + ".join(f"v[{i}]" for i in range(dim)))
    return assigned.groupBy("cent_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.avg(comp_sum), 6).alias("mean_component_sum"),
    )


def _ann_recall_oracle(
    dim: int = 64, n_planes: int = 8, k: int = 5, n_queries: int = 10
) -> str:
    """Recall@k of the LSH ANN vs the exact scan, both replayed in SQL
    from the same ``keyed`` CTE (exact ignores the bucket column)."""
    topk = f"""
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY query_id ORDER BY cos DESC, neighbor_id
                   ) AS rnk
            FROM {{src}}
          ) WHERE rnk <= {k}
    """
    return f"""
        WITH {_keyed_cte(dim, n_planes)},
        exact_scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 list_dot_product(q.v, c.v) / (q.n * c.n) AS cos
          FROM keyed c, keyed q
          WHERE q.vec_id < {n_queries} AND c.vec_id <> q.vec_id
        ),
        ann_scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 list_dot_product(q.v, c.v) / (q.n * c.n) AS cos
          FROM keyed c JOIN keyed q ON c.bucket = q.bucket
          WHERE q.vec_id < {n_queries} AND c.vec_id <> q.vec_id
        ),
        exact AS ({topk.format(src='exact_scored')}),
        ann AS ({topk.format(src='ann_scored')}),
        hit AS (
          SELECT e.query_id,
                 CAST(COUNT(*) AS BIGINT) AS n_exact,
                 CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
          FROM exact e LEFT JOIN ann a
            ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
          GROUP BY e.query_id
        ),
        acnt AS (
          SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_ann
          FROM ann GROUP BY query_id
        )
        SELECT h.query_id, h.n_exact,
               CAST(COALESCE(a.n_ann, 0) AS BIGINT) AS n_ann, h.n_hit,
               ROUND(CAST(h.n_hit AS DOUBLE) / h.n_exact, 3) AS recall_at_k
        FROM hit h LEFT JOIN acnt a ON h.query_id = a.query_id
    """


@register(
    "u19_ann_recall",
    bench=True,
    oracle=_ann_recall_oracle(),
    doc="In-engine ANN quality measurement: recall@5 of the hyperplane-"
    "LSH top-k (s03's path) against the exact brute-force top-k (s01's "
    "path), per query vector. The operational gate a 100 TB corpus "
    "needs before trusting the approximate path — recall is computed "
    "by the engine itself (set intersection of the two top-k results), "
    "not by an offline notebook. Both sides and the recall arithmetic "
    "are fully replayed by the DuckDB oracle from the same seeded-"
    "hyperplane literals, so the measurement itself is cross-engine "
    "verified. Tiny aggregates (k rows per query) — the expensive parts "
    "are the same bucketed/broadcast plans s01/s03 already carry.",
    tags=("similarity", "ann", "lsh", "quality", "llm-pipeline"),
)
def u19_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.similarity import topk_recall

    emb = T(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    return topk_recall(
        cosine_topk(q, emb, k=5), lsh_cosine_topk(q, emb, k=5, n_planes=8)
    )


def _pq_oracle(dim: int = 64, m: int = 8, k_codes: int = 4) -> str:
    """Replay of pq_assignments: same low-id codebook seeding, same
    norm-expanded squared-L2 (list_dot_product is the same sequential
    sum the unrolled Spark kernel evaluates), same (dist, code)
    tie-break."""
    d = dim // m
    sq = (
        "(list_dot_product(t.x, t.x)) + (list_dot_product(cb.c, cb.c))"
        " - 2*(list_dot_product(t.x, cb.c))"
    )
    return f"""
        WITH vecs AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        sliced AS (
          SELECT vec_id, CAST(u.s AS INTEGER) AS sub,
                 list_slice(v, u.s*{d}+1, u.s*{d}+{d}) AS x
          FROM vecs, UNNEST(range(0, {m})) AS u(s)
        ),
        codebook AS (
          SELECT vec_id AS code, sub, x AS c FROM sliced
          WHERE vec_id < {k_codes}
        ),
        scored AS (
          SELECT t.vec_id, t.sub, cb.code, {sq} AS dist
          FROM sliced t JOIN codebook cb USING (sub)
        )
        SELECT vec_id, sub, code, ROUND(dist, 6) AS sqerr_r FROM (
          SELECT vec_id, sub, code, dist,
                 ROW_NUMBER() OVER (
                   PARTITION BY vec_id, sub ORDER BY dist, code
                 ) AS rn
          FROM scored
        ) WHERE rn = 1
    """


@register(
    "u23_pq_encode",
    bench=True,
    oracle=_pq_oracle(),
    doc="Product quantization encode + reconstruction loss: each 64-dim "
    "vector becomes 8 sub-space code ids (nearest codeword by squared "
    "L2, codebooks seeded from the corpus head — the deterministic rule "
    "the IVF build oracles). PQ is the memory half of the ANN scale "
    "story: IVF prunes WHICH vectors a query scores, PQ shrinks WHAT "
    "each stored vector costs (dim·4 bytes → m bytes + codebook). "
    "Plan: posexplode into sub-slices, broadcast the m·k codebook, "
    "min_by — one shuffle, codegen distance arithmetic, linear in the "
    "corpus. Fully oracled: deterministic seeding makes the approximate "
    "index exactly replayable, like u06's IVF.",
    tags=("similarity", "ann", "quantization", "llm-pipeline"),
)
def u23_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.similarity import pq_assignments

    emb = T(spark, sf_dir, "embeddings")
    return pq_assignments(emb, m=8, k_codes=4).select(
        "vec_id", "sub", "code", F.round("sqerr", 6).alias("sqerr_r")
    )


def _lloyd_assign_ctes(dim: int = 64, k: int = 8, iters: int = 3) -> list[str]:
    """CTE parts ``c0, a1, c1, … a{iters}`` unrolling Lloyd k-means over
    a prior CTE ``vecs(vec_id, v)``: assignment by norm-expanded squared
    L2 (same sequential-sum shape as the Spark kernel), centroid update
    as per-dimension AVG reassembled in dimension order. The final
    assignment CTE is ``a{iters}`` — integer output, so cross-engine
    float summation-order ulps in the interior centroids cannot surface
    unless a vector sits exactly on a Voronoi boundary (none do in this
    corpus; same risk class s05/u06 carry)."""
    sq = (
        "(list_dot_product(x.v, x.v)) + (list_dot_product(c.cv, c.cv))"
        " - 2*(list_dot_product(x.v, c.cv))"
    )
    parts = [
        f"c0 AS (SELECT vec_id AS cent_id, v AS cv FROM vecs WHERE vec_id < {k})",
    ]
    for i in range(1, iters + 1):
        parts.append(f"""a{i} AS (
          SELECT vec_id, cent_id FROM (
            SELECT x.vec_id, c.cent_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY x.vec_id ORDER BY {sq}, c.cent_id
                   ) AS rn
            FROM vecs x, c{i - 1} c
          ) WHERE rn = 1
        )""")
        if i < iters:
            parts.append(f"""c{i} AS (
          SELECT cent_id, list(m ORDER BY d) AS cv FROM (
            SELECT a.cent_id, u.d, AVG(x.v[u.d]) AS m
            FROM a{i} a JOIN vecs x USING (vec_id),
                 UNNEST(range(1, {dim + 1})) AS u(d)
            GROUP BY a.cent_id, u.d
          ) GROUP BY cent_id
        )""")
    return parts


def _lloyd_oracle(dim: int = 64, k: int = 8, iters: int = 3) -> str:
    """Full-corpus Lloyd replay over the raw embeddings table."""
    parts = [
        """vecs AS (
          SELECT vec_id, list_transform(embedding, y -> CAST(y AS DOUBLE)) AS v
          FROM embeddings
        )""",
        *_lloyd_assign_ctes(dim, k, iters),
    ]
    ctes = ",\n        ".join(parts)
    return f"""
        WITH {ctes}
        SELECT a.vec_id, a.cent_id FROM a{iters} a
    """


@register(
    "u24_kmeans_lloyd",
    oracle=_lloyd_oracle(),
    doc="Lloyd k-means run for 3 full iterations (k=8 seeded from the "
    "corpus head): the iterative-algorithm form s05's single step "
    "promises. Each iteration is one broadcast join (centroids are "
    "k·dim doubles — catalog-scale) + an argmin groupBy + a per-"
    "dimension AVG reassembled into the next centroid array; vectors "
    "never leave the executors and nothing is collected. The driver "
    "composes the 3-iteration plan lazily; at a real fixpoint loop the "
    "centroid table would be checkpointed per round to cut lineage. "
    "Output is the final integer assignment, fully replayed by a "
    "3-iteration unrolled CTE chain in the oracle.",
    tags=("similarity", "kmeans", "iterative", "llm-pipeline"),
)
def u24_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.similarity import kmeans_lloyd

    return kmeans_lloyd(T(spark, sf_dir, "embeddings"), k=8, iters=3)


def _semantic_oracle(
    dim: int = 64, k: int = 8, iters: int = 2, threshold: float = 0.99
) -> str:
    """SemDeDup replay: normalize the planted corpus to the unit sphere,
    run the unrolled Lloyd chain on the unit vectors, then pair within
    clusters by exact dot product. Every stage is the same IEEE
    arithmetic the engine runs (sequential dots, correctly-rounded
    sqrt/divide), so the pair set is bit-identical cross-engine."""
    parts = [
        """corpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 1000000,
                 list_transform(embedding, x -> CAST(x * 1.5 AS FLOAT))
          FROM embeddings
        )""",
        """raw AS (
          SELECT vec_id,
                 list_transform(embedding, y -> CAST(y AS DOUBLE)) AS v0
          FROM corpus
        )""",
        """vecs AS (
          SELECT vec_id,
                 list_transform(v0,
                   x -> x / sqrt(list_dot_product(v0, v0))) AS v
          FROM raw WHERE list_dot_product(v0, v0) > 0
        )""",
        *_lloyd_assign_ctes(dim, k, iters),
    ]
    ctes = ",\n        ".join(parts)
    return f"""
        WITH {ctes}
        SELECT a.cent_id, a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_dot_product(x.v, y.v), 6) AS cos_r
        FROM a{iters} a
        JOIN a{iters} b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
        JOIN vecs x ON x.vec_id = a.vec_id
        JOIN vecs y ON y.vec_id = b.vec_id
        WHERE list_dot_product(x.v, y.v) >= {threshold}
    """


def _semantic_k(sf_dir: str) -> int:
    """SemDeDup's k scales with the corpus (k ≈ n / target_cluster_size,
    target 500 here) so within-cluster candidate pairs stay flat as the
    corpus grows. Corpus size comes from the parquet FOOTER (table_rows)
    — constructing the plan must not run a count job. The oracle is a
    callable resolved at the same sf_dir, so both engines pick the same
    k."""
    from gov_ec_pipeline_etl_spark.tables import table_rows

    return max(8, (2 * table_rows(sf_dir, "embeddings")) // 500)


@register(
    "u31_semantic_neardup",
    bench=True,
    oracle=lambda sf_dir: _semantic_oracle(k=_semantic_k(sf_dir)),
    doc="SemDeDup-style semantic near-dup (Abbas et al. 2023): unit-"
    "normalize, deterministic spherical Lloyd k-means (2 iterations, "
    "k=8, low-id seeding), cosine >= 0.99 pairs WITHIN clusters only — "
    "candidate generation bounded by Σ cluster_size² instead of the "
    "quadratic corpus (at 100 TB, k scales as n/target_cluster_size so "
    "per-cluster work stays flat). Complements s02's LSH: projection "
    "buckets vs learned-density clusters. Corpus carries the s02 "
    "planted scaled copies (scaling preserves the unit vector, so "
    "every plant pairs with its source at cos ≈ 1). The oracle replays "
    "normalization + the full Lloyd chain + in-cluster pairing — the "
    "cluster-boundary recall loss the paper accepts is replayed "
    "identically, not hidden.",
    tags=("similarity", "dedup", "kmeans", "llm-pipeline"),
)
def u31_semantic_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.similarity import (
        semantic_neardup_pairs,
    )

    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(1.5)).cast("float")
        ).alias("embedding"),
    )
    corpus = emb.unionByName(planted)
    return semantic_neardup_pairs(
        corpus, k=_semantic_k(sf_dir), iters=2, threshold=0.99
    )


def _ivfpq_ctes(
    dim: int = 64,
    k_cent: int = 8,
    nprobe: int = 2,
    m: int = 8,
    k_codes: int = 4,
    k: int = 5,
    n_queries: int = 10,
) -> str:
    """CTE-body replay of ivfpq_topk (ends in an ``ivfpq`` CTE): IVF
    assignment (cosine argmax, low-id tie-break), PQ codes
    (norm-expanded squared L2, low-code tie-break), per-query ADC
    lookup table, Σ_sub ADC ranking. Shared by u25 (result itself) and
    u26 (recall of that result vs the exact scan)."""
    d = dim // m
    cos = (
        "list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )
    sq = (
        "(list_dot_product({a}, {a})) + (list_dot_product({b}, {b}))"
        " - 2*(list_dot_product({a}, {b}))"
    )
    return f"""vecs AS (
          SELECT vec_id, list_transform(embedding, y -> CAST(y AS DOUBLE)) AS v
          FROM embeddings
        ),
        cents AS (
          SELECT vec_id AS cent_id, v AS cv FROM vecs WHERE vec_id < {k_cent}
        ),
        assigned AS (
          SELECT vec_id, cent_id, v FROM (
            SELECT x.vec_id, c.cent_id, x.v,
                   ROW_NUMBER() OVER (
                     PARTITION BY x.vec_id
                     ORDER BY {cos.format(a='x.v', b='c.cv')} DESC, c.cent_id
                   ) AS rn
            FROM vecs x, cents c
          ) WHERE rn = 1
        ),
        codebook AS (
          SELECT vec_id AS code, CAST(u.s AS INTEGER) AS sub,
                 list_slice(v, u.s*{d}+1, u.s*{d}+{d}) AS c
          FROM vecs, UNNEST(range(0, {m})) AS u(s)
          WHERE vec_id < {k_codes}
        ),
        codes AS (
          SELECT vec_id, cent_id, sub, code FROM (
            SELECT a.vec_id, a.cent_id, cb.sub, cb.code,
                   ROW_NUMBER() OVER (
                     PARTITION BY a.vec_id, cb.sub
                     ORDER BY {sq.format(
                         a=f"list_slice(a.v, cb.sub*{d}+1, cb.sub*{d}+{d})",
                         b='cb.c')}, cb.code
                   ) AS rn
            FROM assigned a, codebook cb
          ) WHERE rn = 1
        ),
        queries AS (
          SELECT vec_id AS query_id, v AS qv FROM vecs
          WHERE vec_id < {n_queries}
        ),
        probes AS (
          SELECT query_id, cent_id FROM (
            SELECT q.query_id, c.cent_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY q.query_id
                     ORDER BY {cos.format(a='q.qv', b='c.cv')} DESC, c.cent_id
                   ) AS pr
            FROM queries q, cents c
          ) WHERE pr <= {nprobe}
        ),
        lut AS (
          SELECT q.query_id, cb.sub, cb.code,
                 {sq.format(
                     a=f"list_slice(q.qv, cb.sub*{d}+1, cb.sub*{d}+{d})",
                     b='cb.c')} AS dq
          FROM queries q, codebook cb
        ),
        scored AS (
          SELECT c.query_id, k.vec_id AS neighbor_id,
                 list_sum(list(l.dq ORDER BY l.sub)) AS adc
          FROM probes c
          JOIN codes k ON k.cent_id = c.cent_id AND k.vec_id <> c.query_id
          JOIN lut l ON l.query_id = c.query_id
                    AND l.sub = k.sub AND l.code = k.code
          GROUP BY c.query_id, k.vec_id
        ),
        ivfpq AS (
          SELECT query_id, neighbor_id, rnk FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY query_id ORDER BY adc, neighbor_id
                   ) AS rnk
            FROM scored
          ) WHERE rnk <= {k}
        )"""


def _ivfpq_oracle(**kw) -> str:
    return (
        "WITH "
        + _ivfpq_ctes(**kw)
        + "\n        SELECT query_id, neighbor_id, rnk FROM ivfpq"
    )


def _ivfpq_recall_oracle(k: int = 5, n_queries: int = 10) -> str:
    """Recall@k of the IVF-PQ search vs the exact cosine scan — both
    replayed from the same ``vecs`` CTE, recall arithmetic identical to
    u19/u22's."""
    return f"""
        WITH {_ivfpq_ctes(k=k, n_queries=n_queries)},
        exact_scored AS (
          SELECT q.query_id, n.vec_id AS neighbor_id,
                 list_dot_product(q.qv, n.v)
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(n.v, n.v))) AS cos
          FROM queries q, vecs n
          WHERE n.vec_id <> q.query_id
        ),
        exact AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY query_id ORDER BY cos DESC, neighbor_id
                   ) AS rnk
            FROM exact_scored
          ) WHERE rnk <= {k}
        ),
        hit AS (
          SELECT e.query_id,
                 CAST(COUNT(*) AS BIGINT) AS n_exact,
                 CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
          FROM exact e LEFT JOIN ivfpq a
            ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
          GROUP BY e.query_id
        ),
        acnt AS (
          SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_ann
          FROM ivfpq GROUP BY query_id
        )
        SELECT h.query_id, h.n_exact,
               CAST(COALESCE(a.n_ann, 0) AS BIGINT) AS n_ann, h.n_hit,
               ROUND(CAST(h.n_hit AS DOUBLE) / h.n_exact, 3) AS recall_at_k
        FROM hit h LEFT JOIN acnt a ON h.query_id = a.query_id
    """


@register(
    "u26_ivfpq_recall",
    oracle=_ivfpq_recall_oracle(),
    doc="In-engine IVF-PQ quality measurement: recall@5 of u25's "
    "composed search (IVF pruning + PQ ADC ranking) against the exact "
    "brute-force top-k, completing the quality trio the approximate "
    "paths carry (u19 LSH, u22 IVF, u26 IVF-PQ). This is the dial that "
    "separates the two error sources at 100 TB: u22-minus-u26 is the "
    "quantization loss, 1-minus-u22 is the pruning loss. Same "
    "topk_recall operator; both sides and the recall arithmetic replay "
    "fully in the DuckDB oracle.",
    tags=("similarity", "ann", "ivf", "quantization", "quality", "llm-pipeline"),
)
def u26_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.similarity import (
        ivfpq_topk,
        topk_recall,
    )

    emb = T(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb.where(F.col("vec_id") < 10), emb, k=5)
    return topk_recall(exact, ivfpq_topk(emb, emb.where(F.col("vec_id") < 10)))


@register(
    "u25_ivfpq_topk",
    bench=True,
    oracle=_ivfpq_oracle(),
    doc="IVF-PQ search — the composed 100 TB ANN architecture: IVF "
    "prunes WHICH vectors a query scores (nprobe=2 of 8 inverted "
    "lists), PQ's asymmetric distance computation ranks the candidates "
    "from their m-byte codes — raw vectors are never read at query "
    "time. Per-query cost: O(corpus/K · nprobe) code rows + an "
    "m·k_codes ADC lookup table (tiny, broadcast). Every stage is "
    "deterministic arithmetic (low-id seeding, explicit tie-breaks), "
    "so the entire approximate search is exactly replayed by the SQL "
    "oracle — the same property u06's IVF and u23's PQ carry "
    "individually.",
    tags=("similarity", "ann", "ivf", "quantization", "llm-pipeline"),
)
def u25_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.similarity import ivfpq_topk

    emb = T(spark, sf_dir, "embeddings")
    return ivfpq_topk(emb, emb.where(F.col("vec_id") < 10))


# ---------------------------------------------------------------------------
# u57: ranking-quality metrics (nDCG@10 + MRR) for the exact retriever
# ---------------------------------------------------------------------------

def _dcg_literals() -> tuple[list[str], list[str]]:
    """Rank discounts 1/log2(r+1) for r=1..10 and their prefix sums as
    shortest-round-trip decimal literals. Both engines parse these with
    correctly-rounded strtod, so NO libm log is evaluated in either
    engine — the one source of cross-engine drift a log-based metric
    would otherwise have."""
    import math

    d = [1.0 / math.log2(r + 1) for r in range(1, 11)]
    pref, acc = [], 0.0
    for x in d:
        acc += x
        pref.append(acc)
    return [repr(x) for x in d], [repr(x) for x in pref]


def _u57_oracle() -> str:
    disc, pref = _dcg_literals()
    # fixed-order DCG: rank-pivot columns summed left to right (SUM over
    # an unordered aggregate would be order-nondeterministic in Spark)
    rel_cols = " + ".join(
        f"(MAX(CASE WHEN rnk = {r} THEN rel ELSE 0 END) * {disc[r - 1]})"
        for r in range(1, 11)
    )
    idcg = "CASE LEAST(n_rel, 10) " + " ".join(
        f"WHEN {i + 1} THEN {pref[i]}" for i in range(10)
    ) + " ELSE 0.0 END"
    return f"""
        WITH vecs AS (
          SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb_d
          FROM embeddings
        ),
        scored AS (
          SELECT b.vec_id AS query_id, b.label AS q_label,
                 a.vec_id AS neighbor_id, a.label AS n_label,
                 {_COS_SQL} AS cos
          FROM vecs a, vecs b
          WHERE b.vec_id < 5 AND a.vec_id <> b.vec_id
        ),
        ranked AS (
          SELECT query_id, q_label, n_label,
                 CASE WHEN n_label = q_label THEN 1 ELSE 0 END AS rel,
                 ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY cos DESC, neighbor_id
                 ) AS rnk
          FROM scored
        ),
        nrel AS (
          SELECT q.vec_id AS query_id,
                 CAST(COUNT(*) AS BIGINT) AS n_rel
          FROM vecs q JOIN vecs c
            ON c.label = q.label AND c.vec_id <> q.vec_id
          WHERE q.vec_id < 5 GROUP BY q.vec_id
        ),
        agg AS (
          SELECT query_id,
                 {rel_cols} AS dcg,
                 MIN(CASE WHEN rel = 1 THEN rnk END) AS first_rel
          FROM ranked WHERE rnk <= 10 GROUP BY query_id
        )
        SELECT a.query_id, n.n_rel,
               FLOOR(a.dcg * 1000000.0 / ({idcg})) / 1000000 AS ndcg10,
               COALESCE(
                 FLOOR(1000000.0 / a.first_rel) / 1000000, 0.0
               ) AS mrr
        FROM agg a JOIN nrel n USING (query_id)
    """


@register(
    "u57_ndcg_mrr",
    oracle=_u57_oracle(),
    doc="Ranking-quality metrics for the exact retriever: per-probe "
    "nDCG@10 and MRR of s01's cosine ranking, with relevance = label "
    "match — completing the retrieval-eval tier (u19/u22/u26 measure "
    "set recall; this grades ORDER quality with graded-position "
    "discounts). Cross-engine float discipline: the 1/log2(r+1) "
    "discounts and their prefix sums are embedded as IDENTICAL "
    "shortest-round-trip literals on both sides (neither engine "
    "evaluates a libm log), DCG is a rank-pivoted LEFT-TO-RIGHT "
    "literal chain (not an order-nondeterministic SUM), and the final "
    "ratios floor-quantize at 6dp. Scale shape: rides s01's broadcast-"
    "query kernel + WindowGroupLimit partial top-k; the label-count "
    "side is one corpus aggregate.",
    tags=("similarity", "metrics", "llm-pipeline"),
)
def u57_ndcg_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.similarity import cosine_topk

    disc, pref = _dcg_literals()
    emb = T(spark, sf_dir, "embeddings")
    labels = emb.select("vec_id", "label")
    q = emb.where(F.col("vec_id") < 5)
    ranked = cosine_topk(
        q.select("vec_id", "embedding"),
        emb.select("vec_id", "embedding"),
        k=10,
    )
    rel = (
        ranked.join(
            F.broadcast(
                q.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("label").alias("q_label"),
                )
            ),
            "query_id",
        )
        .join(
            labels.withColumnsRenamed(
                {"vec_id": "neighbor_id", "label": "n_label"}
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "rnk",
            F.when(F.col("n_label") == F.col("q_label"), 1)
            .otherwise(0)
            .alias("rel"),
        )
    )
    # fixed-order DCG chain, mirrored literally in the oracle
    dcg = F.lit(None)
    for r in range(1, 11):
        term = F.max(
            F.when(F.col("rnk") == r, F.col("rel")).otherwise(0)
        ) * F.lit(float(disc[r - 1]))
        dcg = term if r == 1 else (dcg + term)
    agg = rel.where(F.col("rnk") <= 10).groupBy("query_id").agg(
        dcg.alias("dcg"),
        F.min(F.when(F.col("rel") == 1, F.col("rnk"))).alias("first_rel"),
    )
    n_rel = (
        q.select(F.col("vec_id").alias("query_id"), F.col("label").alias("q_label"))
        .join(
            F.broadcast(
                emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_lab"))
            ),
            F.col("q_label") == F.col("label"),
        )
        .select("query_id", (F.col("n_lab") - 1).alias("n_rel"))
        # a probe whose label has NO other member (n_rel=0) has no
        # defined ideal ranking: idcg=0 would make ndcg10 NaN here
        # while the oracle's inner label self-join drops the query —
        # exclude it on this side too (same contract as the oracle)
        .where(F.col("n_rel") > 0)
    )
    idcg = F.lit(0.0)
    for i in range(10):
        idcg = F.when(
            F.least(F.col("n_rel"), F.lit(10)) == i + 1, F.lit(float(pref[i]))
        ).otherwise(idcg)
    return (
        agg.join(F.broadcast(n_rel), "query_id")
        .select(
            "query_id",
            "n_rel",
            (F.floor(F.col("dcg") * F.lit(1000000.0) / idcg) / 1000000)
            .alias("ndcg10"),
            F.coalesce(
                F.floor(F.lit(1000000.0) / F.col("first_rel")) / 1000000,
                F.lit(0.0),
            ).alias("mrr"),
        )
    )
