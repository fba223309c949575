"""Training-data curation queries (u tier) over ``documents``.

Operations a pretraining-data pipeline runs beyond per-corpus dedup:
eval-set contamination checks, duplicate-cluster representative
selection, and the cross-source overlap matrix used for dataset mixing
decisions. The u tier sorts after t (outside the externally-recorded
first-50 window — every recorded slot is taken by one query per series)
but carries full DuckDB oracles and runs in the local gate and tests
like every other query.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from gov_ec_pipeline_etl_spark.functions.hashing import portable_hash64_sql
from gov_ec_pipeline_etl_spark.operators.dedup_fuzzy import shingle_rows
from gov_ec_pipeline_etl_spark.plans.dedup_queries import (
    DIRTY_SQL,
    MUT_OFFSET,
    TOKS_SQL,
    _dirty_docs,
    positional_shingles_sql,
    shingles_sql,
)
from gov_ec_pipeline_etl_spark.plans.registry import register
from gov_ec_pipeline_etl_spark.plans.util import T

# Eval-set stand-in: every 50th document. Real pipelines join against a
# held-out benchmark table; the modulus keeps the query self-contained.
EVAL_MOD = 50
MIN_SHARED = 3


@register(
    "u01_contamination_check",
    oracle=f"""
        WITH toksed AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
        sh AS (
          SELECT doc_id, unnest({shingles_sql(5)}) AS s FROM toksed
        ),
        ev AS (
          SELECT doc_id AS eval_id, s FROM sh WHERE doc_id % {EVAL_MOD} = 0
        ),
        ev_sz AS (SELECT eval_id, COUNT(*) AS sz FROM ev GROUP BY eval_id),
        hits AS (
          SELECT e.eval_id, c.doc_id AS corpus_id,
                 CAST(COUNT(*) AS BIGINT) AS shared
          FROM ev e
          JOIN sh c ON e.s = c.s
           AND c.doc_id % {EVAL_MOD} <> 0
          GROUP BY e.eval_id, c.doc_id
        )
        SELECT eval_id, corpus_id, shared,
               ROUND(CAST(shared AS DOUBLE) / sz, 6) AS containment
        FROM hits JOIN ev_sz USING (eval_id)
        WHERE shared >= {MIN_SHARED}
    """,
    doc="Eval-set contamination: training documents sharing >= 3 "
    "distinct 5-word shingles with any eval document, with the "
    "containment ratio (shared / |eval shingles|). The eval side is "
    "broadcast (eval sets are small by definition); the corpus shingle "
    "table streams through one hash join — no corpus self-join, linear "
    "in corpus size at 100 TB.",
    tags=("text", "dedup", "llm-pipeline"),
)
def u01_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    sh = shingle_rows(docs, "doc_id", "text", 5)
    ev = sh.where(F.col("id") % EVAL_MOD == 0).select(
        F.col("id").alias("eval_id"), "s"
    )
    ev_sz = ev.groupBy("eval_id").agg(F.count(F.lit(1)).alias("sz"))
    corpus = sh.where(F.col("id") % EVAL_MOD != 0).select(
        F.col("id").alias("corpus_id"), "s"
    )
    hits = (
        corpus.join(F.broadcast(ev), "s")
        .groupBy("eval_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= MIN_SHARED)
    )
    return hits.join(F.broadcast(ev_sz), "eval_id").select(
        "eval_id",
        "corpus_id",
        "shared",
        F.round(F.col("shared") / F.col("sz"), 6).alias("containment"),
    )


@register(
    "u02_cluster_representatives",
    oracle=f"""
        WITH corpus AS ({DIRTY_SQL}),
        toksed AS (SELECT doc_id, {TOKS_SQL} AS toks FROM corpus),
        sh AS (SELECT doc_id, {shingles_sql(5)} AS shingles FROM toksed),
        mh AS (
          SELECT doc_id,
                 list_min(list_transform(shingles, s -> md5(s))) AS min_sh
          FROM sh
        ),
        -- min-shingle equality is an equivalence relation, so components
        -- are the min_sh classes directly (see d06's oracle note) — no
        -- recursive closure needed
        clusters AS (
          SELECT doc_id, MIN(doc_id) OVER (PARTITION BY min_sh) AS cluster_id
          FROM mh
          QUALIFY COUNT(*) OVER (PARTITION BY min_sh) > 1
        ),
        sized AS (
          SELECT c.doc_id, c.cluster_id, length(t.text) AS n
          FROM clusters c JOIN corpus t USING (doc_id)
        ),
        mx AS (
          SELECT cluster_id, MAX(n) AS mxn,
                 CAST(COUNT(*) AS BIGINT) AS n_members
          FROM sized GROUP BY cluster_id
        )
        SELECT s.cluster_id, MIN(s.doc_id) AS rep_id, m.n_members
        FROM sized s JOIN mx m ON s.cluster_id = m.cluster_id AND s.n = m.mxn
        GROUP BY s.cluster_id, m.n_members
    """,
    doc="Duplicate-cluster REPRESENTATIVE selection: after clustering "
    "(d06's min-shingle components), keep the longest document per "
    "cluster (ties -> lowest id) — the 'which copy survives dedup' "
    "policy of a training pipeline. One join to attach lengths, one "
    "min_by aggregate per cluster.",
    tags=("dedup", "graph", "llm-pipeline"),
)
def u02_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.graph import connected_components

    corpus = _dirty_docs(spark, sf_dir)
    rows = shingle_rows(corpus, "doc_id", "text", 5)
    mh = rows.groupBy("id").agg(F.min(F.md5("s")).alias("min_sh"))
    pairs = (
        mh.alias("a")
        .join(
            mh.alias("b"),
            (F.col("a.min_sh") == F.col("b.min_sh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    clusters = connected_components(pairs)  # (doc_id, cluster_id)
    sized = clusters.join(
        corpus.select("doc_id", F.length("text").alias("n")), "doc_id"
    )
    # min over (-length, id): longest wins, ties break to the lowest id
    return sized.groupBy("cluster_id").agg(
        F.min_by(
            "doc_id", F.struct((-F.col("n")).alias("neg_n"), F.col("doc_id"))
        ).alias("rep_id"),
        F.count(F.lit(1)).alias("n_members"),
    )


@register(
    "u03_source_overlap_matrix",
    oracle=f"""
        WITH toksed AS (
          SELECT d.source, {TOKS_SQL} AS toks FROM documents d
        ),
        sh AS (
          SELECT DISTINCT source, unnest({shingles_sql(5)}) AS s FROM toksed
        ),
        sz AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh
          FROM sh GROUP BY source
        ),
        shared AS (
          SELECT a.source AS source_a, b.source AS source_b,
                 CAST(COUNT(*) AS BIGINT) AS shared
          FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
          GROUP BY a.source, b.source
        )
        SELECT source_a, source_b, shared,
               ROUND(CAST(shared AS DOUBLE) / least(x.n_sh, y.n_sh), 6)
                 AS overlap
        FROM shared
        JOIN sz x ON x.source = source_a
        JOIN sz y ON y.source = source_b
    """,
    doc="Cross-source overlap matrix (dataset-mixing diagnostics): for "
    "every source pair, the number of distinct 5-word shingles present "
    "in both, normalized by the smaller source's shingle vocabulary "
    "(overlap coefficient). One distinct pass then a shingle self-join "
    "whose fan-out is bounded by the source count per shingle, never "
    "the corpus size.",
    tags=("text", "llm-pipeline"),
)
def u03_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").select(
        F.col("source"), F.col("doc_id"), F.col("text")
    )
    # shingles keyed by source: reuse the row shingler, then project the
    # source through the doc id (distinct per (source, shingle))
    sh = (
        shingle_rows(docs, "doc_id", "text", 5)
        .join(docs.select(F.col("doc_id").alias("id"), "source"), "id")
        .select("source", "s")
        .distinct()
    )
    sz = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_sh"))
    shared = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(
            F.broadcast(sz.withColumnsRenamed({"source": "source_a", "n_sh": "sz_a"})),
            "source_a",
        )
        .join(
            F.broadcast(sz.withColumnsRenamed({"source": "source_b", "n_sh": "sz_b"})),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "shared",
            F.round(
                F.col("shared") / F.least(F.col("sz_a"), F.col("sz_b")), 6
            ).alias("overlap"),
        )
    )


@register(
    "u04_quality_funnel",
    oracle="""
        WITH staged AS (
          SELECT doc_id,
                 (trim(text) <> '') AS s1,
                 (n_chars BETWEEN 200 AND 20000) AS s2,
                 (lang IN ('en', 'es', 'de', 'fr', 'zh')) AS s3,
                 (len(regexp_split_to_array(trim(text), '\\s+')) >= 20) AS s4
          FROM documents
        ),
        depth AS (
          SELECT CASE WHEN NOT s1 THEN 0
                      WHEN NOT s2 THEN 1
                      WHEN NOT s3 THEN 2
                      WHEN NOT s4 THEN 3
                      ELSE 4 END AS funnel_depth
          FROM staged
        )
        SELECT funnel_depth, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM depth GROUP BY funnel_depth
    """,
    doc="Quality-filter FUNNEL diagnostics: four cumulative curation "
    "gates (non-empty, length band, supported language, minimum token "
    "count); each document reports the deepest consecutive gate it "
    "passed. One scan, one tiny aggregate — the per-stage survival "
    "report a curation pipeline watches, at any corpus size.",
    tags=("text", "llm-pipeline"),
)
def u04_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.textstats import token_count

    d = T(spark, sf_dir, "documents")
    s1 = F.trim("text") != ""
    s2 = F.col("n_chars").between(200, 20000)
    s3 = F.col("lang").isin("en", "es", "de", "fr", "zh")
    s4 = token_count("text") >= 20
    depth = (
        F.when(~s1, 0)
        .when(~s2, 1)
        .when(~s3, 2)
        .when(~s4, 3)
        .otherwise(4)
        .alias("funnel_depth")
    )
    return (
        d.select(depth)
        .groupBy("funnel_depth")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "u05_dedup_impact_by_source",
    oracle=f"""
        WITH corpus AS (
          SELECT doc_id, source, text FROM documents
          UNION ALL
          SELECT doc_id + {MUT_OFFSET} AS doc_id, source, text FROM documents
        ),
        fp AS (
          SELECT doc_id, source,
                 CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens,
                 md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
          FROM corpus
        ),
        keep AS (SELECT f, MIN(doc_id) AS keep_id FROM fp GROUP BY f)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_removed,
               CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
               CAST(SUM(CASE WHEN doc_id <> keep_id THEN n_tokens ELSE 0 END)
                    AS BIGINT) AS tokens_removed
        FROM fp JOIN keep USING (f)
        GROUP BY source
    """,
    doc="What exact dedup REMOVES, by source (the before/after token "
    "accounting a data-mixing decision needs): duplicate groups keep "
    "their minimum id; every other copy counts as removed with its "
    "token mass. Corpus = documents plus planted exact copies "
    "(driver data is clean). fingerprint groupBy + one broadcastable "
    "keep-table join + per-source aggregate.",
    tags=("dedup", "text", "llm-pipeline"),
)
def u05_dedup_impact_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.textstats import token_count

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "text")
    corpus = docs.unionByName(
        docs.select(
            (F.col("doc_id") + MUT_OFFSET).alias("doc_id"), "source", "text"
        )
    )
    fp = corpus.select(
        "doc_id",
        "source",
        token_count("text").cast("bigint").alias("n_tokens"),
        F.md5(
            F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
        ).alias("f"),
    )
    keep = fp.groupBy("f").agg(F.min("doc_id").alias("keep_id"))
    removed = F.when(F.col("doc_id") != F.col("keep_id"), 1).otherwise(0)
    return (
        fp.join(keep, "f")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(removed).cast("bigint").alias("n_removed"),
            F.sum("n_tokens").alias("tokens_total"),
            F.sum(F.when(F.col("doc_id") != F.col("keep_id"), F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("tokens_removed"),
        )
    )


def _ivf_cos(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )


# IVF search replay as a WITH-body, shared by u06 (result itself) and
# u22 (recall of that result against the exact scan).
_IVF_CTES = f"""vecs AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        cents AS (SELECT vec_id AS cent_id, v AS cv FROM vecs WHERE vec_id < 8),
        assigned AS (
          SELECT x.vec_id, arg_max(c.cent_id, {_ivf_cos('x.v', 'c.cv')}) AS cent_id
          FROM vecs x, cents c
          GROUP BY x.vec_id
        ),
        queries AS (SELECT vec_id AS query_id, v AS qv FROM vecs WHERE vec_id < 10),
        probes AS (
          SELECT query_id, cent_id FROM (
            SELECT q.query_id, c.cent_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY q.query_id
                     ORDER BY {_ivf_cos('q.qv', 'c.cv')} DESC, c.cent_id
                   ) AS pr
            FROM queries q, cents c
          ) WHERE pr <= 2
        ),
        cand AS (
          SELECT p.query_id, a.vec_id AS neighbor_id
          FROM probes p JOIN assigned a ON a.cent_id = p.cent_id
          WHERE a.vec_id <> p.query_id
        ),
        ivf AS (
          SELECT query_id, neighbor_id, rnk FROM (
            SELECT c.query_id, c.neighbor_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY c.query_id
                     ORDER BY {_ivf_cos('q.qv', 'n.v')} DESC, c.neighbor_id
                   ) AS rnk
            FROM cand c
            JOIN queries q ON q.query_id = c.query_id
            JOIN vecs n ON n.vec_id = c.neighbor_id
          ) WHERE rnk <= 5
        )"""


@register(
    "u06_ivf_topk",
    oracle=f"""
        WITH {_IVF_CTES}
        SELECT query_id, neighbor_id, rnk FROM ivf
    """,
    doc="IVF SEARCH end-to-end (the ANN scale path s04/s05 are the "
    "building blocks of): corpus assigned once to K=8 centroids, each "
    "query probes its nprobe=2 nearest centroids and reranks only those "
    "blocks — per-query work is O(corpus/K * nprobe), not O(corpus). "
    "Centroid assignment, probing, and rerank are deterministic "
    "arithmetic, so unlike hyperplane-LSH ANN this approximate index is "
    "FULLY oracle-verified (the oracle recomputes the same index).",
    tags=("similarity", "ivf", "ann", "llm-pipeline"),
)
def u06_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_search(spark, sf_dir)


def _ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

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
    # corpus → nearest centroid (one broadcast join + argmax; persisted
    # at cluster scale, recomputed here — the index build of IVF)
    assigned = (
        vecs.crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "v", "cent_id", cosine("v", "cv", dim).alias("cos")
        )
        .groupBy("vec_id")
        .agg(
            F.max_by("cent_id", F.struct(F.col("cos"), -F.col("cent_id"))).alias(
                "cent_id"
            ),
            F.first("v").alias("v"),
        )
    )
    queries = vecs.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cent_id")
    )
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .select("query_id", "qv", "cent_id", cosine("qv", "cv", dim).alias("cos"))
        .withColumn("pr", F.row_number().over(w_probe))
        .where(F.col("pr") <= 2)
        .select("query_id", "qv", "cent_id")
    )
    cand = assigned.join(F.broadcast(probes), "cent_id").where(
        F.col("vec_id") != F.col("query_id")
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        cand.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine("qv", "v", dim).alias("cos"),
        )
        .withColumn("rnk", F.row_number().over(w_rank).cast("bigint"))
        .where(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", "rnk")
    )


@register(
    "u22_ivf_recall",
    oracle=f"""
        WITH {_IVF_CTES},
        exact_scored AS (
          SELECT q.query_id, n.vec_id AS neighbor_id,
                 {_ivf_cos('q.qv', 'n.v')} AS cos
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
          ) WHERE rnk <= 5
        ),
        hit AS (
          SELECT e.query_id,
                 CAST(COUNT(*) AS BIGINT) AS n_exact,
                 CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
          FROM exact e LEFT JOIN ivf a
            ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
          GROUP BY e.query_id
        ),
        acnt AS (
          SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_ann
          FROM ivf GROUP BY query_id
        )
        SELECT h.query_id, h.n_exact,
               CAST(COALESCE(a.n_ann, 0) AS BIGINT) AS n_ann, h.n_hit,
               ROUND(CAST(h.n_hit AS DOUBLE) / h.n_exact, 3) AS recall_at_k
        FROM hit h LEFT JOIN acnt a ON h.query_id = a.query_id
    """,
    doc="In-engine IVF quality measurement: recall@5 of u06's "
    "nprobe=2 IVF search against the exact brute-force top-k — the "
    "centroid-count/nprobe tuning dial measured on the corpus itself, "
    "same operator (topk_recall) that gates the LSH path in u19. Both "
    "sides and the recall arithmetic replay fully in the DuckDB oracle "
    "(IVF is deterministic arithmetic, so unlike seeded-LSH even the "
    "index build is cross-engine verified).",
    tags=("similarity", "ivf", "ann", "quality", "llm-pipeline"),
)
def u22_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.similarity import (
        cosine_topk,
        topk_recall,
    )

    emb = T(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb.where(F.col("vec_id") < 10), emb, k=5)
    return topk_recall(exact, _ivf_search(spark, sf_dir))


@register(
    "u07_quantized_cosine_agreement",
    oracle="""
        WITH vecs AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        scaled AS (
          SELECT vec_id, v,
                 127.0 / list_max(list_transform(v, x -> abs(x))) AS s
          FROM vecs
        ),
        quant AS (
          SELECT vec_id, v,
                 list_transform(v, x -> floor(x * s)) AS qv
          FROM scaled
        ),
        queries AS (SELECT * FROM quant WHERE vec_id < 10),
        pairs AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 list_dot_product(q.v, c.v)
                   / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))
                   AS cos_exact,
                 list_dot_product(q.qv, c.qv)
                   / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.qv, c.qv)))
                   AS cos_quant
          FROM queries q, quant c
          WHERE q.vec_id <> c.vec_id
        ),
        ranked AS (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos_exact DESC, neighbor_id) AS re,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos_quant DESC, neighbor_id) AS rq
          FROM pairs
        )
        SELECT e.query_id,
               e.neighbor_id AS top1_exact,
               qn.neighbor_id AS top1_quant,
               (e.neighbor_id = qn.neighbor_id) AS agree
        FROM (SELECT query_id, neighbor_id FROM ranked WHERE re = 1) e
        JOIN (SELECT query_id, neighbor_id FROM ranked WHERE rq = 1) qn
          USING (query_id)
    """,
    doc="int8 scalar quantization for embedding search (the 4x-memory "
    "scale lever): per-vector max-abs scaling to [-127,127] via floor "
    "(the portable rounding — float->int CAST truncates in Spark but "
    "rounds in DuckDB), then top-1 neighbor under quantized vs exact "
    "cosine with an agreement flag. Deterministic arithmetic on both "
    "engines, so the quantization error behavior itself is "
    "oracle-verified, not just sampled.",
    tags=("similarity", "quantization", "llm-pipeline"),
)
def u07_quantized_cosine_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from gov_ec_pipeline_etl_spark.operators.similarity import (
        as_double,
        vec_dim,
    )

    emb = T(spark, sf_dir, "embeddings")
    dim = vec_dim(emb, "embedding")
    maxabs = F.expr(
        "greatest(" + ", ".join(f"abs(v[{i}])" for i in range(dim)) + ")"
    )
    vecs = emb.select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    ).withColumn("s", F.lit(127.0) / maxabs)

    def qdot(a: str, sa: str, b: str, sb: str) -> F.Column:
        return F.expr(
            " + ".join(
                f"floor({a}[{i}]*{sa})*floor({b}[{i}]*{sb})" for i in range(dim)
            )
        )

    def ddot(a: str, b: str) -> F.Column:
        return F.expr(" + ".join(f"{a}[{i}]*{b}[{i}]" for i in range(dim)))

    q = vecs.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("s").alias("qs"),
    )
    pairs = vecs.crossJoin(F.broadcast(q)).where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            ddot("qv", "v")
            / (F.sqrt(ddot("qv", "qv")) * F.sqrt(ddot("v", "v")))
        ).alias("cos_exact"),
        (
            qdot("qv", "qs", "v", "s")
            / (
                F.sqrt(qdot("qv", "qs", "qv", "qs"))
                * F.sqrt(qdot("v", "s", "v", "s"))
            )
        ).alias("cos_quant"),
    )
    we = Window.partitionBy("query_id").orderBy(
        F.col("cos_exact").desc(), F.col("neighbor_id")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cos_quant").desc(), F.col("neighbor_id")
    )
    ranked = scored.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(we).alias("re"),
        F.row_number().over(wq).alias("rq"),
    )
    e = ranked.where("re = 1").select("query_id", F.col("neighbor_id").alias("top1_exact"))
    qn = ranked.where("rq = 1").select("query_id", F.col("neighbor_id").alias("top1_quant"))
    return e.join(qn, "query_id").select(
        "query_id",
        "top1_exact",
        "top1_quant",
        (F.col("top1_exact") == F.col("top1_quant")).alias("agree"),
    )


_FEATURE_SCHEMA = (
    "media_id bigint, n_bytes bigint, mean_byte_ppm bigint,"
    " n_distinct_bytes bigint"
)


@register(
    "u08_media_feature_extract",
    oracle="""
        WITH chars AS (
          SELECT doc_id AS media_id,
                 octet_length(encode(text)) AS n_bytes,
                 list_transform(range(1, length(text) + 1),
                                i -> ascii(substr(text, i, 1))) AS codes
          FROM documents
        )
        SELECT media_id,
               CAST(n_bytes AS BIGINT) AS n_bytes,
               CAST(CASE WHEN n_bytes = 0 THEN 0
                    ELSE (list_sum(codes) * 1000000) // n_bytes
               END AS BIGINT) AS mean_byte_ppm,
               CAST(len(list_distinct(codes)) AS BIGINT) AS n_distinct_bytes
        FROM chars
    """,
    doc="Multimodal FEATURE EXTRACTION plumbing (the stage between m01 "
    "decode and model input): Arrow-batched mapInPandas turns each "
    "binary payload into a numeric feature row via numpy (vectorized "
    "per batch, constant memory, no shuffle). The payloads are the "
    "documents' (all-ASCII) text bytes, so the byte features equal "
    "character arithmetic the oracle recomputes in SQL — the whole "
    "binary->Arrow->numpy->row path is value-checked. Swapping the "
    "byte kernel for an image/audio featurizer is a one-function "
    "change, exactly like the m01 codec stub.",
    tags=("multimodal", "pandas-udf", "llm-pipeline"),
)
def u08_media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    docs = T(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    )

    def extract(batches):
        for pdf in batches:
            feats = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                # integer-only mean (parts-per-million, floor division):
                # Python round() is half-even while SQL ROUND is
                # half-away, so any float rounding here would flake
                # against the oracle on exact ties
                feats.append(
                    (
                        int(mid),
                        int(b.size),
                        # empty payload -> 0, not ZeroDivisionError (one
                        # empty document must not fail the Arrow batch);
                        # the oracle carries the same CASE guard
                        int(b.sum()) * 1_000_000 // int(b.size) if b.size else 0,
                        int(np.unique(b).size),
                    )
                )
            yield pd.DataFrame(
                feats,
                columns=[
                    "media_id",
                    "n_bytes",
                    "mean_byte_ppm",
                    "n_distinct_bytes",
                ],
            )

    return media.mapInPandas(extract, schema=_FEATURE_SCHEMA)


_BAR_US = 6 * 3600 * 1_000_000  # 6-hour bars


@register(
    "u09_resample_ffill",
    oracle=f"""
        WITH ev AS (
          SELECT event_type, epoch_us(ts) AS us, value FROM events
        ),
        bounds AS (
          SELECT (MIN(us) // {_BAR_US}) * {_BAR_US} AS lo,
                 (MAX(us) // {_BAR_US}) * {_BAR_US} AS hi
          FROM ev
        ),
        grid AS (
          SELECT t.event_type, gs.bar_start_us
          FROM (SELECT DISTINCT event_type FROM ev) t
          CROSS JOIN (
            SELECT unnest(generate_series(lo, hi, {_BAR_US})) AS bar_start_us
            FROM bounds
          ) gs
        ),
        bars AS (
          SELECT event_type, (us // {_BAR_US}) * {_BAR_US} AS bar_start_us,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                       / COUNT(*) * 1000000) / 1000000 AS avg_value
          FROM ev GROUP BY 1, 2
        )
        SELECT g.event_type,
               g.bar_start_us,
               COALESCE(b.n_events, 0) AS n_events,
               last_value(b.avg_value IGNORE NULLS) OVER (
                 PARTITION BY g.event_type ORDER BY g.bar_start_us
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS avg_ffill
        FROM grid g LEFT JOIN bars b USING (event_type, bar_start_us)
    """,
    doc="Time-series RESAMPLE with gap fill: events bucketed to 6-hour "
    "bars per type over the full span, empty bars materialized from a "
    "generated grid (sequence stays inside the plan — no driver "
    "collect) and forward-filled with the last observed bar average "
    "(null until first observation). The downsample-for-training shape "
    "(sensor/metrics corpora): one aggregate, one grid join, one "
    "ordered window per type.",
    tags=("timeseries", "window", "llm-pipeline"),
)
def u09_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        "value",
    )
    bar = (F.col("us") / F.lit(_BAR_US)).cast("bigint") * F.lit(_BAR_US)
    bars = (
        ev.groupBy("event_type", bar.alias("bar_start_us"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # order-independent: decimal sum is exact, the cast double is
            # then bit-identical cross-engine, and floor-quantization of
            # an identical double cannot diverge (ROUND can, at exact .5)
            (
                F.floor(
                    F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                    / F.count(F.lit(1))
                    * 1_000_000
                )
                / 1_000_000
            ).alias("avg_value"),
        )
    )
    bounds = ev.agg(
        ((F.min("us") / _BAR_US).cast("bigint") * _BAR_US).alias("lo"),
        ((F.max("us") / _BAR_US).cast("bigint") * _BAR_US).alias("hi"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(bounds).select(
                F.explode(
                    F.sequence("lo", "hi", F.lit(_BAR_US))
                ).alias("bar_start_us")
            )
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bar_start_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(bars, ["event_type", "bar_start_us"], "left")
        .select(
            "event_type",
            "bar_start_us",
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
            F.last("avg_value", ignorenulls=True).over(w).alias("avg_ffill"),
        )
    )


# Mixing weights: probability of keeping each document, by source group
# (sources hash-partitioned into 4 groups to keep the weight map small
# and the query self-contained; a real pipeline broadcasts a weight
# table). Weights in parts-per-thousand for exact integer comparison.
_MIX_WEIGHTS_PPT = {0: 1000, 1: 500, 2: 250, 3: 100}


@register(
    "u10_weighted_source_mix",
    oracle=f"""
        WITH grouped AS (
          SELECT doc_id, source,
                 {portable_hash64_sql("source", 7)} % 4 AS grp,
                 {portable_hash64_sql("CAST(doc_id AS VARCHAR)", 11)} % 1000
                   AS ticket
          FROM documents
        ),
        weighted AS (
          SELECT doc_id, source, grp, ticket,
                 CASE grp WHEN 0 THEN 1000 WHEN 1 THEN 500
                          WHEN 2 THEN 250 ELSE 100 END AS w_ppt
          FROM grouped
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN ticket < w_ppt THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_sampled,
               MIN(w_ppt) AS w_ppt
        FROM weighted
        GROUP BY source
    """,
    doc="Deterministic WEIGHTED dataset mixing (the pretraining "
    "mix-ratio op): each document draws a hash ticket in [0,1000) and "
    "survives iff ticket < its source group's weight — a pure function "
    "of (doc_id, source), so the same mix reproduces on any engine, "
    "any partitioning, any run (t11's hash sample generalized to "
    "per-group rates). One scan, one aggregate; the weight map "
    "broadcasts at scale.",
    tags=("sampling", "llm-pipeline"),
)
def u10_weighted_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.functions.hashing import portable_hash64

    docs = T(spark, sf_dir, "documents").select("doc_id", "source")
    grp = portable_hash64(F.col("source"), 7) % 4
    ticket = portable_hash64(F.col("doc_id").cast("string"), 11) % 1000
    w = F.create_map(
        *[F.lit(x) for kv in _MIX_WEIGHTS_PPT.items() for x in kv]
    )[grp]
    weighted = docs.select(
        "source",
        ticket.alias("ticket"),
        w.alias("w_ppt"),
    )
    return weighted.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("ticket") < F.col("w_ppt"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_sampled"),
        F.min("w_ppt").alias("w_ppt"),
    )


@register(
    "u11_shingle_novelty",
    oracle=f"""
        WITH toksed AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
        sh AS (
          SELECT doc_id, unnest({shingles_sql(5)}) AS s FROM toksed
        ),
        freq AS (
          SELECT s, COUNT(*) AS df FROM sh GROUP BY s
        )
        SELECT sh.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_novel,
               CAST(SUM(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) * 1000000
                    // COUNT(*) AS BIGINT) AS novelty_ppm
        FROM sh JOIN freq f USING (s)
        GROUP BY sh.doc_id
    """,
    doc="Shingle NOVELTY score: the fraction of a document's distinct "
    "5-word shingles that occur nowhere else in the corpus — the "
    "self-information proxy curation uses to separate boilerplate-heavy "
    "documents from original content. One document-frequency aggregate "
    "+ one join back; integer ppm output (exact on any engine). At "
    "100 TB the df table is the same inverted index the n-gram dedup "
    "path already builds — computed once, served twice.",
    tags=("text", "quality", "llm-pipeline"),
)
def u11_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    sh = shingle_rows(docs, "doc_id", "text", 5)
    freq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    novel = F.when(F.col("df") == 1, 1).otherwise(0)
    return (
        sh.join(freq, "s")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(novel).cast("bigint").alias("n_novel"),
            F.floor(
                F.sum(novel) * 1_000_000 / F.count(F.lit(1))
            ).cast("bigint").alias("novelty_ppm"),
        )
    )


from gov_ec_pipeline_etl_spark.operators.dedup_fuzzy import (
    MINHASH_PRIME as _MH_PRIME,
)
from gov_ec_pipeline_etl_spark.operators.dedup_fuzzy import (
    minhash_coeffs as _minhash_coeffs,
)

# the same 12 affine signature slots the engine uses, rendered for SQL
_SIG_SQL = ", ".join(
    f"MIN(({a} * h + {b}) % {_MH_PRIME}) AS s{i}"
    for i, (a, b) in enumerate(_minhash_coeffs(12))
)


# Shared by u12 (one-shot batch) and v02 (streamed micro-batches): the
# streaming run partitions the SAME arrival set across foreachBatch
# invocations, and every result row involves exactly one arrival, so
# both forms equal this one statement.
INCREMENTAL_NEARDUP_ORACLE = f"""
        WITH corpus AS (SELECT doc_id, text FROM documents),
        arrivals AS (
          SELECT doc_id + {MUT_OFFSET} AS doc_id, text || ' zz0 zz1 zz2' AS text
          FROM documents WHERE doc_id % 5 = 0
        ),
        both_sides AS (
          SELECT doc_id, text, 0 AS is_new FROM corpus
          UNION ALL
          SELECT doc_id, text, 1 AS is_new FROM arrivals
        ),
        toksed AS (
          SELECT doc_id, is_new, {TOKS_SQL} AS toks FROM both_sides
        ),
        sh AS (
          SELECT doc_id, is_new,
                 unnest(list_transform({shingles_sql(3)}, s ->
                   CAST('0x' || substr(md5('0:' || s), 1, 15) AS BIGINT)))
                   AS h60
          FROM toksed
        ),
        h32 AS (SELECT doc_id, is_new, h60 % 4294967296 AS h FROM sh),
        sig AS (
          SELECT doc_id, is_new,
                 {_SIG_SQL}
          FROM h32 GROUP BY doc_id, is_new
        ),
        banded AS (
          SELECT doc_id, is_new, b.band_idx,
                 md5(CASE b.band_idx
                     WHEN 0 THEN s0 || ',' || s1 || ',' || s2
                     WHEN 1 THEN s3 || ',' || s4 || ',' || s5
                     WHEN 2 THEN s6 || ',' || s7 || ',' || s8
                     ELSE s9 || ',' || s10 || ',' || s11 END) AS band_key
          FROM sig, (SELECT unnest(range(0, 4)) AS band_idx) b
        ),
        cand AS (
          SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
          FROM banded n JOIN banded c
            ON n.band_idx = c.band_idx AND n.band_key = c.band_key
          WHERE n.is_new = 1 AND c.is_new = 0
        ),
        sizes AS (
          SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
        ),
        inter AS (
          SELECT cd.new_id, cd.corpus_id, COUNT(*) AS i
          FROM cand cd
          JOIN sh a ON a.doc_id = cd.new_id
          JOIN sh b ON b.doc_id = cd.corpus_id AND b.h60 = a.h60
          GROUP BY cd.new_id, cd.corpus_id
        )
        SELECT i.new_id, i.corpus_id,
               ROUND(CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i), 6) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.new_id
        JOIN sizes sb ON sb.doc_id = i.corpus_id
        WHERE CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i) >= 0.5
    """


@register(
    "u12_incremental_neardup",
    bench=True,
    oracle=INCREMENTAL_NEARDUP_ORACLE,
    doc="INCREMENTAL near-dup: a batch of new arrivals (every 5th doc, "
    "mutated) checked against the EXISTING corpus only — the streaming-"
    "ingest dedup shape. The corpus sketch and band keys are computed "
    "once and reusable across batches (minhash_sketch/minhash_band_keys "
    "— at scale they are stored tables); per batch the work is "
    "sketching the arrivals plus one asymmetric band join, never a "
    "corpus self-join. The oracle rebuilds the identical signature "
    "math (portable hash family) and verifies exact Jaccard >= 0.5.",
    tags=("dedup", "incremental", "llm-pipeline"),
)
def u12_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.dedup_fuzzy import (
        jaccard_verify,
        minhash_sketch,
    )

    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    arrivals = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + MUT_OFFSET).alias("doc_id"),
        F.concat("text", F.lit(" zz0 zz1 zz2")).alias("text"),
    )
    # One shingle+sketch pass over corpus∪arrivals (ids are disjoint by
    # construction), split by id range afterwards: halves the sketch
    # barriers and scans vs sketching each side separately. In the
    # stored-sketch deployment shape the corpus side is instead read
    # back from disk — see operators.dedup_fuzzy.incremental_neardup_
    # against, which this query's band join mirrors asymmetrically.
    sh_all = minhash_sketch(docs.unionByName(arrivals), "doc_id", "text", 3)
    # ONE signature aggregation over the union, split by id range after:
    # banding each side separately paid the sketch-wide min-aggregate
    # shuffle twice (each side's groupBy re-scanned the full cached
    # sketch through its filter). A doc's signature is independent of
    # which side it is computed in, so the split-after form is
    # row-identical; persisted because both join sides derive from it.
    from gov_ec_pipeline_etl_spark.operators.dedup_fuzzy import (
        band_keys_from_signature,
        minhash_signature,
    )

    sig_all = minhash_signature(sh_all).persist()
    sig_all.count()
    bands_all = band_keys_from_signature(sig_all)
    bands_new = bands_all.where(F.col("id") >= MUT_OFFSET)
    bands_corpus = bands_all.where(F.col("id") < MUT_OFFSET)

    cand = (
        bands_new.withColumnsRenamed({"id": "id_a"})
        .join(
            bands_corpus.withColumnsRenamed({"id": "id_b"}),
            ["band_idx", "band_key"],
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    from gov_ec_pipeline_etl_spark.caching import hold

    out = jaccard_verify(cand, sh_all, 0.5, on="h60").select(
        F.col("id_a").alias("new_id"),
        F.col("id_b").alias("corpus_id"),
        "jaccard",
    )
    # register the persisted frames so runners can unpersist via the
    # _persisted_inputs convention (ADVICE r10: sig_all leaked until
    # clearCache) — minhash_sketch's own persist rides along in sh_all.
    return hold(out, sig_all, sh_all)


@register(
    "u13_dedup_funnel",
    oracle=f"""
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + {MUT_OFFSET}, text FROM documents        -- exact copies
          UNION ALL
          SELECT doc_id + {2 * MUT_OFFSET}, text || ' zz0 zz1 zz2'
          FROM documents                                           -- near copies
        ),
        toks AS (
          SELECT doc_id, text,
                 CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens
          FROM corpus
        ),
        exact_kept AS (
          SELECT doc_id, text, n_tokens FROM (
            SELECT *, MIN(doc_id) OVER (
              PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
            ) AS keep_id
            FROM toks
          ) WHERE doc_id = keep_id
        ),
        toksed AS (SELECT doc_id, {TOKS_SQL} AS toks FROM exact_kept),
        mh AS (
          SELECT doc_id,
                 list_min(list_transform({shingles_sql(5)}, s -> md5(s))) AS min_sh
          FROM toksed
        ),
        -- min-shingle equality is an equivalence relation, so components
        -- are the min_sh classes directly (see d06's oracle note) — no
        -- recursive closure needed
        clusters AS (
          SELECT doc_id, MIN(doc_id) OVER (PARTITION BY min_sh) AS cluster_id
          FROM mh
          QUALIFY COUNT(*) OVER (PARTITION BY min_sh) > 1
        ),
        sized AS (
          SELECT k.doc_id, c.cluster_id, length(k.text) AS n
          FROM exact_kept k JOIN clusters c USING (doc_id)
        ),
        mx AS (SELECT cluster_id, MAX(n) AS mxn FROM sized GROUP BY cluster_id),
        reps AS (
          SELECT s.cluster_id, MIN(s.doc_id) AS rep_id
          FROM sized s JOIN mx m ON s.cluster_id = m.cluster_id AND s.n = m.mxn
          GROUP BY s.cluster_id
        ),
        near_kept AS (
          SELECT k.doc_id, k.n_tokens FROM exact_kept k
          LEFT JOIN clusters c ON c.doc_id = k.doc_id
          LEFT JOIN reps r ON r.cluster_id = c.cluster_id
          WHERE c.doc_id IS NULL OR k.doc_id = r.rep_id
        )
        SELECT * FROM (
          SELECT 'raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_tokens) AS BIGINT) AS n_tokens FROM toks
          UNION ALL
          SELECT 'after_exact', CAST(COUNT(*) AS BIGINT),
                 CAST(SUM(n_tokens) AS BIGINT) FROM exact_kept
          UNION ALL
          SELECT 'after_near', CAST(COUNT(*) AS BIGINT),
                 CAST(SUM(n_tokens) AS BIGINT) FROM near_kept
        )
    """,
    doc="The WHOLE dedup funnel as one declarative plan: raw corpus "
    "(with planted exact and near copies) -> exact dedup (min id per "
    "content fingerprint) -> near-dup clustering (min-shingle "
    "components) -> representative survival (longest, ties to lowest "
    "id), reporting documents and token mass retained at each stage — "
    "the end-to-end curation accounting a training-data owner runs. "
    "Composes d01/d06/u02's operators; every stage is hash-groupBy / "
    "window / one iterative CC, no pairwise blowups anywhere.",
    tags=("dedup", "graph", "llm-pipeline"),
)
def u13_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from gov_ec_pipeline_etl_spark.operators.graph import connected_components
    from gov_ec_pipeline_etl_spark.operators.textstats import token_count

    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = (
        docs.unionByName(
            docs.select((F.col("doc_id") + MUT_OFFSET).alias("doc_id"), "text")
        )
        .unionByName(
            docs.select(
                (F.col("doc_id") + 2 * MUT_OFFSET).alias("doc_id"),
                F.concat("text", F.lit(" zz0 zz1 zz2")).alias("text"),
            )
        )
        .withColumn("n_tokens", token_count("text").cast("bigint"))
    )
    fp = F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "))
    w_fp = Window.partitionBy(fp)
    exact_kept = (
        corpus.withColumn("keep_id", F.min("doc_id").over(w_fp))
        .where(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "text", "n_tokens")
        .persist()
    )
    exact_kept.count()  # cache barrier: feeds clustering + two aggregates

    rows = shingle_rows(exact_kept, "doc_id", "text", 5)
    mh = rows.groupBy("id").agg(F.min(F.md5("s")).alias("min_sh"))
    pairs = (
        mh.alias("a")
        .join(
            mh.alias("b"),
            (F.col("a.min_sh") == F.col("b.min_sh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    clusters = connected_components(pairs)  # (doc_id, cluster_id)
    sized = clusters.join(
        exact_kept.select("doc_id", F.length("text").alias("n")), "doc_id"
    )
    reps = sized.groupBy("cluster_id").agg(
        F.min_by(
            "doc_id", F.struct((-F.col("n")).alias("neg_n"), F.col("doc_id"))
        ).alias("rep_id")
    )
    near_kept = (
        exact_kept.join(clusters, "doc_id", "left")
        .join(reps, "cluster_id", "left")
        .where(
            F.col("cluster_id").isNull()
            | (F.col("doc_id") == F.col("rep_id"))
        )
        .select("doc_id", "n_tokens")
    )

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )

    return (
        stage(corpus, "raw")
        .unionByName(stage(exact_kept, "after_exact"))
        .unionByName(stage(near_kept, "after_near"))
    )


@register(
    "w01_training_shuffle",
    oracle=f"""
        WITH h AS (
          SELECT doc_id, source,
                 {portable_hash64_sql("CAST(doc_id AS VARCHAR)", 13)} AS hkey
          FROM documents
        )
        SELECT doc_id, source,
               CAST(hkey % 16 AS INTEGER) AS shard,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY hkey % 16 ORDER BY hkey, doc_id
               ) AS BIGINT) AS pos
        FROM h
    """,
    doc="Training-order shuffle + shard assignment: the data-loader "
    "prep step that turns a curated corpus into N shards, each in a "
    "deterministic pseudo-random order (seeded portable hash; re-seed "
    "to re-shuffle between epochs). Window partitions BY SHARD, so "
    "every shard sorts independently in parallel — no global "
    "single-partition sort ever materializes, which is what makes the "
    "shape valid at 100 TB (1 shuffle: hash-partition by shard).",
    tags=("sampling", "llm-pipeline", "window"),
)
def w01_training_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from gov_ec_pipeline_etl_spark.functions.hashing import portable_hash64

    docs = T(spark, sf_dir, "documents").select("doc_id", "source")
    h = docs.withColumn(
        "hkey", portable_hash64(F.col("doc_id").cast("string"), 13)
    )
    shard = (F.col("hkey") % 16).cast("int")
    w = Window.partitionBy(F.col("hkey") % 16).orderBy("hkey", "doc_id")
    return h.select(
        "doc_id",
        "source",
        shard.alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


@register(
    "w03_zscore_normalize",
    oracle="""
        WITH stats AS (
          SELECT lang, source,
                 AVG(n_chars) AS mu,
                 STDDEV_SAMP(n_chars) AS sigma,
                 COUNT(*) AS n
          FROM documents
          GROUP BY lang, source
        )
        SELECT d.doc_id, d.lang, d.source,
               CASE WHEN s.n < 2 OR s.sigma = 0 THEN NULL
                    ELSE ROUND((d.n_chars - s.mu) / s.sigma, 4) END AS z_len
        FROM documents d
        JOIN stats s ON d.lang = s.lang AND d.source = s.source
    """,
    doc="Per-(lang, source) z-score standardization of document length "
    "— the feature-normalization step quality filters threshold on. "
    "Group stats come from one aggregate; the join back broadcasts the "
    "tiny stats side, so the corpus is scanned twice and shuffled never "
    "(stats agg is partial+final). Degenerate groups (n<2 or zero "
    "variance) yield null rather than a division blowup — mirrored in "
    "the oracle.",
    tags=("textstats", "agg", "llm-pipeline"),
)
def w03_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    stats = docs.groupBy("lang", "source").agg(
        F.avg("n_chars").alias("mu"),
        F.stddev_samp("n_chars").alias("sigma"),
        F.count(F.lit(1)).alias("n"),
    )
    joined = docs.join(F.broadcast(stats), ["lang", "source"])
    z = F.when(
        (F.col("n") < 2) | (F.col("sigma") == 0), F.lit(None)
    ).otherwise(F.round((F.col("n_chars") - F.col("mu")) / F.col("sigma"), 4))
    return joined.select("doc_id", "lang", "source", z.alias("z_len"))


@register(
    "w04_intradoc_dedup",
    oracle="""
        WITH corpus AS (
          SELECT doc_id, text || '. ' || text AS text FROM documents
        ),
        segs AS (
          SELECT doc_id, l[i] AS seg, i
          FROM (SELECT doc_id, string_split(text, '. ') AS l FROM corpus),
               UNNEST(range(1, len(l) + 1)) AS t(i)
        ),
        firsts AS (
          SELECT doc_id, seg, MIN(i) AS first_ord
          FROM segs GROUP BY doc_id, seg
        )
        SELECT doc_id,
               string_agg(seg, '. ' ORDER BY first_ord) AS clean_text
        FROM firsts GROUP BY doc_id
    """,
    doc="Intra-document segment dedup (boilerplate removal): each "
    "document's repeated '. '-separated segments are dropped, keeping "
    "the FIRST occurrence in original order. Repetition is planted by "
    "doubling every document, so the cleaned text must equal the "
    "original — a self-checking property on top of the oracle. "
    "posexplode + min(pos) + ordered reassembly: per-document work, "
    "one shuffle on doc_id, no cross-document interaction — "
    "embarrassingly parallel at corpus scale.",
    tags=("text", "dedup", "llm-pipeline"),
)
def w04_intradoc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").select(
        "doc_id", F.concat("text", F.lit(". "), "text").alias("text")
    )
    segs = docs.select(
        "doc_id", F.posexplode(F.split("text", "\\. ")).alias("pos", "seg")
    )
    firsts = segs.groupBy("doc_id", "seg").agg(
        (F.min("pos") + 1).alias("first_ord")  # 1-based like the oracle
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("first_ord", "seg"))),
        lambda x: x.seg,
    )
    return firsts.groupBy("doc_id").agg(
        F.array_join(ordered, ". ").alias("clean_text")
    )


@register(
    "w05_token_chunking",
    oracle="""
        WITH t AS (
          SELECT doc_id, string_split_regex(text, '\\s+') AS toks
          FROM documents
        ),
        starts AS (
          SELECT doc_id, toks, s
          FROM t, UNNEST(range(0, len(toks), 48)) AS u(s)
        )
        SELECT doc_id,
               CAST(s / 48 AS INTEGER) AS chunk_idx,
               array_to_string(toks[s+1:s+64], ' ') AS chunk_text,
               CAST(len(toks[s+1:s+64]) AS BIGINT) AS n_tokens
        FROM starts
    """,
    doc="Fixed-size token chunking with overlap (chunk 64, stride 48 — "
    "16-token overlap): the RAG / pretraining chunker that windows each "
    "document into model-sized pieces. sequence+explode generates the "
    "stride starts, slice cuts each window — all built-in array "
    "expressions, per-document work, no shuffle before the explode and "
    "none after (chunks stay with their scan partition).",
    tags=("text", "llm-pipeline"),
)
def w05_token_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    toksed = docs.select(
        "doc_id", F.split("text", r"\s+").alias("toks")
    ).withColumn("n", F.size("toks"))
    starts = toksed.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n") - 1, F.lit(0)), F.lit(48))
        ).alias("s"),
    )
    return starts.select(
        "doc_id",
        (F.col("s") / 48).cast("int").alias("chunk_idx"),
        F.array_join(F.slice("toks", F.col("s") + 1, 64), " ").alias("chunk_text"),
        F.size(F.slice("toks", F.col("s") + 1, 64)).cast("bigint").alias("n_tokens"),
    )


@register(
    "w06_countmin_heavyhitters",
    oracle=f"""
        WITH toks AS (
          SELECT unnest(string_split_regex(lower(text), '\\s+')) AS token
          FROM documents
        ),
        exact AS (
          SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_n
          FROM toks GROUP BY token
        ),
        top20 AS (
          SELECT token, exact_n FROM exact
          ORDER BY exact_n DESC, token LIMIT 20
        ),
        seeded AS (
          SELECT token, s,
                 {portable_hash64_sql("token", 0)} * (s + 1) % 1024 AS bucket
          FROM toks, UNNEST(range(0, 4)) AS u(s)
        ),
        cm AS (
          SELECT s, bucket, CAST(COUNT(*) AS BIGINT) AS bucket_n
          FROM seeded GROUP BY s, bucket
        ),
        probes AS (
          SELECT t.token, t.exact_n, u.s,
                 {portable_hash64_sql("t.token", 0)} * (u.s + 1) % 1024 AS bucket
          FROM top20 t, UNNEST(range(0, 4)) AS u(s)
        )
        SELECT p.token, p.exact_n, MIN(c.bucket_n) AS cm_estimate,
               MIN(c.bucket_n) >= p.exact_n AS never_underestimates
        FROM probes p JOIN cm c ON c.s = p.s AND c.bucket = p.bucket
        GROUP BY p.token, p.exact_n
    """,
    doc="Count-Min sketch heavy hitters: token frequencies estimated "
    "from a 4x1024 counter grid (seeded portable hash family), probed "
    "for the exact top-20 tokens. The one-sided error guarantee "
    "(estimate >= truth, equal absent collisions) is emitted as an "
    "oracle-checked boolean per row. The sketch is a fixed-size "
    "aggregate — at 100 TB the counter grid is the only state that "
    "crosses the wire (4096 longs), the classic bounded-memory "
    "frequency structure; here both grid and probe are exact SQL so "
    "the approximation itself is hash-verified cross-engine.",
    tags=("sketch", "agg", "llm-pipeline"),
)
def w06_countmin_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.functions.hashing import portable_hash64

    toks = (
        T(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("token"))
    )
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
    top20 = exact.orderBy(F.col("exact_n").desc(), F.col("token")).limit(20)

    seeds = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("s")
    h = portable_hash64(F.col("token"), 0)
    bucket = (h * (F.col("s") + 1) % 1024).alias("bucket")
    seeded = toks.select("token", seeds).select("token", "s", bucket)
    cm = seeded.groupBy("s", "bucket").agg(F.count(F.lit(1)).alias("bucket_n"))

    probes = top20.select("token", "exact_n", seeds).select(
        "token", "exact_n", "s", bucket
    )
    return (
        probes.join(F.broadcast(cm), ["s", "bucket"])
        .groupBy("token", "exact_n")
        .agg(
            F.min("bucket_n").alias("cm_estimate"),
            (F.min("bucket_n") >= F.first("exact_n")).alias("never_underestimates"),
        )
    )


@register(
    "u14_ngram_index_pairs",
    oracle=lambda sf_dir: __import__(
        "gov_ec_pipeline_etl_spark.plans.dedup_queries", fromlist=["_ngram_oracle"]
    )._ngram_oracle(),
    doc="d04's AMORTIZED deployment form (VERDICT r3 #3): the DF-cut "
    "(id, h60) inverted index is materialized once as a parquet table "
    "partitioned by hash range (write_ngram_index), then the Jaccard "
    "pairs are computed entirely from the READ-BACK index — no "
    "shingling, no head aggregate on the query path. Must bit-match "
    "d04_ngram_jaccard; the oracle is d04's.",
    tags=("dedup", "jaccard", "stored-index", "llm-pipeline"),
)
def u14_ngram_index_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from gov_ec_pipeline_etl_spark.operators.dedup_fuzzy import (
        ngram_pairs_from_index,
        write_ngram_index,
    )

    path = tempfile.mkdtemp(prefix="ngram_index_") + "/idx"
    write_ngram_index(
        _dirty_docs(spark, sf_dir), "doc_id", "text", path, k=3, max_df=50
    )
    return ngram_pairs_from_index(spark, path, jaccard_threshold=0.5)


@register(
    "u15_ppm_decode",
    bench=True,
    oracle="""
        WITH params AS (
          SELECT doc_id AS media_id, 4 + doc_id % 13 AS w, 4 + doc_id % 7 AS h
          FROM documents
        ),
        pix AS (
          SELECT media_id, w, h, unnest(range(0, w*h*3)) AS i FROM params
        )
        SELECT CAST(media_id AS BIGINT) AS media_id,
               CAST(w AS INT) AS width,
               CAST(h AS INT) AS height,
               CAST(SUM(CASE WHEN i % 3 = 0 THEN (media_id*7 + i*13) % 256 END)
                    * 1000000 // (w*h) AS BIGINT) AS mean_r_ppm,
               CAST(SUM(CASE WHEN i % 3 = 1 THEN (media_id*7 + i*13) % 256 END)
                    * 1000000 // (w*h) AS BIGINT) AS mean_g_ppm,
               CAST(SUM(CASE WHEN i % 3 = 2 THEN (media_id*7 + i*13) % 256 END)
                    * 1000000 // (w*h) AS BIGINT) AS mean_b_ppm
        FROM pix
        GROUP BY media_id, w, h
    """,
    doc="REAL image codec (VERDICT r3 #4): genuine netpbm P6 payloads "
    "(header + raw RGB plane) are generated as a pure function of the "
    "id, then decoded by an actual whitespace/comment-tolerant P6 "
    "parser + numpy channel statistics inside Arrow-batched "
    "mapInPandas. The oracle recomputes the channel means "
    "arithmetically — matching proves the parser read the real bytes "
    "correctly. Integer-ppm statistics (u08 discipline).",
    tags=("multimodal", "codec", "pandas-udf", "llm-pipeline"),
)
def u15_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.multimodal import (
        decode_images,
        ppm_fixture_payloads,
    )

    ids = T(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("media_id")
    )
    return decode_images(ppm_fixture_payloads(ids))


def _dhash_oracle(max_hamming: int = 10) -> str:
    """Full arithmetic replay of the image-dHash near-dup path: pixel
    values, grayscale, 11x6 integer-grid sample, 60-bit difference hash,
    exact-fingerprint group collapse, 4x15-bit chunk-LSH candidates,
    Hamming verify — no step trusts the engine. Mirrors u18's group
    replay with the fingerprint coming from pixel arithmetic instead of
    token-hash majority votes."""
    from gov_ec_pipeline_etl_spark.operators.multimodal import (
        DHASH_GRID_H,
        DHASH_GRID_W,
        MUT_DELTA,
        MUT_STEP,
    )
    from gov_ec_pipeline_etl_spark.plans.dedup_queries import _chunk_terms

    def px(i: str) -> str:
        # pixel byte i of (base, mut): the ppm_fixture_payloads formula
        return (
            f"(base*7 + ({i})*13 + CASE WHEN mut = 1 AND ({i}) % {MUT_STEP} = 0 "
            f"THEN {MUT_DELTA} ELSE 0 END) % 256"
        )

    i0 = "(sy*w + sx)*3"
    return f"""
        WITH imgs AS (
          SELECT doc_id AS media_id, doc_id AS base, 0 AS mut FROM documents
          UNION ALL
          SELECT doc_id + {MUT_OFFSET} AS media_id, doc_id AS base, 1 AS mut
          FROM documents WHERE doc_id % 3 = 0
        ),
        dims AS (
          SELECT media_id, base, mut, 4 + base % 13 AS w, 4 + base % 7 AS h
          FROM imgs
        ),
        cells AS (
          SELECT media_id, base, mut, w, h,
                 CAST(u.gy AS BIGINT) AS gy, CAST(v.gx AS BIGINT) AS gx,
                 (CAST(u.gy AS BIGINT) * h) // {DHASH_GRID_H} AS sy,
                 (CAST(v.gx AS BIGINT) * w) // {DHASH_GRID_W} AS sx
          FROM dims,
               UNNEST(range(0, {DHASH_GRID_H})) AS u(gy),
               UNNEST(range(0, {DHASH_GRID_W})) AS v(gx)
        ),
        grays AS (
          SELECT media_id, gy, gx,
                 (({px(i0)}) + ({px(i0 + " + 1")}) + ({px(i0 + " + 2")})) // 3
                   AS gray
          FROM cells
        ),
        bits AS (
          SELECT a.media_id, a.gy, a.gx,
                 CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
          FROM grays a JOIN grays b
            ON b.media_id = a.media_id AND b.gy = a.gy AND b.gx = a.gx + 1
        ),
        fps AS (
          SELECT media_id AS doc_id,
                 CAST(SUM(bit * (CAST(1 AS BIGINT)
                     << CAST(gy*{DHASH_GRID_W - 1} + gx AS INTEGER))) AS BIGINT)
                   AS fp
          FROM bits GROUP BY media_id
        ),
        groups AS (SELECT fp, COUNT(*) AS n_docs FROM fps GROUP BY fp),
        chunked AS (
          SELECT fp, n_docs, unnest([{_chunk_terms(4, 15)}]) AS c
          FROM groups
        )
        SELECT fp AS fp_a, fp AS fp_b, CAST(0 AS INT) AS hamming,
               n_docs AS docs_a, n_docs AS docs_b,
               n_docs * (n_docs - 1) // 2 AS n_pairs
        FROM groups WHERE n_docs >= 2
        UNION ALL
        SELECT DISTINCT a.fp AS fp_a, b.fp AS fp_b,
               CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming,
               a.n_docs AS docs_a, b.n_docs AS docs_b,
               a.n_docs * b.n_docs AS n_pairs
        FROM chunked a JOIN chunked b
          ON a.c.idx = b.c.idx AND a.c.val = b.c.val AND a.fp < b.fp
        WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}
    """


@register(
    "u69_image_dhash",
    bench=True,
    oracle=lambda sf_dir: _dhash_oracle(),
    doc="Content-level IMAGE near-dup (the standard multimodal "
    "pretraining dedup step, VERDICT r6 #5): real PPM payloads — every "
    "document's fixture image plus a brightness-nudged copy for each "
    "doc_id % 3 = 0 — are decoded by the actual P6 parser, perceptual-"
    "hashed (dHash: integer grayscale, 11x6 nearest-neighbor grid, 60 "
    "comparison bits) in one Arrow mapInPandas pass, then paired by the "
    "group-level chunk-LSH SimHash's density guard uses "
    "(fingerprint_group_pairs: exact-fp clone families collapse to ONE "
    "diagonal row with n_pairs = C(n,2) BEFORE banding — the VERDICT r7 "
    "#1 fix; real image corpora are clone-heavy via thumbnails and "
    "re-posts, and the round-7 doc-level form went output-quadratic on "
    "sf3's planted clone families) and verified at Hamming <= 10. "
    "Banded, never all-pairs: output is bounded by DISTINCT-fingerprint "
    "chunk collisions, independent of corpus size, and lossless — "
    "exploding rows by group membership reproduces every doc pair "
    "(unit-tested). The oracle replays pixels, hash, collapse, and "
    "banding arithmetically — matching proves the real decode+hash "
    "path end to end (u15 discipline).",
    tags=("multimodal", "dedup", "dhash", "lsh", "pandas-udf",
          "llm-pipeline"),
)
def u69_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.caching import hold
    from gov_ec_pipeline_etl_spark.operators.dedup_fuzzy import (
        fingerprint_group_pairs,
    )
    from gov_ec_pipeline_etl_spark.operators.multimodal import (
        dhash_images,
        ppm_fixture_payloads,
    )

    docs = T(spark, sf_dir, "documents")
    ids = docs.select(F.col("doc_id").cast("long").alias("media_id"))
    mut = docs.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + MUT_OFFSET).cast("long").alias("media_id")
    )
    payloads = ppm_fixture_payloads(
        ids.unionByName(mut), mut_offset=MUT_OFFSET
    )
    # fingerprints persist+materialize once; the group collapse and both
    # chunk-join sides read the cache (the simhash_pairs discipline —
    # decode+hash is the hot stage)
    fp = dhash_images(payloads).persist()
    fp.count()
    return hold(fingerprint_group_pairs(fp, max_hamming=10), fp)


def _audio_fp_oracle(max_hamming: int = 2) -> str:
    """Full arithmetic replay of the audio near-dup path: PCM16 sample
    values (incl. the planted loudness-nudged copies), 61-segment
    integer energy envelope, 60-bit sign-of-delta fingerprint,
    exact-fingerprint group collapse, 4x15-bit chunk-LSH candidates,
    Hamming verify — no step trusts the engine (the u69/dHash oracle
    discipline applied to the audio leg)."""
    from gov_ec_pipeline_etl_spark.operators.multimodal import (
        AUDIO_FP_SEGMENTS,
        WAV_MUT_DELTA,
        WAV_MUT_STEP,
    )
    from gov_ec_pipeline_etl_spark.plans.dedup_queries import _chunk_terms

    g = AUDIO_FP_SEGMENTS
    return f"""
        WITH clips AS (
          SELECT doc_id AS media_id, doc_id AS base, 0 AS mut FROM documents
          UNION ALL
          SELECT doc_id + {MUT_OFFSET} AS media_id, doc_id AS base, 1 AS mut
          FROM documents WHERE doc_id % 3 = 0
        ),
        dims AS (
          SELECT media_id, base, mut, 50 + base % 101 AS ns FROM clips
        ),
        samp AS (
          SELECT media_id,
                 (CAST(u.i AS BIGINT) * {g}) // ns AS seg,
                 (base*31 + CAST(u.i AS BIGINT)*17) % 4001
                   + CASE WHEN mut = 1 AND u.i % {WAV_MUT_STEP} = 0
                          THEN {WAV_MUT_DELTA} ELSE 0 END AS v
          FROM dims, UNNEST(range(0, ns)) AS u(i)
        ),
        segsum AS (
          SELECT media_id, seg, SUM(v*v) AS e FROM samp
          GROUP BY media_id, seg
        ),
        grid AS (
          SELECT media_id, CAST(t.j AS BIGINT) AS j
          FROM dims, UNNEST(range(0, {g})) AS t(j)
        ),
        env AS (
          SELECT grid.media_id, grid.j, COALESCE(segsum.e, 0) AS e
          FROM grid LEFT JOIN segsum
            ON segsum.media_id = grid.media_id AND segsum.seg = grid.j
        ),
        bits AS (
          SELECT a.media_id, a.j AS bitpos,
                 CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
          FROM env a JOIN env b
            ON b.media_id = a.media_id AND b.j = a.j + 1
        ),
        fps AS (
          SELECT media_id,
                 CAST(SUM(bit * (CAST(1 AS BIGINT)
                     << CAST(bitpos AS INTEGER))) AS BIGINT) AS fp
          FROM bits GROUP BY media_id
        ),
        groups AS (SELECT fp, COUNT(*) AS n_docs FROM fps GROUP BY fp),
        chunked AS (
          SELECT fp, n_docs, unnest([{_chunk_terms(4, 15)}]) AS c
          FROM groups
        )
        SELECT fp AS fp_a, fp AS fp_b, CAST(0 AS INT) AS hamming,
               n_docs AS docs_a, n_docs AS docs_b,
               n_docs * (n_docs - 1) // 2 AS n_pairs
        FROM groups WHERE n_docs >= 2
        UNION ALL
        SELECT DISTINCT a.fp AS fp_a, b.fp AS fp_b,
               CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming,
               a.n_docs AS docs_a, b.n_docs AS docs_b,
               a.n_docs * b.n_docs AS n_pairs
        FROM chunked a JOIN chunked b
          ON a.c.idx = b.c.idx AND a.c.val = b.c.val AND a.fp < b.fp
        WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}
    """


@register(
    "u70_audio_fp_neardup",
    bench=True,
    oracle=lambda sf_dir: _audio_fp_oracle(),
    doc="Content-level AUDIO near-dup — the third leg of the multimodal "
    "pretraining dedup triad (text u18/d02, image u69, audio here; "
    "VERDICT r7 missing #2): real RIFF/WAVE PCM16 payloads — every "
    "document's fixture clip plus a loudness-nudged copy for each "
    "doc_id % 3 = 0 — are decoded by the actual RIFF chunk walker, "
    "fingerprinted (61-segment integer energy envelope, 60 "
    "sign-of-delta bits — the dHash trick on the time-domain envelope, "
    "spectrogram-free so SQL can replay it) in one Arrow mapInPandas "
    "pass, then paired by the shared group-level chunk-LSH "
    "(fingerprint_group_pairs: exact-fp clone families collapse to one "
    "diagonal row BEFORE banding — the u69 r8 contract from day one) "
    "and verified at Hamming <= 2. Banded, never all-pairs; output "
    "bounded by distinct-fingerprint candidate pairs (simulated sf1: "
    "~51k rows from 66k clips, near-linear). The oracle replays "
    "samples, envelope, hash, collapse, and banding arithmetically — "
    "matching proves the real decode+fingerprint path end to end.",
    tags=("multimodal", "dedup", "audio", "lsh", "pandas-udf",
          "llm-pipeline"),
)
def u70_audio_fp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.caching import hold
    from gov_ec_pipeline_etl_spark.operators.dedup_fuzzy import (
        fingerprint_group_pairs,
    )
    from gov_ec_pipeline_etl_spark.operators.multimodal import (
        audio_envelope_fp,
        wav_fixture_payloads,
    )

    docs = T(spark, sf_dir, "documents")
    ids = docs.select(F.col("doc_id").cast("long").alias("media_id"))
    mut = docs.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + MUT_OFFSET).cast("long").alias("media_id")
    )
    payloads = wav_fixture_payloads(
        ids.unionByName(mut), mut_offset=MUT_OFFSET
    )
    # fingerprints persist+materialize once; the group collapse and both
    # chunk-join sides read the cache (decode+hash is the hot stage)
    fp = audio_envelope_fp(payloads).persist()
    fp.count()
    return hold(fingerprint_group_pairs(fp, max_hamming=2), fp)


def _video_fp_oracle(max_hamming: int = 6) -> str:
    """Full arithmetic replay of the video near-dup path: quadratic-
    residue pixel noise, per-sampled-frame 11x6 dHash, per-bit majority
    across frames, exact-fingerprint group collapse, 4x15-bit chunk-LSH
    candidates, Hamming verify — no step trusts the engine (the u69/u70
    discipline, third modality)."""
    from gov_ec_pipeline_etl_spark.operators.multimodal import (
        DHASH_GRID_H,
        DHASH_GRID_W,
        VID_FRAME_STRIDE,
        VID_MOD,
        VID_MUT_DELTA,
        VID_MUT_STEP,
    )
    from gov_ec_pipeline_etl_spark.plans.dedup_queries import _chunk_terms

    return f"""
        WITH vids AS (
          SELECT doc_id AS media_id, doc_id AS base, 0 AS mut FROM documents
          UNION ALL
          SELECT doc_id + {MUT_OFFSET} AS media_id, doc_id AS base, 1 AS mut
          FROM documents WHERE doc_id % 3 = 0
        ),
        dims AS (
          SELECT media_id, base, mut,
                 12 + base % 7 AS w, 6 + base % 5 AS h, 6 + base % 4 AS nf
          FROM vids
        ),
        frames AS (
          SELECT media_id, base, mut, w, h, CAST(fr.f AS BIGINT) AS f
          FROM dims, UNNEST(range(0, nf, {VID_FRAME_STRIDE})) AS fr(f)
        ),
        cells AS (
          SELECT media_id, base, mut, w, f,
                 CAST(u.gy AS BIGINT) AS gy, CAST(v.gx AS BIGINT) AS gx,
                 ((CAST(u.gy AS BIGINT) * h) // {DHASH_GRID_H}) * w
                   + (CAST(v.gx AS BIGINT) * w) // {DHASH_GRID_W} AS i
          FROM frames,
               UNNEST(range(0, {DHASH_GRID_H})) AS u(gy),
               UNNEST(range(0, {DHASH_GRID_W})) AS v(gx)
        ),
        mixed AS (
          SELECT media_id, mut, f, gy, gx, i,
                 (base*1103515245 + f*12345 + i*2654435761) % {VID_MOD} AS x
          FROM cells
        ),
        pix AS (
          SELECT media_id, f, gy, gx,
                 (((x*x) % {VID_MOD}) % 256
                  + CASE WHEN mut = 1 AND i % {VID_MUT_STEP} = 0
                         THEN {VID_MUT_DELTA} ELSE 0 END) % 256 AS p
          FROM mixed
        ),
        fbits AS (
          SELECT a.media_id, a.f, a.gy, a.gx,
                 CASE WHEN b.p > a.p THEN 1 ELSE 0 END AS bit
          FROM pix a JOIN pix b
            ON b.media_id = a.media_id AND b.f = a.f
           AND b.gy = a.gy AND b.gx = a.gx + 1
        ),
        vbits AS (
          SELECT media_id, gy, gx,
                 CASE WHEN 2*SUM(bit) >= COUNT(*) THEN 1 ELSE 0 END AS bit
          FROM fbits GROUP BY media_id, gy, gx
        ),
        fps AS (
          SELECT media_id AS doc_id,
                 CAST(SUM(bit * (CAST(1 AS BIGINT)
                     << CAST(gy*{DHASH_GRID_W - 1} + gx AS INTEGER))) AS BIGINT)
                   AS fp
          FROM vbits GROUP BY media_id
        ),
        groups AS (SELECT fp, COUNT(*) AS n_docs FROM fps GROUP BY fp),
        chunked AS (
          SELECT fp, n_docs, unnest([{_chunk_terms(4, 15)}]) AS c
          FROM groups
        )
        SELECT fp AS fp_a, fp AS fp_b, CAST(0 AS INT) AS hamming,
               n_docs AS docs_a, n_docs AS docs_b,
               n_docs * (n_docs - 1) // 2 AS n_pairs
        FROM groups WHERE n_docs >= 2
        UNION ALL
        SELECT DISTINCT a.fp AS fp_a, b.fp AS fp_b,
               CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming,
               a.n_docs AS docs_a, b.n_docs AS docs_b,
               a.n_docs * b.n_docs AS n_pairs
        FROM chunked a JOIN chunked b
          ON a.c.idx = b.c.idx AND a.c.val = b.c.val AND a.fp < b.fp
        WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}
    """


@register(
    "u72_video_fp_neardup",
    bench=True,
    oracle=lambda sf_dir: _video_fp_oracle(),
    doc="Content-level VIDEO near-dup — the fourth modality on the "
    "shared fingerprint machinery (text u18/d02, image u69, audio u70; "
    "VERDICT r8 #7, shipped WITH the required fixture redesign: the r8 "
    "attempt's linear PPM ramp gave low-entropy fingerprints and "
    "superlinear output, so the r9 fixture uses quadratic-residue "
    "pixel noise mod 2^31-1 — measured 49992/50000 distinct video fps "
    "at sf1-scale ids, planted mutation Hamming <= 6). Real container "
    "walk (VID header + raw grayscale frame planes), temporal frame-"
    "sampling every 2nd frame, per-frame 11x6 dHash, per-bit majority "
    "across sampled frames, then the shared group-level chunk-LSH "
    "(fingerprint_group_pairs — exact-fp clone families collapse to "
    "one diagonal row BEFORE banding) verified at Hamming <= 6. Recall "
    "bound (ADVICE r9): 4x15-bit chunk-LSH GUARANTEES candidate recall "
    "only for Hamming <= 3 (pigeonhole — one chunk must be untouched); "
    "pairs at 4-6 flips are found best-effort unless all four chunks "
    "are hit, and engine and oracle miss such pairs IDENTICALLY, so "
    "parity stays exact while absolute recall at 4-6 is not promised. "
    "The "
    "oracle replays pixels, per-frame hash, majority, collapse, and "
    "banding arithmetically — matching proves the real parse+"
    "fingerprint path end to end.",
    tags=("multimodal", "dedup", "video", "lsh", "pandas-udf",
          "llm-pipeline"),
)
def u72_video_fp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.caching import hold
    from gov_ec_pipeline_etl_spark.operators.dedup_fuzzy import (
        fingerprint_group_pairs,
    )
    from gov_ec_pipeline_etl_spark.operators.multimodal import (
        video_dhash_fp,
        video_fixture_payloads,
    )

    docs = T(spark, sf_dir, "documents")
    ids = docs.select(F.col("doc_id").cast("long").alias("media_id"))
    mut = docs.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + MUT_OFFSET).cast("long").alias("media_id")
    )
    payloads = video_fixture_payloads(
        ids.unionByName(mut), mut_offset=MUT_OFFSET
    )
    # fingerprints persist+materialize once; the group collapse and both
    # chunk-join sides read the cache (parse+hash is the hot stage)
    fp = video_dhash_fp(payloads).persist()
    fp.count()
    return hold(fingerprint_group_pairs(fp, max_hamming=6), fp)


@register(
    "u16_wav_decode",
    oracle="""
        WITH params AS (
          SELECT doc_id AS media_id,
                 8000 + 1000*(doc_id % 5) AS sr,
                 50 + doc_id % 101 AS ns
          FROM documents
        ),
        samp AS (
          SELECT media_id, sr, ns, (media_id*31 + unnest(range(0, ns))*17) % 4001 AS v
          FROM params
        )
        SELECT CAST(media_id AS BIGINT) AS media_id,
               CAST(sr AS INT) AS sample_rate,
               CAST(ns AS BIGINT) AS n_samples,
               CAST(SUM(v) * 1000000 // ns AS BIGINT) AS amp_mean_ppm,
               CAST(SUM(v*v) * 1000000 // ns AS BIGINT) AS energy_ppm
        FROM samp
        GROUP BY media_id, sr, ns
    """,
    doc="REAL audio codec (VERDICT r3 #4): genuine RIFF/WAVE PCM16 mono "
    "payloads (fmt + data chunks, little-endian samples) generated as a "
    "pure function of the id, decoded by an actual RIFF chunk walker + "
    "numpy int16 statistics in mapInPandas. Samples are kept "
    "non-negative because Spark's DIV truncates while DuckDB's // "
    "floors — divergent on negative sums. Integer-ppm statistics.",
    tags=("multimodal", "codec", "pandas-udf", "llm-pipeline"),
)
def u16_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.multimodal import (
        decode_audio,
        wav_fixture_payloads,
    )

    ids = T(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("media_id")
    )
    return decode_audio(wav_fixture_payloads(ids))


@register(
    "u17_ngram_incremental",
    oracle=f"""
        WITH corpus AS (SELECT doc_id, text FROM documents),
        arrivals AS (
          SELECT doc_id + {MUT_OFFSET} AS doc_id, text || ' zz0 zz1 zz2' AS text
          FROM documents WHERE doc_id % 5 = 0
        ),
        ctoks AS (SELECT doc_id, {TOKS_SQL} AS toks FROM corpus),
        csh AS (SELECT doc_id, unnest({shingles_sql(3)}) AS s FROM ctoks),
        counts AS (SELECT s, COUNT(*) AS c FROM csh GROUP BY s),
        head AS (SELECT s FROM counts WHERE c > 50),
        kept AS (SELECT doc_id, s FROM csh WHERE s NOT IN (SELECT s FROM head)),
        atoks AS (SELECT doc_id, {TOKS_SQL} AS toks FROM arrivals),
        ash AS (SELECT doc_id, unnest({shingles_sql(3)}) AS s FROM atoks),
        akept AS (SELECT doc_id, s FROM ash WHERE s NOT IN (SELECT s FROM head)),
        sizes_c AS (SELECT doc_id, COUNT(*) AS sz FROM kept GROUP BY doc_id),
        sizes_a AS (SELECT doc_id, COUNT(*) AS sz FROM akept GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS new_id, c.doc_id AS corpus_id, COUNT(*) AS n
          FROM akept a JOIN kept c ON a.s = c.s
          GROUP BY a.doc_id, c.doc_id
        )
        SELECT new_id, corpus_id,
               ROUND(CAST(n AS DOUBLE) / (sa.sz + sc.sz - n), 6) AS jaccard
        FROM inter
        JOIN sizes_a sa ON sa.doc_id = new_id
        JOIN sizes_c sc ON sc.doc_id = corpus_id
        WHERE CAST(n AS DOUBLE) / (sa.sz + sc.sz - n) >= 0.5
    """,
    doc="INCREMENTAL exact n-gram Jaccard against the STORED inverted "
    "index (u14's ingest-time companion, mirroring u12's MinHash "
    "shape): the corpus index (kept rows + head set) is written once; "
    "per batch the arrivals are shingled, the stored CORPUS head cut "
    "is applied to the arrival side (broadcast anti-join — both sides "
    "carry one consistent cut), and one asymmetric h60 join against "
    "the read-back index yields exact Jaccard. The corpus is never "
    "re-shingled and never self-joined.",
    tags=("dedup", "incremental", "stored-index", "llm-pipeline"),
)
def u17_ngram_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from gov_ec_pipeline_etl_spark.operators.dedup_fuzzy import (
        ngram_incremental_against_index,
        write_ngram_index,
    )

    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    arrivals = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + MUT_OFFSET).alias("doc_id"),
        F.concat("text", F.lit(" zz0 zz1 zz2")).alias("text"),
    )
    path = tempfile.mkdtemp(prefix="ngram_inc_") + "/idx"
    write_ngram_index(docs, "doc_id", "text", path, k=3, max_df=50)
    return ngram_incremental_against_index(
        arrivals, spark, path, threshold=0.5
    )


# --- deterministic splits + leakage audit --------------------------------

_DIRTY_WITH_SOURCE_SQL = f"""
  SELECT doc_id, source FROM documents
  UNION ALL
  SELECT doc_id + {MUT_OFFSET} AS doc_id, source FROM documents
"""


def _split_oracle() -> str:
    from gov_ec_pipeline_etl_spark.operators.splits import stratified_split_sql

    return stratified_split_sql(
        "SELECT doc_id, source FROM documents", "doc_id", "source"
    )


@register(
    "u28_stratified_split",
    oracle=_split_oracle(),
    doc="Deterministic stratified train/val/test split (800/100/100 ppt, "
    "exact per-source counts): rank by portable hash within stratum, "
    "integer-threshold assignment. The engine computes the rank "
    "hierarchically — hash-prefix buckets, broadcast cumulative "
    "offsets, within-bucket row_number — so no stratum ever occupies "
    "one window partition at 100 TB; the oracle runs the equivalent "
    "global-window definition, proving the decomposition exact.",
    tags=("llm-pipeline", "sampling", "split"),
)
def u28_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.splits import stratified_split

    return stratified_split(
        T(spark, sf_dir, "documents"), "doc_id", "source"
    )


def _leakage_oracle(max_bucket: int | None = None) -> str:
    from gov_ec_pipeline_etl_spark.operators.splits import stratified_split_sql
    from gov_ec_pipeline_etl_spark.plans.dedup_queries import _minhash_oracle

    return f"""
        WITH pairs AS ({_minhash_oracle(max_bucket=max_bucket)}),
        splits AS ({stratified_split_sql(_DIRTY_WITH_SOURCE_SQL, "doc_id", "source")})
        SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b,
               p.jaccard
        FROM pairs p
        JOIN splits sa ON sa.id = p.id_a
        JOIN splits sb ON sb.id = p.id_b
        WHERE sa.split <> sb.split
    """


@register(
    "u29_split_leakage_check",
    oracle=_leakage_oracle(),
    doc="Split-leakage audit: near-duplicate pairs (d02's MinHash+LSH "
    "semantics, exact-Jaccard >= 0.5) whose members land in DIFFERENT "
    "splits of u28's deterministic stratified assignment — the check a "
    "pretraining pipeline runs before trusting val/test numbers, since "
    "a near-copy of a train document in the held-out split inflates "
    "eval. Composition of two oracled operators; the near-dup pair set "
    "is LSH-bounded and the split table joins by id, so the audit adds "
    "two hash joins to the dedup cost — no new quadratic surface.",
    tags=("llm-pipeline", "dedup", "split", "audit"),
)
def u29_split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _split_leakage(spark, sf_dir, max_bucket=None)


def _split_leakage(
    spark: SparkSession, sf_dir: str, max_bucket: int | None
) -> DataFrame:
    """Shared body of u29 (exact parity form) and u74 (budgeted twin):
    near-dup pairs joined to the stratified split table, keeping only
    cross-split pairs. ``max_bucket`` threads straight through to
    ``minhash_lsh_pairs``' candidate-budget knob."""
    from gov_ec_pipeline_etl_spark.operators.dedup_fuzzy import minhash_lsh_pairs
    from gov_ec_pipeline_etl_spark.operators.splits import stratified_split

    docs = T(spark, sf_dir, "documents").select("doc_id", "text", "source")
    dirty = docs.unionByName(
        docs.select(
            (F.col("doc_id") + MUT_OFFSET).alias("doc_id"),
            F.concat("text", F.lit(" zz0 zz1 zz2")).alias("text"),
            "source",
        )
    )
    pairs = minhash_lsh_pairs(
        dirty, "doc_id", "text", k=3, num_hashes=12, bands=4,
        jaccard_threshold=0.5, max_bucket=max_bucket,
    )
    splits = stratified_split(
        dirty.select("doc_id", "source"), "doc_id", "source"
    )
    sa = splits.select(
        F.col("id").alias("id_a"), F.col("split").alias("split_a")
    )
    sb = splits.select(
        F.col("id").alias("id_b"), F.col("split").alias("split_b")
    )
    from gov_ec_pipeline_etl_spark.caching import hold

    out = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .where(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b", "jaccard")
    )
    return hold(out, *getattr(pairs, "_persisted_inputs", []))


@register(
    "u74_split_leakage_budgeted",
    bench=True,
    oracle=_leakage_oracle(max_bucket=64),
    doc="u29's budgeted twin (VERDICT r9 #1 — u29 was the last >3x "
    "skew-inflating form without a bounded election): the same "
    "split-leakage audit consuming the max_bucket=64 CAPPED near-dup "
    "pair stream instead of the uncapped one, so each (band, key) LSH "
    "bucket contributes at most C(64,2) candidate pairs BY CONTRACT "
    "(rank <= K pre-truncation -> WindowGroupLimit; the u68/u73 "
    "recipe, same knob value). On a skewed corpus the uncapped audit "
    "is output-driven (r9 skew gate: u29 eng 13.8 -> 65.4 s, 4.7x) "
    "because zipf clone families blow up bucket occupancy; the cap "
    "bounds the pair fan-out before the shuffle carries it. "
    "Deterministic lowest-id survivors, hence fully oracle-replayable "
    "— the oracle replays the identical cap in SQL via the d02 "
    "fragment's ROW_NUMBER() form. u29 stays registered as the exact "
    "parity form; this is the production election.",
    tags=("llm-pipeline", "dedup", "split", "audit", "scale-guard"),
)
def u74_split_leakage_budgeted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _split_leakage(spark, sf_dir, max_bucket=64)


# --- span-level duplication + LM quality scoring --------------------------


@register(
    "u30_duplicated_spans",
    bench=True,
    oracle=f"""
        WITH toksed AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
        sh AS (
          SELECT doc_id, unnest({positional_shingles_sql(3)}) AS s
          FROM toksed
        ),
        occ AS (
          SELECT doc_id, s, COUNT(*) AS c FROM sh GROUP BY doc_id, s
        ),
        dfreq AS (SELECT s, COUNT(*) AS df FROM occ GROUP BY s)
        SELECT o.doc_id AS id,
               CAST(SUM(o.c) AS BIGINT) AS n_spans,
               CAST(SUM(CASE WHEN d.df >= 2 THEN o.c ELSE 0 END)
                    AS BIGINT) AS dup_spans,
               ROUND(CAST(SUM(CASE WHEN d.df >= 2 THEN o.c ELSE 0 END)
                          AS DOUBLE) / SUM(o.c), 6) AS dup_mass
        FROM occ o JOIN dfreq d USING (s)
        GROUP BY o.doc_id
    """,
    doc="Per-document duplicated-span mass (Lee et al. 2022's "
    "substring-level duplication signal): the fraction of each "
    "document's POSITIONAL 3-token spans occurring in >= 2 documents. "
    "Catches shared boilerplate runs that whole-document Jaccard (d04) "
    "dilutes away. Two span-keyed aggregations + one join that reuses "
    "their partitioning — linear in corpus token count at any scale; "
    "the span join identity can switch to fast_hash64 for 8-byte "
    "shuffle keys in engine-local mode.",
    tags=("llm-pipeline", "dedup", "text", "spans"),
)
def u30_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.dedup_fuzzy import (
        duplicated_span_mass,
    )

    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    return duplicated_span_mass(docs, "doc_id", "text", k=3)


@register(
    "u32_bigram_xent",
    oracle=f"""
        WITH toksed AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
        tok AS (
          SELECT doc_id, toks[u.i] AS t
          FROM toksed, UNNEST(range(1, len(toks) + 1)) AS u(i)
        ),
        bg AS (
          SELECT doc_id, toks[u.i] AS w1, toks[u.i + 1] AS w2
          FROM toksed, UNNEST(range(1, len(toks))) AS u(i)
        ),
        c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
        c1 AS (
          SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1
        ),
        vocab AS (SELECT COUNT(DISTINCT t) AS v FROM tok),
        scored AS (
          SELECT b.doc_id,
                 ln(CAST(c2.c2 + 1 AS DOUBLE) / (c1.c1 + vocab.v)) AS lp
          FROM bg b JOIN c2 USING (w1, w2) JOIN c1 USING (w1), vocab
        )
        SELECT doc_id AS id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(-AVG(lp), 6) AS xent
        FROM scored GROUP BY doc_id
    """,
    doc="Per-document bigram cross-entropy under an add-one-smoothed "
    "bigram LM fitted on the corpus itself in the same pass — the "
    "CCNet-style LM quality signal (Wenzek et al. 2020; there a "
    "pretrained KenLM, here corpus-fitted so the query is "
    "self-contained): boilerplate-heavy repetitive documents score low "
    "xent, token-salad scores high. The context-count table c1 is the "
    "AGGREGATE OF THE AGGREGATE (c2 re-grouped) — the corpus is "
    "scanned once for bigrams; the count tables are vocab-bounded and "
    "AQE broadcasts them at this scale while the same plan hash-joins "
    "when a 100 TB vocab outgrows the threshold.",
    tags=("llm-pipeline", "text", "quality", "lm"),
)
def u32_bigram_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.lm import bigram_crossentropy

    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    return bigram_crossentropy(docs, "doc_id", "text")


@register(
    "u33_decontaminate_spans",
    oracle=f"""
        WITH toksed AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
        ev AS (
          SELECT DISTINCT s FROM (
            SELECT unnest({shingles_sql(5)}) AS s FROM toksed
            WHERE doc_id % {EVAL_MOD} = 0
          )
        ),
        tr AS (
          SELECT doc_id, unnest({positional_shingles_sql(5)}) AS s
          FROM toksed WHERE doc_id % {EVAL_MOD} <> 0
        )
        SELECT t.doc_id AS id,
               CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(CASE WHEN e.s IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS hit_spans,
               ROUND(CAST(SUM(CASE WHEN e.s IS NOT NULL THEN 1 ELSE 0 END)
                          AS DOUBLE) / COUNT(*), 6) AS hit_mass,
               CAST(CASE WHEN SUM(CASE WHEN e.s IS NOT NULL THEN 1 ELSE 0
                                  END) * 10 > COUNT(*)
                    THEN 1 ELSE 0 END AS INT) AS dropped
        FROM tr t LEFT JOIN ev e USING (s)
        GROUP BY t.doc_id
    """,
    doc="Span-level eval decontamination (the GPT-3/PaLM removal form, "
    "Brown et al. 2020 App. C): for each training document, the "
    "fraction of its POSITIONAL 5-token spans colliding with ANY "
    "eval-set span, and the resulting drop decision (>10% hit mass). "
    "u01 reports contaminated doc PAIRS for audit; this is the "
    "per-training-doc actionable mass. The distinct eval span set is "
    "broadcast (eval sets are small by definition); one left join + "
    "one per-doc agg — linear in corpus token count at 100 TB.",
    tags=("llm-pipeline", "dedup", "text", "spans", "audit"),
)
def u33_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.dedup_fuzzy import (
        positional_shingle_rows,
    )

    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    ev = (
        shingle_rows(
            docs.where(F.col("doc_id") % EVAL_MOD == 0), "doc_id", "text", 5
        )
        .select("s")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    spans = positional_shingle_rows(
        docs.where(F.col("doc_id") % EVAL_MOD != 0), "doc_id", "text", 5
    )
    hit = F.coalesce(F.col("hit"), F.lit(0))
    return (
        spans.join(F.broadcast(ev), "s", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(hit).alias("hit_spans"),
        )
        .select(
            "id",
            "n_spans",
            "hit_spans",
            F.round(F.col("hit_spans") / F.col("n_spans"), 6).alias(
                "hit_mass"
            ),
            (F.col("hit_spans") * 10 > F.col("n_spans"))
            .cast("int")
            .alias("dropped"),
        )
    )


_NTOK_SQL = """CASE WHEN trim(text) = '' THEN 0
  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"""


def _budget_oracle(budget_ppt: int = 600) -> str:
    from gov_ec_pipeline_etl_spark.operators.sampling import BUDGET_SEED

    h = portable_hash64_sql("CAST(doc_id AS VARCHAR)", BUDGET_SEED)
    return f"""
        WITH base AS (
          SELECT doc_id AS id, source AS stratum,
                 CAST({_NTOK_SQL} AS BIGINT) AS toks,
                 {h} AS h
          FROM documents
        ),
        cum AS (
          SELECT id, stratum, toks,
                 CAST(COALESCE(SUM(toks) OVER (
                   PARTITION BY stratum ORDER BY h, id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS BIGINT) AS cum_before,
                 CAST(SUM(toks) OVER (PARTITION BY stratum) AS BIGINT)
                   AS total
          FROM base
        )
        SELECT id, stratum, toks, cum_before
        FROM cum
        WHERE cum_before * 1000 < total * {budget_ppt}
    """


@register(
    "u34_token_budget_mix",
    oracle=_budget_oracle(),
    doc="Token-budget mixture construction: per source, keep documents "
    "in deterministic hash-priority order until 60% of the source's "
    "TOKEN mass is reached (rows are not tokens — a row-fraction "
    "sample misses a token budget when lengths vary). The engine "
    "computes the per-source running token sum HIERARCHICALLY "
    "(hash-prefix buckets + broadcast offsets + within-bucket running "
    "sum — u28's decomposition applied to SUM), so no source ever "
    "occupies one window partition at 100 TB; the oracle runs the "
    "global-window definition, proving the decomposition exact.",
    tags=("llm-pipeline", "sampling", "mixing"),
)
def u34_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.sampling import (
        token_budget_take,
    )
    from gov_ec_pipeline_etl_spark.operators.textstats import token_count

    docs = T(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        token_count("text").cast("bigint").alias("n_tokens"),
    )
    return token_budget_take(
        docs, "doc_id", "source", "n_tokens", budget_ppt=600
    )


def _funnel_oracle(max_bucket: int | None = None) -> str:
    from gov_ec_pipeline_etl_spark.operators.splits import (
        stratified_split_sql,
    )
    from gov_ec_pipeline_etl_spark.plans.dedup_queries import (
        _minhash_oracle,
    )

    eval_cond = f"(doc_id % {EVAL_MOD} = 0 AND doc_id < {MUT_OFFSET})"
    split_sql = stratified_split_sql(
        "SELECT doc_id, source FROM pre WHERE disp IS NULL",
        "doc_id",
        "source",
    )
    return f"""
        WITH dirtyf AS (
          SELECT doc_id, text, source FROM documents
          UNION ALL
          SELECT doc_id + {MUT_OFFSET} AS doc_id,
                 text || ' zz0 zz1 zz2' AS text, source
          FROM documents
        ),
        pairs AS ({_minhash_oracle(max_bucket=max_bucket)}),
        nd AS (SELECT DISTINCT id_b AS doc_id FROM pairs),
        toksed2 AS (SELECT doc_id, {TOKS_SQL} AS toks FROM dirtyf),
        ev AS (
          SELECT DISTINCT s FROM (
            SELECT unnest({shingles_sql(5)}) AS s FROM toksed2
            WHERE {eval_cond}
          )
        ),
        tr AS (
          SELECT doc_id, unnest({positional_shingles_sql(5)}) AS s
          FROM toksed2 WHERE NOT {eval_cond}
        ),
        cont AS (
          SELECT t.doc_id FROM tr t LEFT JOIN ev e USING (s)
          GROUP BY t.doc_id
          HAVING SUM(CASE WHEN e.s IS NOT NULL THEN 1 ELSE 0 END) * 10
                 > COUNT(*)
        ),
        fps AS (
          SELECT doc_id, source, text,
                 MIN(doc_id) OVER (
                   PARTITION BY md5(regexp_replace(lower(trim(text)),
                                                   '\\s+', ' ', 'g'))
                 ) AS min_id
          FROM dirtyf
        ),
        pre AS (
          SELECT f.doc_id, f.source,
                 CASE WHEN {eval_cond.replace("doc_id", "f.doc_id")}
                        THEN 'eval'
                      WHEN ({_NTOK_SQL.replace("text", "f.text")}) < 5
                        THEN 'short'
                      WHEN f.doc_id <> f.min_id THEN 'exact_dup'
                      WHEN n.doc_id IS NOT NULL THEN 'near_dup'
                      WHEN c.doc_id IS NOT NULL THEN 'contaminated'
                      ELSE NULL END AS disp
          FROM fps f
          LEFT JOIN nd n ON n.doc_id = f.doc_id
          LEFT JOIN cont c ON c.doc_id = f.doc_id
        ),
        splits AS ({split_sql})
        SELECT p.doc_id AS id, p.source,
               COALESCE(p.disp, s.split) AS disposition
        FROM pre p LEFT JOIN splits s ON s.id = p.doc_id
    """


@register(
    "u35_curation_funnel",
    oracle=_funnel_oracle(),
    doc="The whole curation pass as ONE declarative plan — per document "
    "its final disposition: eval carve-out, length gate (<5 tokens), "
    "exact dedup (keep-lowest-id per content fingerprint), near-dup "
    "drop (d02's MinHash+LSH pairs, higher id dropped — greedy "
    "keep-lowest, applied corpus-wide), span decontamination (u33's "
    ">10% eval 5-gram mass), then u28's deterministic stratified split "
    "over the SURVIVORS. Every stage is an already-oracled operator; "
    "the composition is what a user runs nightly before training. One "
    "pass over the corpus per signal, all joins on doc_id after "
    "candidate generation — no stage adds a quadratic surface beyond "
    "the LSH-bounded pair set.",
    tags=("llm-pipeline", "dedup", "split", "audit", "funnel"),
)
def u35_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _curation_funnel(spark, sf_dir, max_bucket=None)


def _curation_funnel(
    spark: SparkSession, sf_dir: str, max_bucket: int | None
) -> DataFrame:
    from pyspark.sql import Window

    from gov_ec_pipeline_etl_spark.caching import hold
    from gov_ec_pipeline_etl_spark.operators.dedup_fuzzy import (
        minhash_lsh_pairs,
        positional_shingle_rows,
    )
    from gov_ec_pipeline_etl_spark.operators.splits import stratified_split
    from gov_ec_pipeline_etl_spark.operators.textstats import (
        content_fingerprint,
        token_count,
    )

    docs = T(spark, sf_dir, "documents").select("doc_id", "text", "source")
    dirty = docs.unionByName(
        docs.select(
            (F.col("doc_id") + MUT_OFFSET).alias("doc_id"),
            F.concat("text", F.lit(" zz0 zz1 zz2")).alias("text"),
            "source",
        )
    )
    is_eval = (F.col("doc_id") % EVAL_MOD == 0) & (
        F.col("doc_id") < MUT_OFFSET
    )
    pairs = minhash_lsh_pairs(
        dirty.select("doc_id", "text"), "doc_id", "text",
        k=3, num_hashes=12, bands=4, jaccard_threshold=0.5,
        max_bucket=max_bucket,
    )
    nd = pairs.select(F.col("id_b").alias("doc_id")).distinct().withColumn(
        "neardup", F.lit(1)
    )
    ev = (
        shingle_rows(dirty.where(is_eval), "doc_id", "text", 5)
        .select("s")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    cont = (
        positional_shingle_rows(dirty.where(~is_eval), "doc_id", "text", 5)
        .join(F.broadcast(ev), "s", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("hit_spans"),
        )
        .where(F.col("hit_spans") * 10 > F.col("n_spans"))
        .select(F.col("id").alias("doc_id"), F.lit(1).alias("contaminated"))
    )
    # fingerprint groups are duplicate-text sets — tiny partitions, no
    # skew risk for the min-over-group window. Project to the narrow
    # ledger columns BEFORE the window exchange: ntok and the content
    # fingerprint are map-side functions of text, so the fingerprint
    # shuffle carries 4 small columns instead of the document bodies
    # (guide §2.3 — at 100 TB the text column IS the corpus).
    narrow = dirty.select(
        "doc_id",
        "source",
        token_count("text").alias("ntok"),
        content_fingerprint("text").alias("__fp"),
    )
    min_id = F.min("doc_id").over(Window.partitionBy("__fp"))
    pre = (
        narrow.withColumn("min_id", min_id)
        .join(nd, "doc_id", "left")
        .join(cont, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.when(is_eval, "eval")
            .when(F.col("ntok") < 5, "short")
            .when(F.col("doc_id") != F.col("min_id"), "exact_dup")
            .when(F.col("neardup") == 1, "near_dup")
            .when(F.col("contaminated") == 1, "contaminated")
            .alias("disp"),
        )
    )
    # pre is referenced TWICE (survivors -> split assignment, and the
    # final disposition join). Unpersisted, Spark executes the whole
    # upstream funnel — LSH pair generation AND the contamination
    # shingle join — once per reference (measured r10: 14.0 -> 10.4 s
    # at sf0.1 from this barrier alone; guide §5 persist-when-reused).
    # The frame is corpus-sized but 3 narrow columns (id, source,
    # disposition tag), the standard funnel-ledger materialization.
    pre = pre.persist()
    pre.count()
    survivors = pre.where(F.col("disp").isNull()).select("doc_id", "source")
    splits = stratified_split(survivors, "doc_id", "source").select(
        F.col("id").alias("doc_id"), F.col("split")
    )
    out = (
        pre.join(splits, "doc_id", "left")
        .select(
            F.col("doc_id").alias("id"),
            "source",
            F.coalesce("disp", "split").alias("disposition"),
        )
    )
    return hold(out, pre, *getattr(pairs, "_persisted_inputs", []))


# Candidate budget for the guarded funnel: C(64,2) ≈ 2k pairs per LSH
# bucket worst-case. On benign corpora buckets hold near-dup groups
# (occupancy ~2) and the cap never binds, so u68 ≡ u35 there; on the r6
# skew corpus (zipf vocab, 30%-hot keys) the unbudgeted funnel was the
# one real engine mover (3.5× — output-driven candidate growth), which
# this bounds by contract.
FUNNEL_BUCKET_CAP = 64


@register(
    "u68_capped_funnel",
    bench=True,
    oracle=lambda sf_dir: _funnel_oracle(max_bucket=FUNNEL_BUCKET_CAP),
    doc="u35's whole-corpus curation funnel with the near-dup stage's "
    "candidate budget made explicit (VERDICT r6 #4, the v09 pattern "
    "applied to the capstone pipeline): every MinHash-LSH bucket keeps "
    "only its FUNNEL_BUCKET_CAP lowest doc_ids before pair expansion, "
    "so worst-case candidate volume is buckets × C(cap, 2) — bounded by "
    "contract, not by corpus statistics. The cap compiles to "
    "WindowGroupLimit (map-side pre-truncation of hot buckets before "
    "the shuffle), and is deterministic (lowest-id survivors), so the "
    "DuckDB oracle replays it exactly with a rank CTE. Recall loss is "
    "confined to pairs whose BOTH members sort past the cap in every "
    "shared bucket; all other funnel stages are identical to u35.",
    tags=("llm-pipeline", "dedup", "split", "funnel", "scale-guard"),
)
def u68_capped_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _curation_funnel(spark, sf_dir, max_bucket=FUNNEL_BUCKET_CAP)


@register(
    "u44_xent_terciles",
    oracle=f"""
        WITH toksed AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
        tok AS (
          SELECT doc_id, toks[u.i] AS t
          FROM toksed, UNNEST(range(1, len(toks) + 1)) AS u(i)
        ),
        bg AS (
          SELECT doc_id, toks[u.i] AS w1, toks[u.i + 1] AS w2
          FROM toksed, UNNEST(range(1, len(toks))) AS u(i)
        ),
        c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
        c1 AS (
          SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1
        ),
        vocab AS (SELECT COUNT(DISTINCT t) AS v FROM tok),
        scored AS (
          SELECT b.doc_id,
                 ln(CAST(c2.c2 + 1 AS DOUBLE) / (c1.c1 + vocab.v)) AS lp
          FROM bg b JOIN c2 USING (w1, w2) JOIN c1 USING (w1), vocab
        ),
        x AS (
          SELECT doc_id AS id, ROUND(-AVG(lp), 6) AS xent
          FROM scored GROUP BY doc_id
        ),
        r AS (
          SELECT id, xent,
                 ROW_NUMBER() OVER (ORDER BY xent, id) - 1 AS rnk,
                 COUNT(*) OVER () AS n
          FROM x
        )
        SELECT id, xent,
               CASE WHEN rnk * 3 < n THEN 'head'
                    WHEN rnk * 3 < n * 2 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM r
    """,
    doc="CCNet head/middle/tail perplexity split (Wenzek et al. 2020 "
    "§4.3): u32's corpus-fitted bigram cross-entropy ranked by "
    "(xent, id) and cut into exact thirds — head is the fluent third "
    "a CCNet-style pipeline keeps. The global rank is computed "
    "hierarchically with the coarse bucket keyed on the SORT "
    "ATTRIBUTE itself (xent rounded to 2dp — monotone, so bucket "
    "order prefixes the total order; bucket count bounded by the xent "
    "range, not the corpus): cumulative bucket counts broadcast, "
    "within-bucket windows rank, no single-partition global sort. The "
    "oracle runs the plain global window — bit-equality with the "
    "decomposition is the correctness claim.",
    tags=("llm-pipeline", "text", "quality", "lm", "selection"),
)
def u44_xent_terciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.lm import xent_terciles

    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    return xent_terciles(docs, "doc_id", "text")


@register(
    "u51_cms_merge",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS token
          FROM documents
        ),
        seeded AS (
          SELECT doc_id, token, s,
                 {portable_hash64_sql("token", 0)} * (s + 1) % 1024 AS bucket
          FROM toks, UNNEST(range(0, 4)) AS u(s)
        ),
        cm_a AS (
          SELECT s, bucket, CAST(COUNT(*) AS BIGINT) AS n FROM seeded
          WHERE doc_id % 2 = 0 GROUP BY s, bucket
        ),
        cm_b AS (
          SELECT s, bucket, CAST(COUNT(*) AS BIGINT) AS n FROM seeded
          WHERE doc_id % 2 = 1 GROUP BY s, bucket
        ),
        merged AS (
          SELECT s, bucket, CAST(SUM(n) AS BIGINT) AS n FROM (
            SELECT * FROM cm_a UNION ALL SELECT * FROM cm_b
          ) GROUP BY s, bucket
        ),
        cm_full AS (
          SELECT s, bucket, CAST(COUNT(*) AS BIGINT) AS n
          FROM seeded GROUP BY s, bucket
        ),
        exact AS (
          SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_n
          FROM toks GROUP BY token
        ),
        top20 AS (
          SELECT token, exact_n FROM exact
          ORDER BY exact_n DESC, token LIMIT 20
        ),
        probes AS (
          SELECT t.token, t.exact_n, u.s,
                 {portable_hash64_sql("t.token", 0)} * (u.s + 1) % 1024 AS bucket
          FROM top20 t, UNNEST(range(0, 4)) AS u(s)
        )
        SELECT p.token, p.exact_n,
               MIN(m.n) AS merged_estimate,
               MIN(m.n) = MIN(f.n) AS merge_exact
        FROM probes p
        JOIN merged m ON m.s = p.s AND m.bucket = p.bucket
        JOIN cm_full f ON f.s = p.s AND f.bucket = p.bucket
        GROUP BY p.token, p.exact_n
    """,
    doc="Count-Min sketch MERGE identity (the mergeable-summaries "
    "property that makes sketches work distributed): the corpus is "
    "split into two halves, each half builds its own 4x1024 counter "
    "grid (w06's machinery), the grids merge by elementwise ADD, and "
    "the merged sketch's estimate for every exact-top-20 token is "
    "asserted IDENTICAL to the single-pass full-corpus sketch — "
    "integer counters make the identity exact, and it is precisely why "
    "per-executor / per-micro-batch sketches can be built independently "
    "and combined at 100 TB (or streamed: each foreachBatch adds its "
    "grid). Both grids, the merge, and the probes are exact SQL, so "
    "the distributed-ingest algebra itself is hash-verified.",
    tags=("sketch", "agg", "merge", "llm-pipeline"),
)
def u51_cms_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.functions.hashing import portable_hash64

    from gov_ec_pipeline_etl_spark.caching import hold

    toks = T(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("token")
    )
    seeds = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("s")
    h = portable_hash64(F.col("token"), 0)
    bucket = (h * (F.col("s") + 1) % 1024).alias("bucket")
    # the tokenize + 4-seed explode + md5-hash pass is the expensive
    # leaf and FIVE consumers need it (two half grids, the full grid,
    # the exact counts, the probes) — materialize it once (count
    # barrier per the hold() convention) instead of re-hashing the
    # corpus per consumer
    seeded = (
        toks.select("doc_id", "token", seeds)
        .select("doc_id", "token", "s", bucket)
        .persist()
    )
    seeded.count()

    def grid(side: DataFrame) -> DataFrame:
        return side.groupBy("s", "bucket").agg(F.count(F.lit(1)).alias("n"))

    cm_a = grid(seeded.where(F.col("doc_id") % 2 == 0))
    cm_b = grid(seeded.where(F.col("doc_id") % 2 == 1))
    merged = (
        cm_a.unionByName(cm_b)
        .groupBy("s", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    cm_full = grid(seeded)

    # seed 0 has exactly one row per original token occurrence, so the
    # exact counts come off the cached frame too — no second corpus scan
    exact = (
        seeded.where(F.col("s") == 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    top20 = exact.orderBy(F.col("exact_n").desc(), F.col("token")).limit(20)
    probes = top20.select("token", "exact_n", seeds).select(
        "token", "exact_n", "s", bucket
    )
    out = (
        probes.join(F.broadcast(merged), ["s", "bucket"])
        .join(
            F.broadcast(cm_full.withColumnRenamed("n", "n_full")),
            ["s", "bucket"],
        )
        .groupBy("token", "exact_n")
        .agg(
            F.min("n").alias("merged_estimate"),
            (F.min("n") == F.min("n_full")).alias("merge_exact"),
        )
    )
    return hold(out, seeded)


@register(
    "u64_sequence_packing",
    oracle=f"""
        WITH toksed AS (
          SELECT doc_id, len({TOKS_SQL}) AS n FROM documents
        ),
        c AS (
          SELECT doc_id, n,
                 SUM(n) OVER (
                   ORDER BY doc_id ROWS UNBOUNDED PRECEDING
                 ) AS cum
          FROM toksed
        )
        SELECT doc_id AS id,
               CAST(n AS BIGINT) AS n_tokens,
               CAST((cum - n) // 512 AS BIGINT) AS first_bin,
               CAST((cum - 1) // 512 AS BIGINT) AS last_bin,
               CAST((cum - 1) // 512 - (cum - n) // 512 + 1 AS BIGINT)
                 AS bins_spanned
        FROM c
    """,
    doc="Training-sequence packing (concat-and-chop at 512 tokens, "
    "GPT-style zero-waste packing): each document's first/last bin and "
    "boundary-crossing count in doc_id concatenation order — the "
    "inputs to boundary-aware attention masks and shard manifests. "
    "The global token cumsum is HIERARCHICAL (range partitions → "
    "local running sums → broadcast prefix offsets, the u28 "
    "decomposition), invariant to range boundaries and bit-equal to "
    "the oracle's single global window; all-integer div arithmetic, "
    "exact at any corpus size.",
    tags=("llm-pipeline", "packing", "training"),
)
def u64_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.packing import pack_sequences

    return pack_sequences(
        T(spark, sf_dir, "documents"), "doc_id", "text", capacity=512
    )
