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

from gov_ec_pipeline_etl_spark.operators.dedup_fuzzy import shingle_rows
from gov_ec_pipeline_etl_spark.plans.dedup_queries import (
    DIRTY_SQL,
    MUT_OFFSET,
    TOKS_SQL,
    _dirty_docs,
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
        WITH RECURSIVE corpus AS ({DIRTY_SQL}),
        toksed AS (SELECT doc_id, {TOKS_SQL} AS toks FROM corpus),
        sh AS (SELECT doc_id, {shingles_sql(5)} AS shingles FROM toksed),
        mh AS (
          SELECT doc_id,
                 list_min(list_transform(shingles, s -> md5(s))) AS min_sh
          FROM sh
        ),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM mh a JOIN mh b ON a.min_sh = b.min_sh AND a.doc_id < b.doc_id
        ),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b, id_a FROM pairs
        ),
        nodes AS (SELECT DISTINCT src AS id FROM edges),
        reach(src, dst) AS (
          SELECT id, id FROM nodes
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        ),
        clusters AS (
          SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
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
