"""Corpus-hygiene queries (u45, u46, u48): PII scrubbing, C4-style
cross-document line dedup, and bounded edit-distance verification.

The pre-training hygiene passes (Raffel et al. 2020 §2.2; CCNet/Dolma
PII masking) the engine runs on the `documents` table. Every query
carries a full DuckDB oracle: the PII planting is a deterministic
function of doc_id evaluated identically by both engines (the u12
planted-duplicate pattern), and all hashing is md5 over byte-identical
strings.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from gov_ec_pipeline_etl_spark.operators.hygiene import (
    EDIT_OFFSET,
    corpus_line_dedup,
    editdist_verify_pairs,
    pii_scrub,
)
from gov_ec_pipeline_etl_spark.plans.dedup_queries import NORM_SQL, TOKS_SQL
from gov_ec_pipeline_etl_spark.plans.registry import register
from gov_ec_pipeline_etl_spark.plans.util import T

# The planted-PII construction as DuckDB SQL — mirrors operators.hygiene
# .plant_pii term for term so both engines redact the same bytes.
_AUG_SQL = """
    text
    || CASE WHEN doc_id % 7 = 0 THEN
         ' contact user' || CAST(doc_id % 97 AS VARCHAR)
         || '@mail' || CAST(doc_id % 5 AS VARCHAR) || '.com'
       ELSE '' END
    || CASE WHEN doc_id % 11 = 0 THEN
         ' call ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
         || '-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       ELSE '' END
    || CASE WHEN doc_id % 13 = 0 THEN
         ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
         || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
         || '.' || CAST(doc_id % 250 AS VARCHAR)
       ELSE '' END
"""

PII_ORACLE = f"""
    WITH aug AS (SELECT doc_id, {_AUG_SQL} AS a FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(a, '[a-z0-9]+@[a-z0-9]+\\.com')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(a, '\\d{{3}}-\\d{{3}}-\\d{{4}}')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(a, '\\d+\\.\\d+\\.\\d+\\.\\d+')) AS BIGINT) AS n_ip,
           md5(regexp_replace(regexp_replace(regexp_replace(a,
               '[a-z0-9]+@[a-z0-9]+\\.com', '<EMAIL>', 'g'),
               '\\d{{3}}-\\d{{3}}-\\d{{4}}', '<PHONE>', 'g'),
               '\\d+\\.\\d+\\.\\d+\\.\\d+', '<IP>', 'g')) AS redacted_md5
    FROM aug
"""


@register(
    "u45_pii_scrub",
    oracle=PII_ORACLE,
    doc="PII detection + redaction (the CCNet/Dolma-style masking pass): "
    "emails, phone numbers, and IPv4 addresses are counted "
    "independently on the raw text, then redacted in a fixed order "
    "whose placeholders cannot re-match a later pattern; the md5 of "
    "the redacted text proves byte-identical masking cross-engine. "
    "The corpus is PII-free word salad, so positives are planted as a "
    "deterministic function of doc_id evaluated identically by both "
    "engines (the u12 planted-duplicate pattern) — clean docs assert "
    "the zero-false-positive side. Purely per-row regex expressions: "
    "zero shuffles, zero Python, embarrassingly parallel at 100 TB.",
    bench=True,
    tags=("text", "pii", "hygiene", "llm-pipeline"),
)
def u45_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.hygiene import plant_pii

    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.select("doc_id", plant_pii(docs).alias("text"))
    return pii_scrub(planted)


LINE_DEDUP_ORACLE = f"""
    WITH toksed AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    idx AS (
      SELECT doc_id, toks,
             unnest(range(0, CAST(CEIL(len(toks) / 8.0) AS BIGINT))) AS seg_idx
      FROM toksed
    ),
    segrows AS (
      SELECT doc_id, seg_idx,
             array_to_string(toks[seg_idx * 8 + 1 : seg_idx * 8 + 8], ' ') AS seg
      FROM idx
    ),
    stats AS (
      SELECT seg, COUNT(*) AS cnt,
             MIN({{'doc_id': doc_id, 'seg_idx': seg_idx}}) AS first
      FROM segrows GROUP BY seg
    ),
    j AS (
      SELECT s.doc_id, s.seg_idx, s.seg,
             (g.cnt < 3 OR (s.doc_id = g.first.doc_id
                            AND s.seg_idx = g.first.seg_idx)) AS keep
      FROM segrows s JOIN stats g USING (seg)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segs,
           CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
           md5(COALESCE(string_agg(seg, ' ' ORDER BY seg_idx)
                        FILTER (WHERE keep), '')) AS kept_md5
    FROM j GROUP BY doc_id
"""


@register(
    "u46_line_dedup",
    oracle=LINE_DEDUP_ORACLE,
    doc="C4-style cross-document line dedup (Raffel et al. 2020 §2.2, "
    "'remove all but one of any three-sentence span occurring more "
    "than once'): each document is segmented into fixed 8-token lines, "
    "every line is counted across the WHOLE corpus, and all "
    "occurrences of a line seen >= 3 times are dropped except the "
    "globally first (min (doc_id, seg_idx)). Output: per-doc segment / "
    "removed counts plus the md5 of the document rebuilt from its "
    "surviving lines in original order. Scale shape: one explode and "
    "two shuffles — a line-keyed aggregate (map-side combine absorbs "
    "hot boilerplate lines; min-struct beats a per-line row_number "
    "sort, so a line owned by 30 percent of the corpus is an aggregate "
    "cell, "
    "not a window straggler) and the doc_id reassembly.",
    bench=True,
    tags=("text", "dedup", "hygiene", "llm-pipeline"),
)
def u46_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_line_dedup(T(spark, sf_dir, "documents").select("doc_id", "text"))


EDITDIST_ORACLE = f"""
    WITH c AS (
      SELECT doc_id AS corpus_id,
             substr({NORM_SQL}, 1, 24) AS bkey,
             substr({NORM_SQL}, 1, 160) AS capped
      FROM documents
    ),
    vsrc AS (
      SELECT doc_id, {NORM_SQL} AS nrm FROM documents WHERE doc_id % 10 = 0
    ),
    v AS (
      SELECT doc_id + {EDIT_OFFSET} AS new_id,
             CASE WHEN len(nrm) > 3
                  THEN substr(nrm, 1, len(nrm) - 3) || 'qzj'
                  ELSE 'qzj' END AS vt
      FROM vsrc
    ),
    v2 AS (
      SELECT new_id, substr(vt, 1, 24) AS bkey, substr(vt, 1, 160) AS vcapped
      FROM v
    ),
    elig AS (SELECT bkey FROM c GROUP BY bkey HAVING COUNT(*) <= 50),
    pairs AS (
      SELECT v2.new_id, c.corpus_id,
             CAST(levenshtein(v2.vcapped, c.capped) AS BIGINT) AS lev
      FROM v2 JOIN elig USING (bkey) JOIN c USING (bkey)
    )
    SELECT new_id, corpus_id, lev, ROUND(1.0 - lev / 160.0, 6) AS sim
    FROM pairs WHERE lev <= 6
"""


@register(
    "u48_editdist_verify",
    oracle=EDITDIST_ORACLE,
    doc="Bounded edit-distance verification of blocked near-dup "
    "candidates (the exact-verify stage after LSH/blocking, RETSim "
    "shape): planted variants (every 10th doc, last 3 chars rewritten "
    "— the u12 planted-arrival pattern) are blocked against the corpus "
    "on a 24-char normalized-prefix key under d04's max_df<=50 cut (a "
    "hot prefix is excluded from candidate generation, bounding "
    "per-key fan-out), then verified with the built-in `levenshtein` "
    "over a 160-char window (constant DP cost per pair) keeping pairs "
    "within 6 edits. JVM-side throughout; the only shuffles are the "
    "key-count aggregate and the blocking join.",
    tags=("dedup", "hygiene", "editdist", "llm-pipeline"),
)
def u48_editdist_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    variants = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + EDIT_OFFSET).alias("doc_id"),
        F.when(
            F.length(norm) > 3,
            F.concat(
                F.substring(norm, F.lit(1), F.length(norm) - 3), F.lit("qzj")
            ),
        )
        .otherwise(F.lit("qzj"))
        .alias("text"),
    )
    return editdist_verify_pairs(docs, variants)


# ---------------------------------------------------------------------------
# u60: k-anonymity audit over quasi-identifiers
# ---------------------------------------------------------------------------

_KANON_K = 5

_KANON_ORACLE = f"""
    WITH qi AS (
      SELECT lang, source, (n_chars // 500) AS len_band
      FROM documents
    ),
    groups AS (
      SELECT lang, source, len_band, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM qi GROUP BY 1, 2, 3
    )
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN n_docs < {_KANON_K} THEN 1 ELSE 0 END)
                AS BIGINT) AS groups_lt_k,
           CAST(SUM(CASE WHEN n_docs < {_KANON_K} THEN n_docs ELSE 0 END)
                AS BIGINT) AS docs_at_risk,
           CAST(MIN(n_docs) AS BIGINT) AS min_group
    FROM groups GROUP BY lang, source
"""


@register(
    "u60_k_anonymity",
    oracle=_KANON_ORACLE,
    doc="k-anonymity audit (Sweeney 2002) over the quasi-identifier "
    "tuple (lang, source, 500-char length band): a document whose QI "
    "group holds fewer than k=5 members is re-identifiable by joining "
    "on attributes that survive PII redaction — the privacy risk u45's "
    "regex scrub cannot see. Emits per-(lang, source) group counts, "
    "sub-k group counts, at-risk document mass, and the smallest group "
    "(the generalization signal: coarsen the attribute whose marginal "
    "removes the most sub-k groups). Scale shape: ONE aggregation over "
    "a three-column projection, then a grouping of group rows — "
    "output is attribute-cardinality-scale, never data-scale; integer "
    "arithmetic end to end.",
    tags=("privacy", "hygiene", "k-anonymity", "llm-pipeline"),
)
def u60_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    qi = T(spark, sf_dir, "documents").select(
        "lang", "source", F.expr("n_chars div 500").alias("len_band")
    )
    groups = qi.groupBy("lang", "source", "len_band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    lt_k = F.when(F.col("n_docs") < _KANON_K, 1).otherwise(0)
    at_risk = F.when(F.col("n_docs") < _KANON_K, F.col("n_docs")).otherwise(0)
    return groups.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(lt_k).cast("bigint").alias("groups_lt_k"),
        F.sum(at_risk).cast("bigint").alias("docs_at_risk"),
        F.min("n_docs").cast("bigint").alias("min_group"),
    )


# ---------------------------------------------------------------------------
# u61: keyed pseudonymization with referential-integrity proof
# ---------------------------------------------------------------------------

_PSEUDO_SEED = 61


def _u61_oracle(sf_dir: str) -> str:
    from gov_ec_pipeline_etl_spark.functions.hashing import portable_hash64_sql

    pc = portable_hash64_sql("CAST(c_custkey AS VARCHAR)", seed=_PSEUDO_SEED)
    po = portable_hash64_sql("CAST(o_custkey AS VARCHAR)", seed=_PSEUDO_SEED)
    return f"""
    WITH c AS (SELECT c_custkey, {pc} AS p FROM customer),
    o AS (SELECT o_custkey, {po} AS p FROM orders),
    pre AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    post AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n
      FROM o JOIN c USING (p)
    )
    SELECT CAST((SELECT COUNT(DISTINCT c_custkey) FROM c) AS BIGINT)
             AS n_ids,
           CAST((SELECT COUNT(DISTINCT p) FROM c) AS BIGINT) AS n_pseudo,
           (SELECT n FROM pre) AS join_rows_pre,
           (SELECT n FROM post) AS join_rows_post,
           (SELECT n FROM pre) = (SELECT n FROM post) AS joins_preserved
    """


@register(
    "u61_pseudonymize_integrity",
    oracle=_u61_oracle,
    doc="Keyed pseudonymization with a referential-integrity proof: "
    "customer ids on BOTH sides of the orders⋈customer relationship "
    "are replaced by the seeded portable hash (deterministic, so "
    "repeated pipeline runs assign stable pseudonyms without a mapping "
    "table to protect), then the audit asserts (a) no collisions "
    "(distinct pseudonyms == distinct ids) and (b) the join mass is "
    "byte-identical pre/post — the property that lets downstream "
    "analytics run on de-identified data. The GDPR-pipeline complement "
    "of u45 (content PII) and u60 (quasi-identifier risk). Scale "
    "shape: hashes are projections, the audit is two key joins + "
    "distinct counts; at 100 TB the keyed-hash form is exactly how "
    "production pseudonymization avoids a giant lookup table.",
    tags=("privacy", "hygiene", "pseudonymization", "llm-pipeline"),
)
def u61_pseudonymize_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.functions.hashing import portable_hash64

    cust = T(spark, sf_dir, "customer").select(
        "c_custkey",
        portable_hash64(
            F.col("c_custkey").cast("string"), seed=_PSEUDO_SEED
        ).alias("p"),
    )
    orders = T(spark, sf_dir, "orders").select(
        "o_custkey",
        portable_hash64(
            F.col("o_custkey").cast("string"), seed=_PSEUDO_SEED
        ).alias("p"),
    )
    # fully declarative: the three audit legs are 1-row aggregates
    # cross-joined broadcast — no action at plan-construction time
    # (the s02 footer-sizing lesson: enumeration must not run jobs)
    pre = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .agg(F.count(F.lit(1)).cast("bigint").alias("join_rows_pre"))
    )
    post = (
        orders.select("p")
        .join(cust.select("p"), "p")
        .agg(F.count(F.lit(1)).cast("bigint").alias("join_rows_post"))
    )
    stats = cust.agg(
        F.count_distinct("c_custkey").cast("bigint").alias("n_ids"),
        F.count_distinct("p").cast("bigint").alias("n_pseudo"),
    )
    return (
        stats.crossJoin(F.broadcast(pre))
        .crossJoin(F.broadcast(post))
        .withColumn(
            "joins_preserved",
            F.col("join_rows_pre") == F.col("join_rows_post"),
        )
    )
