"""Text-analysis query surface over ``documents`` (SURVEY.md north-star:
language-ID, quality scoring, token counting, fingerprinting).

Pure map-stage expressions — at 100 TB these run as a single scan with
no shuffle (aggregating variants shuffle once on the group key).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from gov_ec_pipeline_etl_spark.operators.textstats import (
    LANG_STOPWORDS,
    bpe_ish_token_count,
    content_fingerprint,
    lang_id,
    quality_score,
    token_count,
    winnowing_sketch,
)
from gov_ec_pipeline_etl_spark.plans.registry import register
from gov_ec_pipeline_etl_spark.plans.util import T

_TOKS = "string_split(trim(text), ' ')"


def _sw_list(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])


@register(
    "t01_token_counts",
    oracle="""
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
               len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe_ish
        FROM documents
    """,
    doc="Whitespace token count + BPE-ish (alpha runs / digit runs / "
    "single punctuation) count per document.",
    bench=True,
    tags=("text", "llm-pipeline"),
)
def t01_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T(spark, sf_dir, "documents").select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        bpe_ish_token_count("text").alias("n_bpe_ish"),
    )


@register(
    "t02_quality_score",
    oracle=f"""
        WITH toksed AS (
          SELECT doc_id, text, {_TOKS} AS toks FROM documents
        ), feats AS (
          SELECT doc_id,
            length(text) AS n,
            CASE WHEN len(toks) > 0
                 THEN CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks)
                 ELSE 0.0 END AS awl,
            CASE WHEN length(text) > 0
                 THEN CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
                      / length(text)
                 ELSE 0.0 END AS punct,
            CASE WHEN len(toks) > 0
                 THEN CAST(len(list_filter(toks, t -> lower(t) IN ({_sw_list("en")}))) AS DOUBLE)
                      / len(toks)
                 ELSE 0.0 END AS stop_ratio
          FROM toksed
        )
        SELECT doc_id, ROUND(
            0.25 * (CASE WHEN n BETWEEN 50 AND 10000 THEN 1.0 ELSE 0.0 END)
          + 0.25 * (CASE WHEN awl >= 2.0 AND awl <= 12.0 THEN 1.0 ELSE 0.0 END)
          + 0.25 * (1.0 - least(punct, 1.0))
          + 0.25 * least(1.0, stop_ratio * 5.0), 6) AS quality
        FROM feats
    """,
    doc="Documented heuristic quality score (length band, word-length "
    "band, punctuation ratio, stopword presence) — formula mirrored "
    "term-for-term in the oracle.",
    tags=("text", "quality", "llm-pipeline"),
)
def t02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T(spark, sf_dir, "documents").select(
        "doc_id", F.round(quality_score("text"), 6).alias("quality")
    )


@register(
    "t03_lang_id",
    oracle=f"""
        WITH hits AS (
          SELECT doc_id, lang AS lang_true, toks,
            len(list_filter(toks, t -> lower(t) IN ({_sw_list("de")}))) AS h_de,
            len(list_filter(toks, t -> lower(t) IN ({_sw_list("en")}))) AS h_en,
            len(list_filter(toks, t -> lower(t) IN ({_sw_list("es")}))) AS h_es,
            len(list_filter(toks, t -> lower(t) IN ({_sw_list("fr")}))) AS h_fr
          FROM (SELECT doc_id, lang, {_TOKS} AS toks FROM documents)
        )
        SELECT lang_pred, COUNT(*) AS n_docs FROM (
          SELECT CASE
            WHEN greatest(h_de, h_en, h_es, h_fr) < 1 THEN 'und'
            WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
            WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
            WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
            ELSE 'fr' END AS lang_pred
          FROM hits
        ) GROUP BY lang_pred
    """,
    doc="Stopword-hit language ID (argmax with deterministic code-order "
    "tie-break, 'und' below min hits), aggregated to predicted-language "
    "counts.",
    tags=("text", "lang-id", "llm-pipeline"),
)
def t03_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "documents")
        .select(lang_id("text").alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "t04_fingerprint",
    oracle="""
        WITH toksed AS (
          SELECT doc_id,
                 string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
          FROM documents
        ), sh AS (
          SELECT doc_id,
                 CASE WHEN len(toks) >= 5
                   THEN list_distinct(list_transform(range(1, len(toks) - 3),
                          i -> array_to_string(toks[i:i + 4], ' ')))
                   ELSE [array_to_string(toks, ' ')]
                 END AS shingles
          FROM toksed
        )
        SELECT doc_id,
               md5(array_to_string(toks, ' ')) AS content_fp,
               array_to_string(list_sort(list_transform(shingles, s -> md5(s)))[1:8], ',')
                 AS sketch
        FROM sh JOIN toksed USING (doc_id)
    """,
    doc="Whole-content md5 fingerprint + winnowing-style bottom-8 sketch "
    "over 5-word shingles (both order-insensitive, cross-engine exact).",
    tags=("text", "fingerprint", "llm-pipeline"),
)
def t04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T(spark, sf_dir, "documents").select(
        "doc_id",
        content_fingerprint("text").alias("content_fp"),
        F.concat_ws(",", winnowing_sketch("text", k=5, sketch_size=8)).alias(
            "sketch"
        ),
    )


@register(
    "t05_text_search",
    oracle="""
        SELECT
          SUM(CASE WHEN text LIKE '%table%' THEN 1 ELSE 0 END) AS n_like,
          SUM(CASE WHEN text LIKE 'key%' THEN 1 ELSE 0 END) AS n_prefix,
          SUM(CASE WHEN regexp_matches(text, 'spark\\s+\\w+\\s+window') THEN 1 ELSE 0 END) AS n_regex,
          SUM(CASE WHEN contains(text, 'merge batch') THEN 1 ELSE 0 END) AS n_contains
        FROM documents
    """,
    doc="Text-search predicate surface: LIKE infix/prefix, regexp match, "
    "substring containment — all pushable scan-side predicates.",
    tags=("text", "search"),
)
def t05_text_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return d.agg(
        F.sum(F.when(F.col("text").like("%table%"), 1).otherwise(0)).alias("n_like"),
        F.sum(F.when(F.col("text").like("key%"), 1).otherwise(0)).alias("n_prefix"),
        F.sum(
            F.when(F.col("text").rlike(r"spark\s+\w+\s+window"), 1).otherwise(0)
        ).alias("n_regex"),
        F.sum(
            F.when(F.col("text").contains("merge batch"), 1).otherwise(0)
        ).alias("n_contains"),
    )
