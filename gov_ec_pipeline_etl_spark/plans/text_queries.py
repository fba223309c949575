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

# \s+ split to mirror the Spark side's tokens() exactly — a single-space
# split silently diverges on runs of whitespace/tabs (ADVICE round 1);
# empty text guards to an empty list just like tokens() does.
_TOKS = (
    "CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) "
    "ELSE regexp_split_to_array(trim(text), '\\s+') END"
)


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
        token_count("text").cast("bigint").alias("n_tokens"),
        bpe_ish_token_count("text").cast("bigint").alias("n_bpe_ish"),
    )


# t02's full oracle, exported so downstream curation queries (u65's
# per-source quota cap) can rank by the IDENTICAL scored value without
# restating the formula — any drift between the two sides would break
# both hash gates at once instead of silently diverging.
QUALITY_SQL = f"""
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
"""


@register(
    "t02_quality_score",
    oracle=QUALITY_SQL,
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
          CAST(SUM(CASE WHEN text LIKE '%table%' THEN 1 ELSE 0 END) AS BIGINT) AS n_like,
          CAST(SUM(CASE WHEN text LIKE 'key%' THEN 1 ELSE 0 END) AS BIGINT) AS n_prefix,
          CAST(SUM(CASE WHEN regexp_matches(text, 'spark\\s+\\w+\\s+window') THEN 1 ELSE 0 END) AS BIGINT) AS n_regex,
          CAST(SUM(CASE WHEN contains(text, 'merge batch') THEN 1 ELSE 0 END) AS BIGINT) AS n_contains
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


@register(
    "t06_vocab_stats",
    oracle="""
        SELECT tok, COUNT(*) AS n FROM (
          SELECT unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
          FROM documents
        )
        GROUP BY tok
        ORDER BY n DESC, tok
        LIMIT 20
    """,
    doc="Corpus vocabulary statistics: token frequency top-20 "
    "(explode → count, deterministic tie-break). The building block for "
    "stopword discovery / vocabulary pruning over an LLM corpus.",
    tags=("text", "vocab", "llm-pipeline"),
)
def t06_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    return (
        d.select(F.explode(F.split(norm, " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(20)
    )


@register(
    "t07_scrub",
    oracle="""
        SELECT doc_id,
               md5(regexp_replace(regexp_replace(source, '[0-9]+', '<num>', 'g'),
                                  'src', '<source>', 'g')) AS scrubbed_fp,
               length(regexp_replace(source, '[0-9]+', '<num>', 'g')) AS scrubbed_len
        FROM documents
    """,
    doc="Text scrubbing (PII-style redaction shape): digit runs and "
    "source markers replaced by placeholder tokens — chained "
    "regexp_replace, pure map stage; fingerprinted so the oracle "
    "compares full scrubbed strings.",
    tags=("text", "scrub", "llm-pipeline"),
)
def t07_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace("source", r"[0-9]+", "<num>"), "src", "<source>"
    )
    return d.select(
        "doc_id",
        F.md5(scrubbed).alias("scrubbed_fp"),
        F.length(
            F.regexp_replace("source", r"[0-9]+", "<num>")
        ).alias("scrubbed_len"),
    )


@register(
    "t08_repetition_stats",
    oracle="""
        WITH toks AS (
          SELECT doc_id,
                 unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
          FROM documents
        ),
        counts AS (
          SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok
        )
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS distinct_ratio,
               ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_token_ratio
        FROM counts GROUP BY doc_id
    """,
    doc="Doc-internal repetition signals (distinct-token ratio, "
    "top-token dominance) — the standard repetition filter for LLM "
    "training corpora; two aggregations, no per-doc Python.",
    tags=("text", "quality", "repetition", "llm-pipeline"),
)
def t08_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    counts = (
        d.select("doc_id", F.explode(F.split(norm, " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.round(F.count(F.lit(1)) / F.sum("c"), 6).alias("distinct_ratio"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_token_ratio"),
    )


@register(
    "t09_length_bands_per_lang",
    oracle="""
        WITH med AS (
          SELECT lang,
                 percentile_cont(0.5) WITHIN GROUP (ORDER BY n_chars) AS med_len
          FROM documents GROUP BY lang
        )
        SELECT d.lang, band, COUNT(*) AS n_docs FROM (
          SELECT d.lang,
                 CASE WHEN d.n_chars < 0.5 * m.med_len THEN 'short'
                      WHEN d.n_chars > 2.0 * m.med_len THEN 'long'
                      ELSE 'mid' END AS band,
                 d.doc_id
          FROM documents d JOIN med m ON d.lang = m.lang
        ) d GROUP BY d.lang, band
    """,
    doc="Corpus-curation shape: per-language length median (broadcast "
    "back), band every document relative to ITS language's median — the "
    "standard relative-length filter for multilingual training data.",
    tags=("text", "quality", "curation", "llm-pipeline"),
)
def t09_length_bands_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    med = d.groupBy("lang").agg(
        F.percentile("n_chars", 0.5).alias("med_len")
    )
    banded = d.join(F.broadcast(med), "lang").select(
        "lang",
        F.when(F.col("n_chars") < 0.5 * F.col("med_len"), "short")
        .when(F.col("n_chars") > 2.0 * F.col("med_len"), "long")
        .otherwise("mid")
        .alias("band"),
    )
    return banded.groupBy("lang", "band").agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "t10_tfidf_top_terms",
    oracle="""
        WITH toks AS (
          SELECT doc_id,
                 unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
          FROM documents
        ),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
        df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.tok,
                 ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
          FROM tf JOIN df USING (tok) CROSS JOIN n
        )
        SELECT doc_id, tok, tfidf FROM (
          SELECT doc_id, tok, tfidf,
                 ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, tok
                 ) AS rnk
          FROM scored
        ) WHERE rnk <= 3
    """,
    doc="TF-IDF top-3 terms per document: term frequencies + document "
    "frequencies (two aggregations over the exploded tokens) joined and "
    "window-ranked — the keyword-extraction building block; IDF join is "
    "broadcastable (vocabulary ≪ corpus).",
    tags=("text", "tfidf", "llm-pipeline"),
)
def t10_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    toks = d.select("doc_id", F.explode(F.split(norm, " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()
    scored = tf.join(F.broadcast(df_), "tok").select(
        "doc_id",
        "tok",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "tok")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "tok", "tfidf")
    )


@register(
    "t11_hash_sample",
    oracle="""
        SELECT doc_id, lang FROM documents
        WHERE CAST('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
              % 4294967296 < 1288490188  -- 0.3 * 2^32
    """,
    doc="Deterministic hash sampling (30% of documents by key hash): "
    "membership is a pure function of the key via the portable hash, so "
    "the SAME rows are selected in Spark and DuckDB — the reproducible "
    "train/eval-split primitive (seeded sampleBy is the engine-local "
    "statistical variant, unit-tested).",
    tags=("sampling", "llm-pipeline"),
)
def t11_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.sampling import (
        deterministic_hash_sample,
    )

    d = T(spark, sf_dir, "documents").select("doc_id", "lang")
    return deterministic_hash_sample(d, "doc_id", 0.3, seed=0)


@register(
    "t12_sequence_packing",
    oracle="""
        WITH sized AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tok
          FROM documents
        ),
        packed AS (
          SELECT doc_id, n_tok,
                 CAST(floor(
                   (SUM(n_tok) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
                   / 512.0) AS BIGINT) AS pack_id
          FROM sized
        )
        SELECT pack_id, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens
        FROM packed GROUP BY pack_id
    """,
    doc="Sequence packing for training batches: documents in a "
    "deterministic order split into ~512-token packs via a running-sum "
    "window (pack = floor(tokens-before / capacity)) — the distributed "
    "formulation of greedy sequential packing; one window pass, no "
    "driver loop.",
    tags=("text", "packing", "llm-pipeline"),
)
def t12_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from gov_ec_pipeline_etl_spark.operators.textstats import token_count

    d = T(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").cast("bigint").alias("n_tok")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    packed = d.withColumn(
        "pack_id",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / 512.0).cast("bigint"),
    )
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
    )


@register(
    "u21_source_token_drift",
    oracle="""
        WITH toks AS (
          SELECT source,
                 unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
          FROM documents
        ),
        per AS (SELECT source, tok, COUNT(*) AS n_st FROM toks GROUP BY source, tok),
        stot AS (SELECT source, SUM(n_st) AS n_s FROM per GROUP BY source),
        ctot AS (SELECT tok, SUM(n_st) AS n_t FROM per GROUP BY tok),
        tot AS (SELECT SUM(n_st) AS n_tot FROM per),
        ratios AS (
          SELECT p.source, p.tok,
                 (CAST(p.n_st AS DOUBLE) / s.n_s)
                 / (CAST(c.n_t AS DOUBLE) / t.n_tot) AS ratio
          FROM per p
          JOIN stot s USING (source)
          JOIN ctot c USING (tok)
          CROSS JOIN tot t
        )
        SELECT source, tok, CAST(rnk AS BIGINT) AS rnk,
               ROUND(ratio, 6) AS ratio
        FROM (
          SELECT source, tok, ratio,
                 ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY ratio DESC, tok
                 ) AS rnk
          FROM ratios
        ) WHERE rnk <= 3
    """,
    doc="Per-source vocabulary drift: the 3 most over-represented tokens "
    "per source, scored by (in-source frequency) / (corpus frequency). "
    "The mixture-monitoring primitive for a multi-source training "
    "corpus — detects a source whose token distribution is drifting "
    "from the blend before it skews the mix. One explode + token-level "
    "aggregation; the per-source and corpus marginals are tiny "
    "broadcast sides (vocabulary-sized, not corpus-sized), so the only "
    "data-scale shuffle is the (source, token) count.",
    tags=("text", "quality", "monitoring", "llm-pipeline"),
)
def u21_source_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    toks = d.select("source", F.explode(F.split(norm, " ")).alias("tok"))
    per = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("n_st"))
    stot = per.groupBy("source").agg(F.sum("n_st").alias("n_s"))
    ctot = per.groupBy("tok").agg(F.sum("n_st").alias("n_t"))
    tot = stot.agg(F.sum("n_s").alias("n_tot"))
    ratios = (
        per.join(F.broadcast(stot), "source")
        .join(F.broadcast(ctot), "tok")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "ratio",
            (F.col("n_st") / F.col("n_s")) / (F.col("n_t") / F.col("n_tot")),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("ratio").desc(), "tok")
    return (
        ratios.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select("source", "tok", "rnk", F.round("ratio", 6).alias("ratio"))
    )


# BM25 weight for one matched term, as ONE shared SQL expression shape
# (k1=1.2, b=0.75 inlined; 1-b = 0.25) — both engines evaluate the same
# tree, so per-term weights differ only by the last-ulp of ln(), which
# the round(…,6) on the summed score absorbs.
_BM25_W = (
    "ln(1.0 + ({n} - df + 0.5) / (df + 0.5))"
    " * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / {avgdl})))"
)


@register(
    "u27_bm25_topk",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id,
                 string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS l
          FROM documents
        ),
        term_rows AS (SELECT doc_id, unnest(l) AS tok FROM toks),
        dl AS (SELECT doc_id, CAST(len(l) AS DOUBLE) AS dl FROM toks),
        stats AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM dl
        ),
        tf AS (
          SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf
          FROM term_rows GROUP BY doc_id, tok
        ),
        df AS (
          SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY tok
        ),
        qterms AS (
          SELECT DISTINCT doc_id AS query_id, unnest(l[1:8]) AS tok
          FROM toks WHERE doc_id < 5
        ),
        weights AS (
          SELECT q.query_id, t.doc_id, q.tok,
                 {_BM25_W.format(n='s.n', avgdl='s.avgdl')} AS w
          FROM qterms q
          JOIN tf t ON t.tok = q.tok
          JOIN df f ON f.tok = t.tok
          JOIN dl ON dl.doc_id = t.doc_id
          CROSS JOIN stats s
        ),
        scores AS (
          SELECT query_id, doc_id,
                 ROUND(list_sum(list(w ORDER BY tok)), 6) AS score_r
          FROM weights GROUP BY query_id, doc_id
        )
        SELECT query_id, doc_id, rnk, score_r FROM (
          SELECT query_id, doc_id, score_r,
                 ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY score_r DESC, doc_id
                 ) AS rnk
          FROM scores
        ) WHERE rnk <= 10
    """,
    doc="BM25 lexical retrieval (k1=1.2, b=0.75): 5 query documents "
    "(their first 8 tokens) ranked against the whole corpus — the "
    "standard sparse scorer that pairs with the dense ANN tier for "
    "hybrid retrieval. tf/df/dl are the inverted-index statistics the "
    "n-gram machinery already materializes at scale; query terms are "
    "broadcast, so the only data-scale shuffles are the tf/df "
    "aggregates themselves. Per-term weights share one SQL expression "
    "shape across engines; scores are summed in canonical term order "
    "and ROUNDED BEFORE RANKING, so the cross-engine rank is exact "
    "(tie-break by doc_id).",
    tags=("text", "retrieval", "llm-pipeline"),
)
def u27_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    scores = _bm25_scores(spark, sf_dir)
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("score_r").desc(), F.col("doc_id")
    )
    return (
        scores.withColumn("rnk", F.row_number().over(w_rank))
        .where(F.col("rnk") <= 10)
        .select("query_id", "doc_id", "rnk", "score_r")
    )


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 scores for the 5 standard query docs against the corpus —
    (query_id, doc_id, score_r), rounded BEFORE any ranking (u27's
    cross-engine rank discipline). Shared by u27 (lexical top-k) and
    u47 (hybrid RRF fusion)."""
    d = T(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    toks = d.select("doc_id", F.split(norm, " ").alias("l"))
    term_rows = toks.select("doc_id", F.explode("l").alias("tok"))
    dl = toks.select("doc_id", F.size("l").cast("double").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    tf = term_rows.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("df"))
    qterms = (
        toks.where(F.col("doc_id") < 5)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice("l", 1, 8)).alias("tok"),
        )
        .distinct()
    )
    weights = (
        tf.join(F.broadcast(qterms), "tok")
        .join(df, "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id", "doc_id", "tok",
            F.expr(_BM25_W.format(n="n", avgdl="avgdl")).alias("w"),
        )
    )
    # canonical-order fold (ORDER BY tok) — same cross-engine ulp
    # discipline as the ADC sum; query term sets are ≤8 elements
    return weights.groupBy("query_id", "doc_id").agg(
        F.round(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tok", "w"))),
                    lambda x: x.w,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            6,
        ).alias("score_r")
    )


# u47's oracle: the full BM25 replay (u27's CTE chain with the query
# doc itself excluded) fused with s01's exact-cosine replay via
# reciprocal-rank fusion over the two top-20 lists.
_RRF_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS l
      FROM documents
    ),
    term_rows AS (SELECT doc_id, unnest(l) AS tok FROM toks),
    dl AS (SELECT doc_id, CAST(len(l) AS DOUBLE) AS dl FROM toks),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM dl
    ),
    tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM term_rows GROUP BY doc_id, tok
    ),
    df AS (
      SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY tok
    ),
    qterms AS (
      SELECT DISTINCT doc_id AS query_id, unnest(l[1:8]) AS tok
      FROM toks WHERE doc_id < 5
    ),
    weights AS (
      SELECT q.query_id, t.doc_id, q.tok,
             {_BM25_W.format(n='s.n', avgdl='s.avgdl')} AS w
      FROM qterms q
      JOIN tf t ON t.tok = q.tok AND t.doc_id <> q.query_id
      JOIN df f ON f.tok = t.tok
      JOIN dl ON dl.doc_id = t.doc_id
      CROSS JOIN stats s
    ),
    scores AS (
      SELECT query_id, doc_id,
             ROUND(list_sum(list(w ORDER BY tok)), 6) AS score_r
      FROM weights GROUP BY query_id, doc_id
    ),
    lex20 AS (
      SELECT query_id, doc_id, lex_rnk FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (
                 PARTITION BY query_id ORDER BY score_r DESC, doc_id
               ) AS lex_rnk
        FROM scores
      ) WHERE lex_rnk <= 20
    ),
    vecs AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb_d
      FROM embeddings
    ),
    cos AS (
      SELECT b.vec_id AS query_id, a.vec_id AS doc_id,
             list_dot_product(a.emb_d, b.emb_d)
             / (sqrt(list_dot_product(a.emb_d, a.emb_d))
                * sqrt(list_dot_product(b.emb_d, b.emb_d))) AS cos
      FROM vecs a, vecs b
      WHERE b.vec_id < 5 AND a.vec_id <> b.vec_id
    ),
    den20 AS (
      SELECT query_id, doc_id, den_rnk FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (
                 PARTITION BY query_id ORDER BY cos DESC, doc_id
               ) AS den_rnk
        FROM cos
      ) WHERE den_rnk <= 20
    ),
    fused AS (
      SELECT COALESCE(l.query_id, d.query_id) AS query_id,
             COALESCE(l.doc_id, d.doc_id) AS doc_id,
             ROUND(COALESCE(1.0 / (60 + l.lex_rnk), 0)
                   + COALESCE(1.0 / (60 + d.den_rnk), 0), 6) AS rrf
      FROM lex20 l
      FULL OUTER JOIN den20 d
        ON l.query_id = d.query_id AND l.doc_id = d.doc_id
    )
    SELECT query_id, doc_id, CAST(rnk AS BIGINT) AS rnk, rrf FROM (
      SELECT query_id, doc_id, rrf,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY rrf DESC, doc_id
             ) AS rnk
      FROM fused
    ) WHERE rnk <= 10
"""


@register(
    "u47_rrf_hybrid",
    oracle=_RRF_ORACLE,
    doc="Hybrid retrieval via reciprocal-rank fusion (Cormack et al. "
    "2009, the standard sparse+dense fusion): for the 5 query docs, "
    "BM25 (u27's scorer, self excluded) and exact embedding cosine "
    "(s01's kernel, doc_id aligns with vec_id) each produce a top-20 "
    "list; RRF(k=60) = sum of 1/(60+rank) over the lists a doc appears "
    "in, fused by a full outer join and re-ranked to a top-10. Both "
    "rank inputs are integers, so the fused score is exact "
    "cross-engine (rounded to 6dp before ranking, ties by doc_id). "
    "Scale shape: the lexical side is u27's inverted-index aggregates; "
    "the dense side broadcasts 5 query vectors over one corpus scan; "
    "fusion joins two k-bounded lists — driver-scale, not data-scale.",
    tags=("text", "retrieval", "similarity", "hybrid", "llm-pipeline"),
)
def u47_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from gov_ec_pipeline_etl_spark.operators.similarity import cosine_topk
    from gov_ec_pipeline_etl_spark.plans.util import T as _T

    lex_scores = _bm25_scores(spark, sf_dir).where(
        F.col("doc_id") != F.col("query_id")
    )
    w_lex = Window.partitionBy("query_id").orderBy(
        F.col("score_r").desc(), F.col("doc_id")
    )
    lex20 = (
        lex_scores.withColumn("lex_rnk", F.row_number().over(w_lex))
        .where(F.col("lex_rnk") <= 20)
        .select("query_id", "doc_id", "lex_rnk")
    )
    emb = _T(spark, sf_dir, "embeddings")
    den20 = cosine_topk(emb.where(F.col("vec_id") < 5), emb, k=20).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), F.col("rnk").alias("den_rnk")
    )
    fused = lex20.join(den20, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        F.round(
            F.coalesce(F.lit(1.0) / (F.col("lex_rnk") + 60), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.col("den_rnk") + 60), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    w_rrf = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.withColumn("rnk", F.row_number().over(w_rrf).cast("bigint"))
        .where(F.col("rnk") <= 10)
        .select("query_id", "doc_id", "rnk", "rrf")
    )


@register(
    "u52_token_entropy",
    oracle="""
        WITH toks AS (
          SELECT doc_id,
                 unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
          FROM documents
        ),
        counts AS (
          SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS c
          FROM toks GROUP BY doc_id, tok
        )
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_toks,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               ROUND(ln(SUM(c)) - SUM(c * ln(c)) / SUM(c), 6) AS ent_r
        FROM counts GROUP BY doc_id
    """,
    doc="Per-document Shannon entropy of the token distribution "
    "(nats), via H = ln(n) − Σ c·ln(c) / n — the lexical-diversity "
    "quality signal (low entropy = repetitive boilerplate, the same "
    "failure Gopher's repetition rules catch from the other side; "
    "u42's correlation matrix is where such signals get audited for "
    "redundancy). Same cross-engine float discipline as u32's "
    "cross-entropy: identical ln() inputs, sum-order ulp absorbed by "
    "the 6dp round. One explode + one (doc, token) aggregate + one "
    "doc aggregate riding the same doc-keyed partitioning.",
    tags=("text", "quality", "entropy", "llm-pipeline"),
)
def u52_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    toks = d.select("doc_id", F.explode(F.split(norm, " ")).alias("tok"))
    counts = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    return counts.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_toks"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(
            F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c"), 6
        ).alias("ent_r"),
    )


@register(
    "u53_source_kl",
    oracle="""
        WITH toks AS (
          SELECT source,
                 unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
          FROM documents
        ),
        per AS (SELECT source, tok, CAST(COUNT(*) AS DOUBLE) AS c
                FROM toks GROUP BY source, tok),
        vocab AS (SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v FROM toks),
        tot AS (SELECT source, SUM(c) AS n FROM per GROUP BY source),
        -- add-one smoothing puts every (source, token) on common
        -- support: p = (c+1)/(n+V), with c = 0 for absent tokens
        grid AS (
          SELECT a.source AS src_p, b.source AS src_q, per.tok,
                 (COALESCE(pa.c, 0) + 1) / (a.n + v.v) AS p,
                 (COALESCE(pb.c, 0) + 1) / (b.n + v.v) AS q
          FROM (SELECT DISTINCT tok FROM per) per
          CROSS JOIN tot a
          CROSS JOIN tot b
          CROSS JOIN vocab v
          LEFT JOIN per pa ON pa.source = a.source AND pa.tok = per.tok
          LEFT JOIN per pb ON pb.source = b.source AND pb.tok = per.tok
          WHERE a.source < b.source
        )
        SELECT src_p, src_q,
               ROUND(SUM(p * ln(p / q)), 6) AS kl_pq_r,
               ROUND(SUM(q * ln(q / p)), 6) AS kl_qp_r
        FROM grid GROUP BY src_p, src_q
    """,
    doc="Pairwise KL divergence between source token distributions "
    "(add-one smoothed onto the common vocabulary): the mixture-shift "
    "monitor that complements u21's per-token drift ratios and u42's "
    "signal correlations — a source whose distribution diverges from "
    "the blend shows up as a growing KL row before it skews training. "
    "Both directions emitted (KL is asymmetric). Scale shape: the "
    "(source, token) aggregate is the only corpus-scale shuffle; the "
    "grid is |vocab| × source-pairs — vocabulary-scale, built from "
    "broadcastable marginals. Float discipline: identical smoothed "
    "ratios into ln(), sum-order ulp absorbed by the 6dp round (u32's "
    "rule).",
    tags=("text", "quality", "monitoring", "llm-pipeline"),
)
def u53_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    toks = d.select("source", F.explode(F.split(norm, " ")).alias("tok"))
    per = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    vocab = per.agg(F.count_distinct("tok").cast("double").alias("v"))
    tot = per.groupBy("source").agg(F.sum("c").alias("n"))
    toks_d = per.select("tok").distinct()
    a = tot.select(F.col("source").alias("src_p"), F.col("n").alias("n_p"))
    b = tot.select(F.col("source").alias("src_q"), F.col("n").alias("n_q"))
    pa = per.select(
        F.col("source").alias("src_p"), "tok", F.col("c").alias("c_p")
    )
    pb = per.select(
        F.col("source").alias("src_q"), "tok", F.col("c").alias("c_q")
    )
    grid = (
        toks_d.crossJoin(F.broadcast(a))
        .crossJoin(F.broadcast(b))
        .where(F.col("src_p") < F.col("src_q"))
        .crossJoin(F.broadcast(vocab))
        .join(pa, ["src_p", "tok"], "left")
        .join(pb, ["src_q", "tok"], "left")
        .select(
            "src_p",
            "src_q",
            ((F.coalesce("c_p", F.lit(0.0)) + 1) / (F.col("n_p") + F.col("v"))).alias("p"),
            ((F.coalesce("c_q", F.lit(0.0)) + 1) / (F.col("n_q") + F.col("v"))).alias("q"),
        )
    )
    return grid.groupBy("src_p", "src_q").agg(
        F.round(F.sum(F.col("p") * F.log(F.col("p") / F.col("q"))), 6).alias(
            "kl_pq_r"
        ),
        F.round(F.sum(F.col("q") * F.log(F.col("q") / F.col("p"))), 6).alias(
            "kl_qp_r"
        ),
    )
