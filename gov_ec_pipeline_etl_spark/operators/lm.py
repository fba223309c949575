"""Corpus-fitted language-model quality scoring.

The CCNet pipeline (Wenzek et al. 2020) ranks documents by perplexity
under a pretrained KenLM; the reference ETL has no notion of LM-based
quality at all. This module fits the LM on the corpus itself inside the
query — an add-one-smoothed bigram model — so the signal needs no
external artifact and stays fully oracle-replayable: repetitive
boilerplate scores low cross-entropy, token salad scores high.

Everything is built-in expression composition. The count tables are
aggregates over the corpus bigram stream (vocab-bounded, far smaller
than the corpus); AQE broadcasts them at test scale and falls back to
hash joins when a 100 TB vocabulary outgrows the broadcast threshold —
the plan is the same either way.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def bigram_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) rows: consecutive token pairs of the normalized
    text, assembled with window ``lead`` over the id-partitioned token
    explode (same codegen-friendly shape as ``shingle_rows``).
    Documents with fewer than two tokens contribute no rows."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    toks = df.select(
        F.col(id_col).alias("id"), norm.alias("norm")
    ).select("id", F.posexplode(F.split("norm", " ")).alias("pos", "t"))
    w = Window.partitionBy("id").orderBy("pos")
    return (
        toks.select(
            "id",
            F.col("t").alias("w1"),
            F.lead("t", 1).over(w).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
    )


def token_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, t) rows of the normalized whitespace tokens."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(
        F.col(id_col).alias("id"), F.explode(F.split(norm, " ")).alias("t")
    )


def bigram_crossentropy(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document cross-entropy (nats) under an add-one-smoothed
    bigram LM fitted on the corpus: P(w2|w1) = (c(w1,w2)+1)/(c(w1·)+V).

    One corpus scan feeds the bigram stream; c2 is one bigram-keyed
    aggregate and c1 (context totals) is c2 RE-GROUPED — an aggregate
    of the aggregate, never a second corpus pass. V (vocab size) is an
    exact distinct count joined in as a one-row broadcast. Documents
    with < 2 tokens have no bigrams and are absent from the output
    (consistent with the SQL-replay semantics).

    Output: (id, n_bigrams, xent) with xent rounded to 6 decimals
    in-query (cross-engine float discipline)."""
    bg = bigram_rows(df, id_col, text_col)
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = token_rows(df, id_col, text_col).agg(
        F.countDistinct("t").alias("v")
    )
    scored = (
        bg.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "lp",
            F.log((F.col("c2") + 1) / (F.col("c1") + F.col("v"))),
        )
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(-F.avg("lp"), 6).alias("xent"),
    )


TERCILE_BUCKET_DP = 2  # coarse bucket = xent rounded to 2dp (monotone)


def xent_terciles(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """CCNet head/middle/tail split (Wenzek et al. 2020 §4.3): rank the
    scored documents by (xent, id) and cut the corpus into exact
    thirds — ``head`` is the lowest-perplexity third. Only documents
    with ≥2 tokens carry a score and participate (the others never
    enter ``bigram_crossentropy``'s output; a real pipeline routes
    them to a length gate first).

    Scale: the naive spelling is ROW_NUMBER over the whole corpus —
    one partition. Instead the rank is hierarchical, the same
    decomposition as ``stratified_split``/``token_budget_take`` but
    keyed on the ORDER ATTRIBUTE itself: the coarse bucket is the xent
    rounded to ``TERCILE_BUCKET_DP`` places — a monotone function of the sort
    key (2dp), so bucket order is a prefix of the total order; bucket count
    is bounded by the xent RANGE (~ln V), not the corpus. Cumulative
    bucket counts broadcast, the within-bucket window ranks by
    (xent, id), and rank = offset + row_number - 1 is bit-identical to
    the global window the oracle runs (pinned by unit test).
    """
    scored = bigram_crossentropy(df, id_col, text_col)
    base = scored.select(
        "id", "xent", F.round("xent", TERCILE_BUCKET_DP).alias("bucket")
    )
    per_bucket = base.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    w_cum = (
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        "bucket",
        F.coalesce(F.sum("c").over(w_cum), F.lit(0)).alias("offset"),
        F.sum("c").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    w_rank = Window.partitionBy("bucket").orderBy("xent", "id")
    ranked = base.join(F.broadcast(offsets), ["bucket"]).select(
        "id",
        "xent",
        (F.col("offset") + F.row_number().over(w_rank) - 1).alias("rnk"),
        "n",
    )
    r3 = F.col("rnk") * 3
    return ranked.select(
        "id",
        "xent",
        F.when(r3 < F.col("n"), F.lit("head"))
        .when(r3 < F.col("n") * 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
