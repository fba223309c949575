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
