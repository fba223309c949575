"""Published-method corpus quality filters and data-selection weights.

Three families the reference ETL has no notion of (SURVEY §2 stops at
row-level cleaning) but every pretraining-data pipeline runs:

- **Gopher repetition rules** (Rae et al. 2021, Table A1; the open
  reimplementation shape used by Dolma/RedPajama): per-document
  character-mass fractions of the most frequent 2/3/4-gram and of
  within-document duplicate 5-grams, with the paper's thresholds as
  drop flags.
- **DSIR hashed-n-gram importance weights** (Xie et al. 2023): score
  every raw document by the log-likelihood ratio of its hashed unigram
  bag under a target-domain bucket distribution vs the raw-corpus
  bucket distribution; positive weight ⇒ resample toward target.
- **One-pass Naive Bayes source classifier** — the closed-form stand-in
  for the fastText quality classifiers of GPT-3/CCNet (Brown et al.
  2020 App. A; Joulin et al. 2017): class-conditional token log-odds
  are ONE aggregation over the token stream, scoring is one join, so
  "train + apply a quality classifier" stays a declarative plan.

Scale posture: everything is built-in expressions over one token-explode
scan; model tables (n-gram buckets, token×class counts) are
vocab-bounded aggregates that AQE broadcasts at test scale and
hash-joins when a 100 TB vocabulary outgrows the threshold. No Python
in any path, no collect.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from gov_ec_pipeline_etl_spark.functions.hashing import portable_hash64

# Gopher Table A1 thresholds: fraction of characters in the most
# frequent {2,3,4}-gram, and in duplicate 5-grams.
GOPHER_TOP_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP5_THRESHOLD = 0.15


def _norm(text_col: str) -> F.Column:
    return F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")


def gopher_repetition(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document Gopher repetition signals.

    ``top{n}_frac`` (n = 2,3,4) is ``count(most frequent n-gram) ×
    len(n-gram) / len(normalized text)`` — the character mass the single
    most repeated n-gram accounts for. ``dup5_frac`` is the same mass
    summed over ALL 5-grams occurring ≥ 2 times WITHIN the document
    (positional occurrences overlap, so the fraction can exceed 1 on
    degenerate repetition — kept unclamped, as the open implementations
    do, since the flag only needs the threshold side). Documents shorter
    than n tokens have no n-grams: fraction 0 by definition.

    One corpus scan: tokens explode once (id-partitioned window), the
    2/3/4/5-gram streams assemble from ``lead`` columns and ``stack``,
    and every aggregate after the explode groups on an ``id``-prefixed
    key — Catalyst reuses the window's hash partitioning, so the whole
    operator is ONE exchange at any corpus size. Per-doc repetition
    needs no cross-document state at all, so it scales embarrassingly.
    """
    ns = (2, 3, 4, 5)
    base = df.select(
        F.col(id_col).alias("id"),
        _norm(text_col).alias("norm"),
    ).select(
        "id",
        F.length("norm").alias("nc"),
        F.posexplode(F.split("norm", " ")).alias("pos", "t"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    leads = {j: F.lead("t", j).over(w) for j in range(1, max(ns))}
    with_grams = base.select(
        "id",
        "nc",
        *[
            F.when(
                leads[n - 1].isNotNull(),
                F.concat_ws(" ", F.col("t"), *[leads[j] for j in range(1, n)]),
            ).alias(f"g{n}")
            for n in ns
        ],
    )
    grams = with_grams.select(
        "id",
        "nc",
        F.expr(
            "stack({}, {}) as (n, s)".format(
                len(ns), ", ".join(f"{n}, g{n}" for n in ns)
            )
        ),
    ).where(F.col("s").isNotNull())
    occ = grams.groupBy("id", "nc", "n", "s").agg(
        F.count(F.lit(1)).alias("c")
    )
    mass = F.col("c") * F.length("s")
    per_n = occ.groupBy("id", "nc", "n").agg(
        F.max(mass).alias("top_mass"),
        F.sum(F.when(F.col("c") >= 2, mass).otherwise(F.lit(0))).alias(
            "dup_mass"
        ),
    )
    frac = lambda col: F.round(col / F.col("nc"), 6)  # noqa: E731
    top = lambda n: F.coalesce(  # noqa: E731
        F.max(F.when(F.col("n") == n, frac(F.col("top_mass")))), F.lit(0.0)
    )
    out = per_n.groupBy("id", "nc").agg(
        top(2).alias("top2_frac"),
        top(3).alias("top3_frac"),
        top(4).alias("top4_frac"),
        F.coalesce(
            F.max(F.when(F.col("n") == 5, frac(F.col("dup_mass")))),
            F.lit(0.0),
        ).alias("dup5_frac"),
    )
    flagged = (
        (F.col("top2_frac") > GOPHER_TOP_THRESHOLDS[2])
        | (F.col("top3_frac") > GOPHER_TOP_THRESHOLDS[3])
        | (F.col("top4_frac") > GOPHER_TOP_THRESHOLDS[4])
        | (F.col("dup5_frac") > GOPHER_DUP5_THRESHOLD)
    )
    return out.select(
        "id",
        "top2_frac",
        "top3_frac",
        "top4_frac",
        "dup5_frac",
        flagged.cast("int").alias("flagged"),
    )


def dsir_logweights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: F.Column,
    buckets: int = 512,
) -> DataFrame:
    """DSIR importance weights from hashed unigram bags (Xie et al.
    2023): ``log_ratio(doc) = Σ_b m_b · (ln p_target(b) − ln p_raw(b))``
    over hash buckets ``b``, add-one smoothed over ``buckets`` cells.
    ``target`` is a boolean Column marking the target-domain sample
    rows; every document is scored (including target rows — the weight
    is a property of the text). ``selected`` is the resample-toward-
    target decision ``round(log_ratio, 6) > 0`` (thresholding the
    ROUNDED value keeps the flag cross-engine deterministic).

    One token-explode scan feeds both the 2×``buckets`` count table
    (a broadcastable aggregate at any corpus size — the table is
    fixed-width by construction, DSIR's point) and the per-doc bucket
    multiplicities; scoring is one broadcast join + one per-doc sum.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        target.alias("is_t"),
        F.explode(F.split(_norm(text_col), " ")).alias("t"),
    ).select(
        "id", "is_t", F.pmod(portable_hash64(F.col("t")), buckets).alias("b")
    )
    bucket_tab = toks.groupBy("b").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("tb"),
        F.sum(F.when(F.col("is_t"), 0).otherwise(1)).alias("rb"),
    )
    totals = bucket_tab.agg(
        F.sum("tb").alias("tt"), F.sum("rb").alias("rt")
    )
    doc_b = toks.groupBy("id", "b").agg(F.count(F.lit(1)).alias("m"))
    term = F.col("m") * (
        F.log((F.col("tb") + 1) / (F.col("tt") + buckets))
        - F.log((F.col("rb") + 1) / (F.col("rt") + buckets))
    )
    scored = (
        doc_b.join(F.broadcast(bucket_tab), "b")
        .crossJoin(F.broadcast(totals))
        .groupBy("id")
        .agg(
            F.sum("m").alias("n_toks"),
            F.round(F.sum(term), 6).alias("log_ratio"),
        )
    )
    return scored.select(
        "id",
        "n_toks",
        "log_ratio",
        (F.col("log_ratio") > 0).cast("int").alias("selected"),
    )


def nb_source_confusion(
    df: DataFrame, id_col: str, text_col: str, label_col: str
) -> DataFrame:
    """Train a one-pass add-one-smoothed multinomial Naive Bayes on the
    corpus' own ``label_col`` and score every document (resubstitution),
    returning the confusion matrix ``(label, predicted, n_docs)``.

    score(d, c) = ln(docs_c / N) + Σ_t m_t · ln((c_tc + 1)/(tot_c + V));
    prediction is the max with ties broken toward the SMALLER class
    name, on scores rounded to 6 decimals (cross-engine float
    discipline). The model — token×class counts, class totals, priors,
    vocab size — is a single aggregation pass over the token stream;
    scoring joins each document's token multiset against the model per
    class, so the work is (doc tokens × |classes|), linear in the
    corpus. The argmax is a per-doc window over |classes| rows.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        F.explode(F.split(_norm(text_col), " ")).alias("t"),
    )
    cond = toks.groupBy("t", "label").agg(F.count(F.lit(1)).alias("ctc"))
    cls = cond.groupBy("label").agg(F.sum("ctc").alias("tot"))
    docs = df.select(F.col(id_col).alias("id"), F.col(label_col).alias("label"))
    priors = docs.groupBy("label").agg(F.count(F.lit(1)).alias("nd"))
    n_total = docs.agg(F.count(F.lit(1)).alias("n"))
    vocab = cond.agg(F.countDistinct("t").alias("v"))
    classes = (
        cls.join(priors, "label")
        .crossJoin(F.broadcast(n_total))
        .crossJoin(F.broadcast(vocab))
        .select("label", "tot", "nd", "n", "v")
    )
    doc_t = toks.groupBy("id", "t").agg(F.count(F.lit(1)).alias("m"))
    pairs = (
        doc_t.crossJoin(
            F.broadcast(classes.select(F.col("label").alias("cls"), "tot", "v"))
        )
        .join(
            cond.select("t", F.col("label").alias("cls"), "ctc"),
            ["t", "cls"],
            "left",
        )
        .select(
            "id",
            "cls",
            (
                F.col("m")
                * F.log(
                    (F.coalesce(F.col("ctc"), F.lit(0)) + 1)
                    / (F.col("tot") + F.col("v"))
                )
            ).alias("term"),
        )
    )
    scores = (
        pairs.groupBy("id", "cls")
        .agg(F.sum("term").alias("ll"))
        .join(
            F.broadcast(
                classes.select(
                    F.col("label").alias("cls"),
                    F.log(F.col("nd") / F.col("n")).alias("lp"),
                )
            ),
            "cls",
        )
        .select(
            "id", "cls", F.round(F.col("ll") + F.col("lp"), 6).alias("score")
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("cls").asc()
    )
    pred = (
        scores.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id", F.col("cls").alias("predicted"))
    )
    return (
        docs.join(pred, "id")
        .groupBy("label", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def cluster_balanced_sample(
    assigned: DataFrame, cap: int, id_col: str = "vec_id"
) -> DataFrame:
    """Diversity sampling over a cluster assignment (the D4 shape,
    Tirumala et al. 2023: SemDeDup clusters → per-cluster balanced
    keep): within each cluster, rank members by a deterministic portable
    hash of their id and keep the first ``cap`` — large clusters are
    downsampled to the cap, small ones survive whole, so the kept set's
    cluster histogram is flattened without any RNG state.

    Output: (id, cent_id, cluster_size, rnk, kept). The rank is a
    per-cluster window; clusters are the partition key so the work
    distributes with the clustering itself.
    """
    w = Window.partitionBy("cent_id").orderBy(
        portable_hash64(F.col(id_col).cast("string")), F.col(id_col)
    )
    return assigned.select(
        F.col(id_col).alias("id"),
        "cent_id",
        F.count(F.lit(1)).over(Window.partitionBy("cent_id")).alias(
            "cluster_size"
        ),
        F.row_number().over(w).alias("rnk"),
    ).select(
        "id",
        "cent_id",
        "cluster_size",
        "rnk",
        (F.col("rnk") <= cap).cast("int").alias("kept"),
    )
