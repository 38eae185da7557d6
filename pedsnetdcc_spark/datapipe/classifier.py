"""Trained quality-classifier curation: distill rule labels (or any
labeled seed set) into a multinomial Naive Bayes scorer over hashed
bag-of-words features, then score and filter the corpus distributed.

This is the classifier-based quality-filtering step of published
LM-data pipelines (GPT-3 App. A trains a logistic classifier over
CommonCrawl against a WebText-positive seed set; LLaMA/CCNet-class
pipelines distill fastText classifiers from heuristic labels): a cheap
linear scorer learned from a small labeled set replaces per-document
rule evaluation at scale, and its score gives a tunable threshold
where rules give a hard verdict.

Naive Bayes over term counts IS a linear model in the token-count
feature space: ``score(d) = log P(pass)/P(fail) + Σ_b tf(d,b) ·
log [P(b|pass)/P(b|fail)]``, so training is two count aggregates and
scoring is one join + one grouped sum — pure count arithmetic, no
iterative optimizer, every step exactly replayable by an external SQL
engine (the determinism contract of :func:`~pedsnetdcc_spark.datapipe.
text.lm_score`: each log term is rounded to ``round_digits`` and
accumulated in DECIMAL, so per-document sums are exact and
order-independent; the ±1 ulp cross-engine wobble of ``ln`` is
absorbed by the rounding).

Scale shape: training is one (bucket, class) count aggregate over the
BOW stream (map-side partial, key cardinality ≤ ``dim`` × 2) plus two
1-row broadcasts; the model is ``dim`` rows, broadcast into the
scoring join, whose cost is the BOW stream itself — one doc-keyed
aggregate, no windows, no UDFs, no driver actions.  Nothing grows with
corpus size except the streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_quality_classifier(
    bow: DataFrame,
    labels: DataFrame,
    id_col: str,
    label_col: str,
    dim: int,
    smoothing: int = 1,
    round_digits: int = 6,
) -> DataFrame:
    """Fit the NB model: ``(bucket, llr, log_prior)`` with one row per
    bucket in ``[0, dim)``.  ``bow`` is :func:`~pedsnetdcc_spark.
    datapipe.text.hashed_bow` long-form output ``(id, bucket, tf, …)``;
    ``labels`` maps ``id_col`` → boolean ``label_col`` (the seed set —
    only ids present there train the model, so passing a labeled
    SAMPLE trains on it and :func:`score_with_classifier` still scores
    everything).

    ``llr = round(ln((c1_b+α)/(T1+α·dim)) − ln((c0_b+α)/(T0+α·dim)))``
    with add-α smoothing (``α = smoothing``), ``log_prior =
    round(ln(N1/N0))``.  Both classes must be non-empty — a
    single-class seed set yields NULL/±inf columns (garbage in,
    garbage out; validate the seed set, this is a lazy plan builder
    and cannot raise).  Buckets unseen in training get the smoothed
    prior ratio, so scoring never hits a missing key."""
    y = labels.select(
        F.col(id_col), F.col(label_col).cast("boolean").alias("__y")
    )
    cnt = (
        bow.join(y, id_col)
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("__y"), F.col("tf")).otherwise(F.lit(0)))
            .cast("long")
            .alias("c1"),
            F.sum(F.when(~F.col("__y"), F.col("tf")).otherwise(F.lit(0)))
            .cast("long")
            .alias("c0"),
        )
    )
    buckets = bow.sparkSession.range(dim).select(
        F.col("id").cast("int").alias("bucket")
    )
    full = buckets.join(cnt, "bucket", "left").select(
        "bucket",
        F.coalesce("c1", F.lit(0)).alias("c1"),
        F.coalesce("c0", F.lit(0)).alias("c0"),
    )
    totals = full.agg(
        F.sum("c1").cast("long").alias("t1"),
        F.sum("c0").cast("long").alias("t0"),
    )
    ndocs = y.agg(
        F.sum(F.when(F.col("__y"), 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(~F.col("__y"), 1).otherwise(0)).cast("long").alias("n0"),
    )
    a = F.lit(int(smoothing))
    return (
        full.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(ndocs))
        .select(
            "bucket",
            F.round(
                F.log(
                    (F.col("c1") + a).cast("double")
                    / (F.col("t1") + a * dim).cast("double")
                )
                - F.log(
                    (F.col("c0") + a).cast("double")
                    / (F.col("t0") + a * dim).cast("double")
                ),
                round_digits,
            ).alias("llr"),
            F.round(
                F.log(F.col("n1").cast("double") / F.col("n0").cast("double")),
                round_digits,
            ).alias("log_prior"),
        )
    )


def score_with_classifier(
    bow: DataFrame,
    model: DataFrame,
    id_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Score every document in the BOW stream against a trained model:
    ``(id, score, predicted)`` with ``score = log_prior + Σ_b tf·llr``
    (decimal-exact — see module docstring) and ``predicted = score > 0``
    decided on the DECIMAL value, so the verdict is bit-deterministic.
    Documents with no tokens have no BOW rows and drop out (same
    convention as every token-stream operator); score them as
    ``log_prior`` corpus-side if empty documents matter.

    The model is ``dim`` rows — Spark broadcasts the join; the grouped
    decimal sum is the only shuffle and it is doc-keyed."""
    dec = f"decimal(28,{round_digits})"
    scored = (
        bow.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("llr").cast(dec) * F.col("tf")).alias("__s"),
            F.max("log_prior").alias("__p"),
        )
    )
    total = F.col("__s") + F.col("__p").cast(dec)
    return scored.select(
        F.col(id_col),
        total.cast("double").alias("score"),
        (total > 0).alias("predicted"),
    )
