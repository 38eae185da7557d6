"""End-to-end corpus preparation: the composed training-data pipeline
(quality score → language filter → exact dedup) as one declarative
DataFrame graph — the shape a 100 TB pretraining-data job takes.

Composition keeps every stage's scale property: scoring and language ID
are pure column expressions fused into the scan stage; the dedup
canonicalization is ONE hash shuffle on the content digest (window min,
no join); nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pedsnetdcc_spark.datapipe.text import lang_id, text_stats


def prepare_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    lang: str = "en",
) -> DataFrame:
    """Filter a document table to high-quality, in-language, content-
    unique rows: quality ≥ ``min_quality`` (``text_stats`` composite),
    predicted language == ``lang``, and only the canonical (minimum-id)
    row per exact content digest survives.

    Returns ``(id, lang_pred, n_tokens, quality_score)`` for the
    surviving rows.
    """
    scored = lang_id(text_stats(df.select(id_col, text_col)))
    kept = scored.where(
        (F.col("quality_score") >= min_quality) & (F.col("lang_pred") == lang)
    )
    h = F.md5(F.col(text_col))
    w = Window.partitionBy(h)
    kept = kept.withColumn("__canon", F.min(id_col).over(w))
    return kept.where(F.col(id_col) == F.col("__canon")).select(
        id_col, "lang_pred", "n_tokens", "quality_score"
    )


def corpus_report(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-group corpus accounting in ONE scan + one hash aggregate:
    document count, total whitespace tokens, total characters, distinct
    languages, and exact-duplicate document count (rows beyond the
    first per content hash).  The integer-only metrics make the report
    engine-exact; map-side partial aggregation keeps the shuffle to one
    row per group."""
    toks = F.size(F.split(F.col(text_col), " "))
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks.cast("long")).alias("total_tokens"),
        F.sum(F.length(text_col).cast("long")).alias("total_chars"),
        F.count_distinct(F.col(lang_col)).alias("n_langs"),
        (F.count(F.lit(1)) - F.count_distinct(F.md5(F.col(text_col)))).alias(
            "dup_docs"
        ),
    )
