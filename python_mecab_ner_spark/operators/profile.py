"""Corpus profiling: per-source reliability aggregates.

Web-scale curation pipelines (C4, RefinedWeb, FineWeb) make KEEP/DROP/
DOWNWEIGHT decisions per source (domain, crawl, feed) before touching
individual documents — a source whose pages are mostly mutual
duplicates or low-quality boilerplate is dropped wholesale.  This
operator computes the per-source evidence for that decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, quality_score, token_count


def source_reliability(df: DataFrame, text_col: str, id_col: str,
                       source_col: str) -> DataFrame:
    """Per-source: document count, distinct-content count (exact-dup
    fingerprint), duplicate count, total quality score, and total
    token count.  Downstream: dup_rate = n_dup/n_docs and mean
    quality = sum_quality/n_docs (kept as exact integer sums here so
    the oracle hash-matches; the ratios are presentation-layer).

    Scale shape: ONE aggregate keyed by source with a partial-
    distinct fingerprint count (two-phase: map-side distinct within
    (source, fp), then merge) — sources are a bounded dimension
    (domains), so the result is tiny; the only corpus-wide exchange
    is the aggregate's own shuffle.  A skewed mega-source is handled
    by AQE skew splitting since every other term is map-side
    combinable."""
    enriched = df.select(
        F.col(source_col).alias("source"),
        fingerprint(F.col(text_col)).alias("_fp"),
        quality_score(F.col(text_col)).alias("_q"),
        token_count(F.col(text_col)).alias("_t"))
    return (enriched.groupBy("source")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.countDistinct("_fp").cast("bigint").alias("n_unique"),
                 F.sum("_q").cast("bigint").alias("sum_quality"),
                 F.sum("_t").cast("bigint").alias("sum_tokens"))
            .withColumn("n_dup",
                        (F.col("n_docs") - F.col("n_unique"))
                        .cast("bigint")))
