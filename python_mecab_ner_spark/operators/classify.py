"""Hashed linear text classification (fastText-style inference) at
corpus scale.

Model-based quality filtering is the step between heuristic gates
(functions.text.quality_score) and LLM-judge labels in every modern
training-data pipeline (CCNet's fastText LM filter, FineWeb-Edu's
classifier gate): a linear model over hashed word/bigram features is
cheap enough to score 100 TB and strong enough to rank sources.  This
module implements the INFERENCE side Spark-first: feature hashing and
the weighted sum are pure per-row JVM expressions (zero shuffle, zero
UDF); trained weights arrive as a broadcast (bucket -> weight) table.

Without a weights table the operator derives a deterministic md5
stand-in weight per bucket — an honest placeholder with the exact
same plan shape and an exact DuckDB oracle (q112), so the plumbing a
real model drops into is fully tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int

FEAT_SALT = "feat:"
WT_SALT = "wt:"


def _feature_array(text_col, n_buckets: int):
    """Per-row array of hashed feature bucket ids: word unigrams +
    word bigrams (joined with '_'), each pmod'd into n_buckets.
    Everything stays inside one projection — codegen, no explode yet."""
    toks = F.split(F.regexp_replace(F.lower(F.trim(text_col)),
                                    r"\s+", " "), " ")
    n = F.size(toks)
    lead = F.greatest(n - 1, F.lit(1))
    # zip_with pads the shorter slice with NULL; concat(null) -> NULL
    # drops the trailing partial bigram in the filter below
    bigrams = F.filter(
        F.zip_with(F.slice(toks, 1, lead), F.slice(toks, 2, lead),
                   lambda a, b: F.concat(a, F.lit("_"), b)),
        lambda x: x.isNotNull())
    feats = F.filter(F.concat(toks, bigrams), lambda x: x != "")
    return F.transform(
        feats,
        lambda s: F.pmod(
            F.conv(F.substring(F.md5(F.concat(F.lit(FEAT_SALT), s)),
                               1, 15), 16, 10).cast("bigint"),
            F.lit(n_buckets)).cast("bigint"))


def stand_in_weights(bucket_col):
    """Deterministic integer weight in [-8, 8] per bucket id — the
    md5 stand-in used when no trained weight table is supplied."""
    return (F.pmod(md5_int(bucket_col.cast("string"), salt=WT_SALT),
                   F.lit(17)) - F.lit(8)).cast("bigint")


def hashed_linear_score(df: DataFrame, text_col: str, id_col: str,
                        n_buckets: int = 4096,
                        weights: DataFrame | None = None) -> DataFrame:
    """Score every document with a hashed linear classifier:
    score(d) = sum over unigram+bigram features of weight[bucket(f)],
    label = 'keep' if score > 0 else 'drop'.

    Scale shape: feature hashing is a per-row array projection; the
    exploded feature stream joins the weight side ONLY via broadcast
    (the weight table is model-sized: n_buckets rows, KBs); the sole
    corpus-scale exchange is the per-doc sum (map-side combinable).
    With weights=None the weight is computed inline from the bucket id
    (zero joins) — identical plan shape minus the broadcast.

    Returns (doc_id, n_feats, score, label) — all integers/strings,
    exact DuckDB twin (q112)."""
    feats = (df.select(F.col(id_col).alias("doc_id"),
                       F.explode(_feature_array(F.col(text_col),
                                                n_buckets))
                       .alias("fb")))
    if weights is not None:
        wt = F.broadcast(weights.select(F.col("bucket").alias("fb"),
                                        F.col("weight").alias("_w")))
        scored = feats.join(wt, "fb", "left").withColumn(
            "_w", F.coalesce(F.col("_w"), F.lit(0)).cast("bigint"))
    else:
        scored = feats.withColumn("_w", stand_in_weights(F.col("fb")))
    return (scored.groupBy("doc_id")
            .agg(F.count("*").cast("bigint").alias("n_feats"),
                 F.sum("_w").cast("bigint").alias("score"))
            .withColumn("label",
                        F.when(F.col("score") > 0, F.lit("keep"))
                        .otherwise(F.lit("drop"))))
