"""Stream-side incremental entity linking.

A continuously-crawled corpus wants NEW pages linked into the KG as
they arrive.  The batch ladder (operators/linking.py) uses rank-1
windows, persists, and anti-joins — none of which run on an unbounded
stream without state.  This module re-derives the DETERMINISTIC
levels of the ladder (0 STRICT exact-surface, 1 LOOSE jamo-normalized)
in a fully STATELESS form:

- the rank-1 tie-break is baked into the broadcast DIMENSION instead
  of a window: per join key, keep min(entity_id) — exactly the batch
  ordering (level asc, then entity_id asc; levels 0/1 carry constant
  scores), so one broadcast join returns at most one candidate per
  span row and no stream-side aggregation is needed;
- the level cascade is a coalesce over the two joins.

Evidence levels (2 PART, 3 NEIGHBOR, 4 BRUTE) need corpus-trained
statistics and multi-row scoring — they stay batch: the intended
deployment links streams at levels 0/1 immediately and lets the
periodic batch job re-link the remainder with full evidence
(UNLINKED rows carry level LEVEL_UNLINKED and NULL entity_id, the
same contract as the batch output).

The stream plan is scan -> mapInPandas (jamo key) -> two broadcast
hash joins -> sink: narrow, stateless, watermark-free — executor
scaling matches the batch annotate measurements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.linking import (LEVEL_UNLINKED, MENTION_COLS, OUT_COLS,
                                 _jamo_key_udf)


def link_dims(entities_df: DataFrame):
    """(strict_dim, loose_dim): pre-aggregated broadcast dimensions
    with the batch tie-break (min entity_id per join key) baked in.
    Build once per trigger interval on the driver side; tiny."""
    strict = (entities_df.groupBy(
        F.col("surface").alias("k_surface"),
        F.col("large").alias("k_large"))
        .agg(F.min("entity_id").alias("e0")))
    loose = (entities_df.groupBy(
        F.col("jamo_key").alias("k_jamo"),
        F.col("large").alias("k_large"))
        .agg(F.min("entity_id").alias("e1")))
    return strict, loose


def stream_link_mentions(mentions_stream: DataFrame,
                         entities_df: DataFrame) -> DataFrame:
    """mentions/spans stream (url, start, end, surface, large, small)
    -> + (entity_id, link_level, link_score): levels 0/1 of the batch
    ladder, stateless (streaming-safe), identical output columns.

    Batch-equivalence contract (pinned by test): for spans the batch
    ladder links at level 0 or 1, this operator links to the SAME
    entity at the SAME level; everything else comes out LEVEL_UNLINKED
    for the periodic batch re-link."""
    strict, loose = link_dims(entities_df)
    m = (mentions_stream.select(*MENTION_COLS)
         .withColumn("m_jamo", _jamo_key_udf(F.col("surface"))))
    j = (m.join(F.broadcast(strict),
                (m.surface == F.col("k_surface"))
                & (m.large == F.col("k_large")), "left")
         .drop("k_surface", "k_large")
         .join(F.broadcast(loose),
               (F.col("m_jamo") == F.col("k_jamo"))
               & (F.col("large") == F.col("k_large")), "left")
         .drop("k_jamo", "k_large"))
    level = (F.when(F.col("e0").isNotNull(), F.lit(0))
             .when(F.col("e1").isNotNull(), F.lit(1))
             .otherwise(F.lit(LEVEL_UNLINKED)))
    score = (F.when(F.col("e0").isNotNull(), F.lit(100))
             .when(F.col("e1").isNotNull(), F.lit(50))
             .otherwise(F.lit(0))).cast("bigint")
    return (j.withColumn("entity_id", F.coalesce("e0", "e1"))
            .withColumn("link_level", level)
            .withColumn("link_score", score)
            .select(*OUT_COLS))


def stream_linked_spans(pages_stream: DataFrame, gazetteer_rows_bc,
                        entities_df: DataFrame) -> DataFrame:
    """pages stream -> annotate -> NER spans -> stream-linked spans:
    the incremental KG update path (append the linked spans + triples
    of each micro-batch; the batch job periodically re-links the
    UNLINKED remainder with learned evidence)."""
    from ..operators.annotate import annotate_pages, spans_table
    ann = annotate_pages(pages_stream, gazetteer_rows_bc)
    spans = spans_table(ann).withColumnRenamed("word", "surface")
    return stream_link_mentions(spans, entities_df)
