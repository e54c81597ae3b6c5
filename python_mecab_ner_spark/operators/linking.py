"""Entity linking: mentions -> canonical entity ids.

Generalizes the reference's staged strict->loose->infer match ladder
(NerExtractor.get_entity levels STRICT_CORE/LOOSE_CORE/PART_INFER/
BRUTE_INFER, reference mecab_category_storage.py:19-22,481-532) into
three broadcast-join passes of decreasing strictness, then the
reference's rank-1-per-group homonym disambiguation
(delete_duplicate_value, mecab_category_storage.py:39-63,619-656) as a
deterministic window:

  level 0  exact surface equality
  level 1  jamo-normalized equality (spacing/jamo variants)
  level 2  shared-token evidence within the same large category,
           scored by shared-token count (the counter-evidence checks
           L8/L9 reduced to join cardinality)

The entity dimension is tiny relative to the corpus -> F.broadcast on
every pass; the only corpus-sized shuffle is the final per-mention
window, keyed by (url, start, end) which is high-cardinality at any
scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashing import md5_int

MENTION_COLS = ["url", "start", "end", "surface", "large", "small"]


def _jamo_key_udf(col):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def jk(s: pd.Series) -> pd.Series:
        from ..kernel.jamo import to_jamo
        return s.map(lambda x: to_jamo((x or "").replace(" ", "").lower()))
    return jk(col)


def canonical_entities(gazetteer_df: DataFrame) -> DataFrame:
    """Gazetteer -> entity dimension: one entity per distinct
    (large, small, surface) with a stable portable id and a
    jamo-normalized alias key."""
    return (gazetteer_df
            .select("large", "small", "surface").distinct()
            .withColumn("entity_id",
                        md5_int(F.concat_ws("|", "large", "small", "surface")))
            .withColumn("jamo_key", _jamo_key_udf(F.col("surface"))))


def link_mentions(mentions_df: DataFrame, entities_df: DataFrame) -> DataFrame:
    """mentions (url, start, end, surface, large, small) ->
    + (entity_id, link_level, link_score); unlinkable mentions keep
    entity_id NULL at level 3."""
    out_cols = MENTION_COLS + ["entity_id", "link_level", "link_score"]
    ent = entities_df.select(
        F.col("entity_id").alias("e_id"),
        F.col("large").alias("e_large"),
        F.col("surface").alias("alias"),
        F.col("jamo_key").alias("e_jamo"))

    m = mentions_df.select(*MENTION_COLS) \
        .withColumn("m_jamo", _jamo_key_udf(F.col("surface")))

    l0 = (m.join(F.broadcast(ent),
                 (m.surface == F.col("alias")) & (m.large == F.col("e_large")))
          .select(*MENTION_COLS, F.col("e_id").alias("entity_id"),
                  F.lit(0).alias("link_level"), F.lit(100).alias("link_score")))

    l1 = (m.join(F.broadcast(ent),
                 (F.col("m_jamo") == F.col("e_jamo")) & (m.large == F.col("e_large")))
          .select(*MENTION_COLS, F.col("e_id").alias("entity_id"),
                  F.lit(1).alias("link_level"), F.lit(50).alias("link_score")))

    # level 2: shared-token evidence (token = whitespace word of the
    # surface), same large category
    m_tok = m.withColumn("tok", F.explode(F.split("surface", " ")))
    e_tok = (ent.withColumn("tok", F.explode(F.split("alias", " ")))
             .select("e_id", "e_large", "tok"))
    l2 = (m_tok.join(F.broadcast(e_tok),
                     (m_tok.large == F.col("e_large")) & (m_tok.tok == e_tok.tok))
          .groupBy(*MENTION_COLS, "e_id")
          .agg(F.count("*").cast("int").alias("link_score"))
          .select(*MENTION_COLS, F.col("e_id").alias("entity_id"),
                  F.lit(2).alias("link_level"), "link_score"))

    candidates = l0.unionByName(l1).unionByName(l2)

    # rank-1 per mention: best level, then score, then stable id
    w = Window.partitionBy("url", "start", "end").orderBy(
        F.col("link_level").asc(), F.col("link_score").desc(),
        F.col("entity_id").asc())
    best = (candidates.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1").drop("_rn"))

    unlinked = (mentions_df.select(*MENTION_COLS)
                .join(best.select("url", "start", "end").distinct(),
                      ["url", "start", "end"], "left_anti")
                .withColumn("entity_id", F.lit(None).cast("bigint"))
                .withColumn("link_level", F.lit(3))
                .withColumn("link_score", F.lit(0)))
    return best.select(out_cols).unionByName(unlinked.select(out_cols))
