"""BIO label writeback + training-data export (reference L3/L15,
mecab_category_storage.py:157-169,233-273) as relational operators —
the BIO-tagged corpus an LLM training-data pipeline actually emits.

Scale shape: pure joins/windows.  The mention side explodes to one row
per covered token (explode(sequence(start, end-1)) — bounded by total
mention length), the conflict rank is a window keyed by (url, idx)
(high-cardinality), and the final stamp is a left join back onto the
token table keyed the same way.  Zero Python anywhere.

Kernel twin: kernel/bio.py (same first-writer-wins order: start asc,
end desc, label asc) — pinned against each other in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bio_from_mentions(tokens_df: DataFrame, mentions_df: DataFrame,
                      label_col: str = "label") -> DataFrame:
    """tokens (url, idx, word[, ...]) x mentions (url, start, end,
    <label_col>) -> tokens + bio ('O' | 'B-<label>' | 'I-<label>').

    First-writer-wins on overlaps via the deterministic order
    (start asc, end desc, label asc) — the reference's entity_list
    iteration order made total (SURVEY.md §7.4 item 2)."""
    lab = (mentions_df
           .select("url", "start", "end",
                   F.col(label_col).alias("_lab"))
           # guard degenerate spans: sequence(s, s-1) would otherwise
           # auto-step DOWNWARD and stamp the token before the span
           # (kernel twin emits nothing for empty spans)
           .where(F.col("end") > F.col("start"))
           .withColumn("idx", F.explode(
               F.sequence(F.col("start"), F.col("end") - 1)))
           .withColumn("_bio",
                       F.when(F.col("idx") == F.col("start"),
                              F.concat(F.lit("B-"), F.col("_lab")))
                       .otherwise(F.concat(F.lit("I-"), F.col("_lab")))))
    w = Window.partitionBy("url", "idx").orderBy(
        F.col("start").asc(), F.col("end").desc(), F.col("_lab").asc())
    lab1 = (lab.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1").select("url", "idx", "_bio"))
    return (tokens_df.join(lab1, ["url", "idx"], "left")
            .withColumn("bio", F.coalesce(F.col("_bio"), F.lit("O")))
            .drop("_bio"))


def char_spans_to_token_spans(tokens_df: DataFrame,
                              ne_df: DataFrame) -> DataFrame:
    """tokens (url, idx, begin, end) x char-annotated NE spans
    (url, ne_begin, ne_end, label) -> token-index spans (url, start,
    end, label): min/max token index overlapping each char interval
    (reference set_bi_tag's three positional conditions == interval
    overlap; kernel/bio.py docstring).  Join keyed by url; per-url
    token counts are bounded, so the overlap filter is narrow."""
    t = tokens_df.select("url", "idx",
                         F.col("begin").alias("t_begin"),
                         F.col("end").alias("t_end"))
    j = (ne_df.join(t, "url")
         .where((F.col("t_begin") < F.col("ne_end"))
                & (F.col("t_end") > F.col("ne_begin"))))
    return (j.groupBy("url", "ne_begin", "ne_end", "label")
            .agg(F.min("idx").alias("start"),
                 (F.max("idx") + 1).alias("end"))
            .select("url", "start", "end", "label"))


def bio_export(tokens_df: DataFrame, mentions_df: DataFrame,
               label_col: str = "label") -> DataFrame:
    """The training-data export: (url, idx, word, bio) rows in token
    order — the CoNLL-style corpus a fine-tuning pipeline consumes."""
    return (bio_from_mentions(tokens_df, mentions_df, label_col)
            .select("url", "idx", "word", "bio"))
