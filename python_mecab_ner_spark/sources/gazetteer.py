"""Gazetteer ingest (reference operators S1-S6, D1-D3).

Two ingest paths:

- `gazetteer_df_from_tsv`: the shipped compiled gazetteer asset
  (data/gazetteer.tsv) as a small dimension DataFrame.
- `ingest_ner_dir`: the reference's dir-of-txt micro-format
  (`*.txt`, filename stem = large category, `#header` lines = small
  category, body lines = surfaces; reference mecab_reader.py:190-219)
  re-expressed declaratively: spark.read.text + input_file_name +
  a last(header, ignorenulls) fill-down window — the reference's
  stateful read_category loop (mecab_reader.py:166-188) as SQL.

Dictionary compilation (D2: tokenizing every surface with the same
tokenizer that processes the corpus) happens in `compile_gazetteer`.
The result is a tiny dimension (~10^2..10^6 rows at production scale)
that is always broadcast, never shuffled.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..kernel.lexicon import GAZETTEER_TSV, load_gazetteer_rows


def gazetteer_df_from_tsv(spark, path=None):
    rows = load_gazetteer_rows(path or GAZETTEER_TSV)
    return spark.createDataFrame(rows, "large string, small string, surface string, tokenized string")


def ingest_ner_dir(spark, path: str):
    """Reference ner_data directory -> (large, small, surface) DataFrame.

    - filename stem -> large (S1, mecab_reader.py:199-204)
    - '#'-header fill-down -> small, default header = stem when a file
      starts without one (mecab_reader.py:207-208)
    - '#' stripped from small (the reference strips at output,
      mecab_ner.py:249; this engine normalizes at ingest)
    """
    raw = (spark.read.text(path + "/*.txt")
           .withColumn("file", F.input_file_name())
           .withColumn("large", F.regexp_extract("file", r"([^/]+)\.txt$", 1)))
    # preserve file line order for the fill-down
    raw = raw.withColumn("line_no", F.monotonically_increasing_id())
    w = (Window.partitionBy("large").orderBy("line_no")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cleaned = (raw
               .withColumn("value", F.regexp_replace("value", "^﻿", ""))
               .withColumn("header",
                           F.when(F.col("value").startswith("#"),
                                  F.regexp_replace("value", "^#", "")))
               .withColumn("small",
                           F.coalesce(F.last("header", ignorenulls=True).over(w),
                                      F.col("large"))))
    return (cleaned
            .filter((~F.col("value").startswith("#")) & (F.trim("value") != ""))
            .select("large", F.trim("small").alias("small"),
                    F.col("value").alias("surface")))


def compile_gazetteer(df):
    """D2: tokenize every surface with the engine tokenizer (the same
    code path that tokenizes the corpus — one source of truth), giving
    the (large, small, surface, tokenized) compiled dimension.

    Runs as a pandas UDF; at gazetteer scale this is a single tiny
    task, but the operator is the same one that would compile a
    10^7-entry production dictionary in parallel.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def tok(surfaces: pd.Series) -> pd.Series:
        from ..kernel.tokenizer import extracted_text
        return surfaces.map(lambda s: extracted_text(s or ""))

    return df.withColumn("tokenized", tok("surface"))


def broadcast_rows(spark, df=None, path=None):
    """Driver-side collect of the (tiny) gazetteer + sc.broadcast.
    Returns the broadcast handle consumed by operators.annotate."""
    if df is not None:
        rows = [(r.large, r.small, r.surface, r.tokenized)
                for r in df.select("large", "small", "surface", "tokenized").collect()]
    else:
        rows = load_gazetteer_rows(path or GAZETTEER_TSV)
    return spark.sparkContext.broadcast(rows)
