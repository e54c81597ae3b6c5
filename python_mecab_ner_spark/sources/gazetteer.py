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


def gazetteer_txt_lines(df, sort: bool = True):
    """S3 formatting as a plan: (large, small, surface, tokenized) ->
    (large, line) rows of the reference's compiled mecab micro-format
    ('#small' header lines followed by 'surface,tokenized' entries;
    reference write_category, mecab_reader.py:221-241, ITEM_BOUNDARY
    ',' at :111), in the exact file order the format requires.

    sort=True emits entries length-desc within each small category —
    the reference sorts entries longest-first at READ time
    (mecab_reader.py:178,188, and DataUtility.write_txt(is_sort=True)
    at :88-97); baking the order into the sink makes the
    OS/dict-order-dependent behavior explicit (SURVEY.md §7.4)."""
    headers = (df.select("large", "small").distinct()
               .select("large", "small",
                       F.lit(0).alias("_hdr"),
                       F.lit(0).alias("_len"),
                       F.concat(F.lit("#"), F.col("small")).alias("line")))
    order_len = (-F.length("surface")).cast("long") if sort else F.lit(0).cast("long")
    entries = df.select(
        "large", "small", F.lit(1).alias("_hdr"),
        order_len.alias("_len"),
        F.concat_ws(",", "surface", "tokenized").alias("line"))
    return (headers.unionByName(entries)
            .select("large", "small", "_hdr", "_len", "line"))


def write_ner_dir(df, out_dir: str, sort: bool = True) -> list:
    """S3 sink: compiled gazetteer DataFrame -> reference-format dir of
    '<large>.txt' files.  The ordering/formatting is the Spark plan
    above (deterministic total order: small asc, header first, length
    desc, line asc); the final file emit is a driver-side loop because
    the target is a local-dir micro-format and the gazetteer is a
    broadcast-scale dimension (collecting it is the same cost every
    annotate job already pays).  Returns the written file paths."""
    from pathlib import Path
    rows = (gazetteer_txt_lines(df, sort)
            .orderBy(F.col("large").asc(), F.col("small").asc(),
                     F.col("_hdr").asc(), F.col("_len").asc(),
                     F.col("line").asc())
            .select("large", "line").collect())
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths, handle, cur = [], None, None
    try:
        for r in rows:
            if r.large != cur:
                if handle:
                    handle.close()
                cur = r.large
                p = out / f"{cur}.txt"
                paths.append(str(p))
                handle = open(p, "w", encoding="utf-8")
            handle.write(r.line + "\n")
    finally:
        if handle:
            handle.close()
    return paths


def ingest_mecab_dir(spark, path: str):
    """Read twin of write_ner_dir: the reference's COMPILED dir format
    ('surface,tokenized' body lines; gen_all_mecab_category_data with
    use_mecab_parser=False reads these, mecab_reader.py:190-219) ->
    (large, small, surface, tokenized) DataFrame."""
    base = ingest_ner_dir(spark, path)
    return base.select(
        "large", "small",
        F.split("surface", ",").getItem(0).alias("surface"),
        F.coalesce(F.split("surface", ",").getItem(1),
                   F.split("surface", ",").getItem(0)).alias("tokenized"))


def broadcast_rows(spark, df=None, path=None):
    """Driver-side collect of the (tiny) gazetteer + sc.broadcast.
    Returns the broadcast handle consumed by operators.annotate."""
    if df is not None:
        rows = [(r.large, r.small, r.surface, r.tokenized)
                for r in df.select("large", "small", "surface", "tokenized").collect()]
    else:
        rows = load_gazetteer_rows(path or GAZETTEER_TSV)
    return spark.sparkContext.broadcast(rows)
