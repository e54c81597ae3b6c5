"""KLUE-NER JSON source (reference S7: main.py:55-98 iterates
document[].sentence[] with fields form and NE[{form,label,begin,end}]).

Spark-first: one spark.read.json (multiLine) + two explodes — the
reference's nested Python loops become a columnar scan whose nested
arrays Catalyst prunes.  The char-annotated NE spans feed the BIO
alignment (operators/bio.py char_spans_to_token_spans) and the
stats-training aggregation, replacing the reference's per-NE
MecabParser re-instantiation (main.py:91).

Fixture: tests/data/klue_fixture.json — the same shape with pinned
vocabulary and verified char offsets (the real corpus is not
redistributable; any file of this shape loads through the same
reader).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FIXTURE_PATH = "tests/data/klue_fixture.json"


def klue_sentences(spark: SparkSession, path: str) -> DataFrame:
    """(doc_id, sent_idx, form): one row per sentence."""
    raw = spark.read.option("multiLine", True).json(path)
    return (raw.select(F.explode("document").alias("d"))
            .select(F.col("d.id").alias("doc_id"),
                    F.posexplode("d.sentence").alias("sent_idx", "s"))
            .select("doc_id", F.col("sent_idx").cast("int").alias("sent_idx"),
                    F.col("s.form").alias("form"), F.col("s.NE").alias("ne"))
            .where(F.col("form") != ""))


def klue_ner(spark: SparkSession, path: str) -> DataFrame:
    """(doc_id, sent_idx, form, ne_form, label, ne_begin, ne_end):
    one row per NE annotation (reference main.py:80-86 fields)."""
    return (klue_sentences(spark, path)
            .select("doc_id", "sent_idx", "form",
                    F.explode("ne").alias("n"))
            .select("doc_id", "sent_idx", "form",
                    F.col("n.form").alias("ne_form"),
                    F.col("n.label").alias("label"),
                    F.col("n.begin").cast("int").alias("ne_begin"),
                    F.col("n.end").cast("int").alias("ne_end")))


def klue_pages(spark: SparkSession, path: str) -> DataFrame:
    """Sentences in the engine's pages shape (url, warc_ts, text,
    lang) so the annotate stage ingests a real training corpus
    unchanged: url = <doc_id>#<sent_idx>."""
    return (klue_sentences(spark, path)
            .select(F.concat_ws("#", "doc_id",
                                F.col("sent_idx").cast("string")).alias("url"),
                    F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("warc_ts"),
                    F.col("form").alias("text"),
                    F.lit("ko").alias("lang")))
