"""End-to-end streaming continuity (round-4 verdict task 5): the
ingest pieces — stream_quality_gate -> stream_dedup -> stream-side
linking — chained as ONE streaming query over multiple micro-batches,
with row-parity assertions against the batch twins on the same window.
The per-operator tests (test_streaming.py) pin each stage alone; this
pins the COMPOSITION: gates drop junk before state, dedup state works
across micro-batches, and the linked output matches the batch ladder
at levels 0/1 for exactly one survivor per distinct text.

The long-running wall-clock variant (real processing-time trigger, a
file-dripper feeding for N seconds) is scripts/stream_continuity.py;
its JSON artifact carries the same parity verdict.
"""

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F

from python_mecab_ner_spark.functions.text import (duplicate_ngram_ppm,
                                                   fingerprint, lang_id,
                                                   quality_score)
from python_mecab_ner_spark.operators.annotate import (annotate_pages,
                                                       spans_table)
from python_mecab_ner_spark.operators.linking import (canonical_entities,
                                                      link_mentions)
from python_mecab_ner_spark.sources.corpus import pages_dataframe
from python_mecab_ner_spark.sources.gazetteer import (broadcast_rows,
                                                      gazetteer_df_from_tsv)
from python_mecab_ner_spark.streaming.ingest import (stream_pages,
                                                     stream_dedup,
                                                     stream_quality_gate)
from python_mecab_ner_spark.streaming.link import stream_linked_spans

PAGE_COLS = ["url", "warc_ts", "text", "lang"]
SCHEMA = "url string, warc_ts timestamp, text string, lang string"


@pytest.fixture(scope="module")
def bc(spark):
    return broadcast_rows(spark)


def _write_wave(df, src, n):
    df.coalesce(1).write.mode("append").parquet(src)
    time.sleep(0.05)   # distinct mtimes -> deterministic file order


def _continuity_input(spark, src):
    """Three waves: 30 ko pages; 30 more + junk (wrong-lang /
    punctuation soup the gate must drop); exact-text duplicates of 6
    wave-1 pages under new urls (cross-micro-batch dedup) + 1 fresh
    page.  Returns the full batch DataFrame for the twin."""
    corpus = pages_dataframe(spark, 61, seed=11).select(*PAGE_COLS) \
        .withColumn("_did", F.substring_index("url", "/", -1).cast("int"))
    p1 = corpus.where(F.col("_did") < 30).drop("_did")
    p2 = corpus.where((F.col("_did") >= 30) & (F.col("_did") < 60)) \
        .drop("_did")
    t0 = dt.datetime(2026, 1, 1, 12, 0)
    junk = spark.createDataFrame(
        [("junk://1", t0, "!!! ??? ... ###", "en"),
         ("junk://2", t0, "the and is of to in for on", "en"),
         ("junk://3", t0, "#*#*#*#*#*", "en")], SCHEMA)
    dups = (p1.orderBy("url").limit(6)
            .select(F.concat(F.col("url"), F.lit("?dup=1")).alias("url"),
                    (F.col("warc_ts") + F.expr("INTERVAL 5 MINUTES"))
                    .alias("warc_ts"), "text", "lang"))
    fresh = corpus.where(F.col("_did") == 60).drop("_did")
    _write_wave(p1, src, 1)
    _write_wave(p2.unionByName(junk), src, 2)
    _write_wave(dups.unionByName(fresh), src, 3)
    return p1.unionByName(p2).unionByName(junk) \
        .unionByName(dups).unionByName(fresh)


def _gate_batch(pages):
    return (pages.where(lang_id(F.col("text")) == "ko")
            .where(quality_score(F.col("text")) >= 60)
            .where(duplicate_ngram_ppm(F.col("text"), n=2) <= 600_000))


def test_chained_gate_dedup_link_parity(spark, bc, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("pages", "out", "ckpt"))
    all_pages = _continuity_input(spark, src)
    entities = canonical_entities(gazetteer_df_from_tsv(spark))

    # ONE chained query: gate -> dedup (stateful) -> annotate+link
    chained = stream_linked_spans(
        stream_dedup(
            stream_quality_gate(
                stream_pages(spark, src, max_files_per_trigger=1),
                lang="ko", min_quality=60, max_rep_ppm=600_000)),
        bc, entities)
    q = (chained.writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(240)
    assert q.lastProgress["batchId"] >= 2   # really multi-micro-batch

    got = spark.read.parquet(out)
    got_urls = {r.url for r in got.select("url").distinct().collect()}

    # --- batch twin on the same window ---
    gated = _gate_batch(all_pages)
    fp_of = {r.url: r.fp for r in
             gated.select("url", fingerprint("text").alias("fp"))
             .collect()}
    # junk never passes the gate
    assert not any(u.startswith("junk://") for u in got_urls)
    assert set(got_urls) <= set(fp_of)

    # batch twin of annotate+link over every gate-passing page
    spans = spans_table(annotate_pages(gated, bc)) \
        .withColumnRenamed("word", "surface")
    batch = link_mentions(spans, entities)
    batch_rows = {(r.url, r.start, r.end): (r.entity_id, r.link_level)
                  for r in batch.collect()}
    urls_with_spans = {u for (u, _, _) in batch_rows}
    fps_with_spans = {fp_of[u] for u in urls_with_spans}

    # exactly ONE survivor url per distinct surviving text, and every
    # span-bearing distinct text is represented (dedup parity)
    surv_by_fp: dict = {}
    for u in got_urls:
        surv_by_fp.setdefault(fp_of[u], []).append(u)
    assert all(len(v) == 1 for v in surv_by_fp.values()), surv_by_fp
    assert set(surv_by_fp) == fps_with_spans

    # row parity per survivor: same spans, same entity at the same
    # level wherever the batch ladder links at 0/1 (the stream-link
    # contract); stream may never link beyond levels 0/1
    got_rows = {(r.url, r.start, r.end): (r.entity_id, r.link_level)
                for r in got.collect()}
    assert set(got_rows) == {k for k in batch_rows if k[0] in got_urls}
    n01 = 0
    for key, (s_ent, s_lvl) in got_rows.items():
        b_ent, b_lvl = batch_rows[key]
        if b_lvl in (0, 1):
            assert (s_ent, s_lvl) == (b_ent, b_lvl), key
            n01 += 1
        else:
            assert s_lvl in (0, 1, 5)
    assert n01 > 0
