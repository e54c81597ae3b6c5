"""Wall-clock streaming continuity run (round-4 verdict task 5): the
chained ingest job — stream_quality_gate -> stream_dedup (stateful)
-> stream-side linking — driven as ONE query on a real
processing-time trigger while a dripper thread feeds page files for N
seconds, then drained, stopped, and row-parity-checked against the
batch twins on the same window.  The fast multi-micro-batch variant
is tests/test_streaming_e2e.py; this artifact proves the same parity
holds under continuous wall-clock operation (many triggers, empty
triggers between arrivals, state carried across the whole run).

Usage: python scripts/stream_continuity.py [--seconds 120] [--cpus 8]
Writes stream_continuity.json at the repo root.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PAGE_COLS = ["url", "warc_ts", "text", "lang"]
SCHEMA = "url string, warc_ts timestamp, text string, lang string"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=120)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--docs-per-wave", type=int, default=40)
    args = ap.parse_args()

    import tempfile

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from python_mecab_ner_spark.functions.text import (
        duplicate_ngram_ppm, fingerprint, lang_id, quality_score)
    from python_mecab_ner_spark.operators.annotate import (annotate_pages,
                                                           spans_table)
    from python_mecab_ner_spark.operators.linking import (
        canonical_entities, link_mentions)
    from python_mecab_ner_spark.sources.corpus import pages_dataframe
    from python_mecab_ner_spark.sources.gazetteer import (
        broadcast_rows, gazetteer_df_from_tsv)
    from python_mecab_ner_spark.streaming.ingest import (
        stream_pages, stream_dedup, stream_quality_gate)
    from python_mecab_ner_spark.streaming.link import stream_linked_spans

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("stream-continuity")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    root = Path(tempfile.mkdtemp(prefix="stream_cont_"))
    src, out, ckpt = (str(root / d) for d in ("pages", "out", "ckpt"))
    bc = broadcast_rows(spark)
    entities = canonical_entities(gazetteer_df_from_tsv(spark))

    # wave plan: every wave = a fresh slice of the corpus + one junk
    # page; every third wave re-emits the previous wave's first 5
    # texts under new urls (cross-trigger dedup work)
    n_waves = max(4, args.seconds // 10)
    total_docs = n_waves * args.docs_per_wave
    corpus = (pages_dataframe(spark, total_docs, seed=23)
              .select(*PAGE_COLS)
              .withColumn("_did",
                          F.substring_index("url", "/", -1).cast("int")))
    t0 = dt.datetime(2026, 1, 1, 12, 0)
    waves = []
    for w in range(n_waves):
        lo, hi = w * args.docs_per_wave, (w + 1) * args.docs_per_wave
        wave = corpus.where((F.col("_did") >= lo) & (F.col("_did") < hi)) \
            .drop("_did")
        junk = spark.createDataFrame(
            [(f"junk://{w}", t0, "!!! ??? ... ###", "en")], SCHEMA)
        wave = wave.unionByName(junk)
        if w % 3 == 2:
            prev_lo = (w - 1) * args.docs_per_wave
            dup = (corpus.where((F.col("_did") >= prev_lo)
                                & (F.col("_did") < prev_lo + 5))
                   .drop("_did")
                   .select(F.concat(F.col("url"), F.lit("?dup=1"))
                           .alias("url"),
                           (F.col("warc_ts")
                            + F.expr("INTERVAL 5 MINUTES"))
                           .alias("warc_ts"), "text", "lang"))
            wave = wave.unionByName(dup)
        waves.append(wave)

    fed = {"n": 0}
    interval = args.seconds / n_waves

    def dripper():
        for wave in waves:
            wave.coalesce(1).write.mode("append").parquet(src)
            fed["n"] += 1
            time.sleep(interval)

    # ONE chained query, real processing-time trigger
    waves[0].limit(0).write.parquet(src)   # schema-only seed dir
    chained = stream_linked_spans(
        stream_dedup(
            stream_quality_gate(
                stream_pages(spark, src, max_files_per_trigger=2),
                lang="ko", min_quality=60, max_rep_ppm=600_000)),
        bc, entities)
    q = (chained.writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append")
         .trigger(processingTime="5 seconds").start())

    t_start = time.time()
    th = threading.Thread(target=dripper, daemon=True)
    th.start()
    th.join()
    # drain: keep running until three consecutive idle triggers.
    # Guard against a dead query (review finding): lastProgress
    # freezes at the last event when the query errors out, so polling
    # it alone spins forever — check liveness and surface the
    # exception instead.
    idle = 0
    deadline = time.time() + 600
    while idle < 3:
        time.sleep(5)
        if not q.isActive:
            raise RuntimeError(
                f"streaming query died during drain: {q.exception()}")
        if time.time() > deadline:
            q.stop()
            raise RuntimeError("drain did not reach 3 idle triggers "
                               "within 600s")
        p = q.lastProgress
        idle = idle + 1 if (p and p["numInputRows"] == 0) else 0
    n_batches = q.lastProgress["batchId"] + 1
    q.stop()
    wall = round(time.time() - t_start, 1)

    # ---- batch twins on the same window ----
    all_pages = None
    for wave in waves:
        all_pages = wave if all_pages is None else \
            all_pages.unionByName(wave)
    gated = (all_pages
             .where(lang_id(F.col("text")) == "ko")
             .where(quality_score(F.col("text")) >= 60)
             .where(duplicate_ngram_ppm(F.col("text"), n=2) <= 600_000))
    fp_of = {r.url: r.fp for r in
             gated.select("url", fingerprint("text").alias("fp"))
             .collect()}
    spans = spans_table(annotate_pages(gated, bc)) \
        .withColumnRenamed("word", "surface")
    batch_rows = {(r.url, r.start, r.end): (r.entity_id, r.link_level)
                  for r in link_mentions(spans, entities).collect()}
    fps_with_spans = {fp_of[u] for (u, _, _) in batch_rows}

    got = spark.read.parquet(out)
    got_rows = {(r.url, r.start, r.end): (r.entity_id, r.link_level)
                for r in got.collect()}
    got_urls = {u for (u, _, _) in got_rows}

    surv_by_fp: dict = {}
    for u in got_urls:
        surv_by_fp.setdefault(fp_of[u], []).append(u)
    checks = {
        "junk_gated_out": not any(u.startswith("junk://")
                                  for u in got_urls),
        "one_survivor_per_text": all(len(v) == 1
                                     for v in surv_by_fp.values()),
        "all_span_texts_represented": set(surv_by_fp) == fps_with_spans,
        "level01_rows_match_batch": all(
            got_rows[k] == batch_rows[k]
            for k in got_rows if batch_rows[k][1] in (0, 1)),
        "stream_levels_are_0_1_unlinked": all(
            v[1] in (0, 1, 5) for v in got_rows.values()),
        "span_sets_match": set(got_rows)
            == {k for k in batch_rows if k[0] in got_urls},
    }
    artifact = {
        "wall_sec": wall, "micro_batches": int(n_batches),
        "waves_fed": fed["n"], "rows_out": len(got_rows),
        "distinct_urls_out": len(got_urls),
        "parity": checks, "all_pass": all(checks.values()),
        "cpus": args.cpus,
    }
    Path("stream_continuity.json").write_text(json.dumps(artifact))
    print(json.dumps(artifact))
    spark.stop()
    return 0 if artifact["all_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
