"""Benchmark harness: headline KG-pipeline throughput + operator queries.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "docs_per_sec": ..., "triples_per_sec": ...}

The kg_pipeline entry is the headline: synthesized pages corpus sized
to the scale factor (sf0.1 -> 50,000 docs) through the fused annotate
stage to materialized triple counts.  Scaling-efficiency evidence
(local[8] vs local[32]) lives in scripts/bench_scaling.py -> BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
N_DOCS = max(500, int(500_000 * SF))  # sf0.1 -> 50,000 docs

BENCH_QUERIES = [
    "q01_pricing_summary", "q02_region_revenue", "q04_event_islands",
    "q05_nearest_click", "q08_word_freq", "q09_neighbor_window",
    "q16_jaccard_pairs", "q17_lsh_pairs", "q18_simhash",
    "q20_ann_bruteforce", "q21_ann_lsh", "q43_dup_argmax",
    "q44_evidence_scores", "q48_line_dedup", "q50_bigram_pmi",
    "q54_window_dedup",
    # round 4 additions (comparisons vs earlier rounds use the shared
    # subset, as in VERDICT r3's like-for-like table)
    "q147_bcubed_eval", "q148_encoding_audit", "q149_ngram_diversity",
    "q154_modularity", "q157_edge_cut", "q160_contrastive_pairs",
    "q161_wl_classes",
]


def build_spark(cpus: int):
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master(f"local[{cpus}]")
            .appName("python-mecab-ner-spark-bench")
            .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.driver.memory", "48g")
            .config("spark.ui.enabled", "false")
            .getOrCreate())


REPEATS = 3


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def run_kg_pipeline(spark, n_docs: int) -> dict:
    """Headline: pages (from storage) -> annotate -> triple counts.

    The corpus is materialized to parquet first (reported separately
    as gen_sec): the production job reads Iceberg, it does not
    synthesize input, and measuring from storage keeps the annotate
    stage a single Python-worker layer (chained mapInPandas would
    double the Python processes per task slot).  Median of REPEATS
    runs, each on fresh lineage (a no-op filter salt defeats
    shuffle-stage reuse across repeats)."""
    import tempfile

    from pyspark.sql import functions as F

    from python_mecab_ner_spark.operators.annotate import annotate_pages
    from python_mecab_ner_spark.sources.corpus import pages_dataframe
    from python_mecab_ner_spark.sources.gazetteer import broadcast_rows

    corpus = f"{tempfile.gettempdir()}/kg_bench_corpus_v3_{n_docs}"  # v3: level-5 novel-compound docs added in round 3
    t0 = time.time()
    if not Path(corpus, "_SUCCESS").exists():
        (pages_dataframe(spark, n_docs, seed=42,
                         partitions=spark.sparkContext.defaultParallelism * 2)
         .select("url", "warc_ts", "text", "lang")
         .write.mode("overwrite").parquet(corpus))
    gen_sec = time.time() - t0

    par = spark.sparkContext.defaultParallelism
    input_bytes = sum(f.stat().st_size for f in Path(corpus).glob("*.parquet"))
    spark.conf.set("spark.sql.files.maxPartitionBytes",
                   str(max(1 << 20, input_bytes // (par * 2))))
    pages = spark.read.parquet(corpus)
    bc = broadcast_rows(spark)
    # warmup: spawn the Python workers + build the per-worker automaton
    # so the measured run is steady-state (matches bench_scaling.py)
    annotate_pages(pages.limit(2000).repartition(par), bc) \
        .agg(F.count("*")).collect()
    walls, agg = [], None
    for i in range(REPEATS):
        p = pages.where(F.col("url") != F.lit(f"zz{i}"))
        t0 = time.time()
        ann = annotate_pages(p, bc)
        agg = ann.agg(F.count("*").alias("docs"),
                      F.sum(F.size("triples")).alias("triples"),
                      F.sum(F.size("mentions")).alias("mentions")).collect()[0]
        walls.append(time.time() - t0)
    wall = _median(walls)
    return {"sec": wall, "spread": round(max(walls) - min(walls), 3),
            "gen_sec": gen_sec, "docs": int(agg.docs),
            "triples": int(agg.triples), "mentions": int(agg.mentions),
            "docs_per_sec": agg.docs / wall,
            "triples_per_sec": agg.triples / wall}


def main() -> int:
    import __spark_entry__ as entrymod

    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    kg = run_kg_pipeline(spark, N_DOCS)
    timings["kg_pipeline"] = round(kg["sec"], 3)

    qs = entrymod.queries()
    # warmup pass at the smallest sf: first-use whole-stage codegen /
    # JIT / parquet-footer caching happens once per query SHAPE, and
    # a throughput benchmark should report the steady-state cost
    for name in BENCH_QUERIES:
        qs[name](spark, SF_DIR.replace(f"sf{SF}", "sf0.001")) \
            .write.format("noop").mode("overwrite").save()
    # median-of-REPEATS per query with a dispersion field: this box is
    # a shared host with heavy run-to-run variance (observed 4x swings
    # on UNCHANGED queries; the round-2 driver artifact inverted the
    # q16 story on a single noisy pass).  The median is robust to one
    # outlier and the spread makes a noisy run visible IN the artifact.
    spread: dict[str, float] = {"kg_pipeline": kg["spread"]}
    for name in BENCH_QUERIES:
        runs = []
        for _ in range(REPEATS):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        timings[name] = round(_median(runs), 3)
        spread[name] = round(max(runs) - min(runs), 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "kg_pipeline+operator_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "repeats": REPEATS,
        "sf": SF,
        "kg_gen_sec": round(kg["gen_sec"], 3),
        "kg_docs": kg["docs"],
        "kg_triples": kg["triples"],
        "kg_mentions": kg["mentions"],
        "docs_per_sec": round(kg["docs_per_sec"], 1),
        "triples_per_sec": round(kg["triples_per_sec"], 1),
        "cpus": CPUS,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
