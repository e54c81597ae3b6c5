"""spark-submit entrypoint for the KG-construction pipeline
(north_rule run mode: ``spark-submit --py-files pkg.zip
scripts/submit_pipeline.py ...``).

The package zip is built by scripts/make_pyfiles_zip.py; on a real
cluster the same command just swaps --master:

  python scripts/make_pyfiles_zip.py
  spark-submit --master local[8] \
      --py-files dist/python_mecab_ner_spark.zip \
      scripts/submit_pipeline.py \
      --input synthetic:5000 --out /tmp/kg_out

Resume: re-running with the same --out skips completed partitions
(plans.lineage manifest anti-join) and prints per-stage metrics.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="pages parquet dir, or synthetic:<n_docs>")
    ap.add_argument("--out", required=True, help="output/checkpoint dir")
    ap.add_argument("--parts", type=int, default=32,
                    help="lineage partition count (resume granularity)")
    ap.add_argument("--wave-parts", type=int, default=None,
                    help="commit the annotate stage in waves of this many "
                         "part_keys (bounded failure blast radius; a kill "
                         "loses at most one wave — see plans/lineage.py)")
    ap.add_argument("--refresh", action="store_true",
                    help="incremental recompute: fingerprint the input per "
                         "partition and re-run ONLY partitions whose input "
                         "changed (recrawl refresh; see plans/lineage.py)")
    ap.add_argument("--no-canonicalize", action="store_true")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.appName("kg-construct")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from python_mecab_ner_spark.plans.pipeline import run_pipeline
    from python_mecab_ner_spark.sources.corpus import pages_dataframe

    if args.input.startswith("synthetic:"):
        n = int(args.input.split(":", 1)[1])
        pages = pages_dataframe(spark, n, seed=args.seed)
    else:
        pages = spark.read.parquet(args.input)

    info = run_pipeline(spark, pages, args.out, n_parts=args.parts,
                        canonicalize=not args.no_canonicalize,
                        wave_parts=args.wave_parts, refresh=args.refresh)
    print(json.dumps(info))

    from python_mecab_ner_spark.plans.lineage import metrics_table
    metrics = metrics_table(spark, args.out)
    if metrics is not None:
        metrics.show(50, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
