"""ANN recall@k report: banded sign-LSH (corpus-scaled bits) and IVF
vs the exact brute-force top-k, over several query vectors.

Usage: python scripts/ann_recall.py [sf_dir] [n_queries] [k]
Prints a markdown table (pasted into BENCH.md) with per-method mean
recall@k and mean candidate-set size (the scan-pruning factor).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(sf_dir: str, n_queries: int = 8, k: int = 10) -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from python_mecab_ner_spark.operators.ann import (
        adaptive_bits, banded_sign_buckets, brute_force_topk, bucketed_topk,
        ivf_topk)

    spark = (SparkSession.builder.master("local[8]")
             .appName("ann-recall")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = e.count()
    bits = adaptive_bits(n)
    qrows = (e.filter(F.col("vec_id") < n_queries)
             .select("vec_id", "embedding").collect())

    # candidate-set size of the banded LSH per query = vectors sharing
    # any band with the query
    banded = banded_sign_buckets(e.select("vec_id", "embedding"), bits, 8)

    lsh_recall, lsh_cand, ivf_recall = [], [], []
    for r in qrows:
        qvec = [float(x) for x in r.embedding]
        exact = {x.vec_id for x in brute_force_topk(e, qvec, k=k).collect()}
        lsh = {x.vec_id for x in
               bucketed_topk(e, qvec, k=k, bits=bits, n_bands=8).collect()}
        ivf = {x.vec_id for x in
               ivf_topk(e, qvec, k=k, n_cells=16, n_probe=4).collect()}
        cand = (banded.join(
            banded.filter(F.col("vec_id") == r.vec_id)
            .select(F.col("band_idx").alias("qb"),
                    F.col("band_key").alias("qk")),
            (F.col("band_idx") == F.col("qb"))
            & (F.col("band_key") == F.col("qk")))
            .select("vec_id").distinct().count())
        lsh_recall.append(len(lsh & exact) / k)
        ivf_recall.append(len(ivf & exact) / k)
        lsh_cand.append(cand)

    mean = lambda xs: sum(xs) / len(xs)
    print(f"| method | recall@{k} | mean candidates | corpus | params |")
    print("|---|---|---|---|---|")
    print(f"| brute force | 1.000 | {n} | {n} | exact baseline |")
    print(f"| banded sign-LSH | {mean(lsh_recall):.3f} | "
          f"{mean(lsh_cand):.0f} | {n} | bits={bits} (adaptive), bands=8 |")
    print(f"| IVF | {mean(ivf_recall):.3f} | ~{n * 4 // 16} | {n} | "
          f"cells=16, probe=4 |")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1",
                  int(sys.argv[2]) if len(sys.argv) > 2 else 8,
                  int(sys.argv[3]) if len(sys.argv) > 3 else 10))
