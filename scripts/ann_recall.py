"""ANN recall@k report: banded sign-LSH (single-probe and
query-directed multi-probe) and IVF vs the exact brute-force top-k,
over several query vectors.

Usage: python scripts/ann_recall.py [sf_dir|clustered:<n>] [n_queries] [k]
Prints a markdown table (pasted into BENCH.md) with per-method mean
recall@k and mean candidate-set size / scan fraction.

The first arg accepts `clustered:<n_vecs>` to run against the
mixture-of-32-Gaussians synthetic payload
(sources.corpus.clustered_embeddings) instead of the near-isotropic
testdata table — the frontier real encoders would see (round-3
verdict task 7).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(sf_dir: str, n_queries: int = 8, k: int = 10) -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from python_mecab_ner_spark.operators.ann import (
        MULTIPROBE_PAIRS, MULTIPROBE_SINGLES, adaptive_bits,
        banded_sign_buckets, brute_force_topk, bucketed_topk, ivf_topk,
        probe_keys, probes_per_band)

    spark = (SparkSession.builder.master("local[8]")
             .appName("ann-recall")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    if sf_dir.startswith("clustered:"):
        from python_mecab_ner_spark.sources.corpus import clustered_embeddings
        e = clustered_embeddings(spark, int(sf_dir.split(":", 1)[1])).cache()
    else:
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n = e.count()
    n_bands = 8
    dim = len(e.select("embedding").first()[0])
    bits1 = adaptive_bits(n)                       # single-probe width
    ppb = probes_per_band()
    bits_mp = adaptive_bits(n * ppb,               # probe-aware width
                            max_bits=max(1, min(16, dim // n_bands)))

    qrows = (e.filter(F.col("vec_id") < n_queries)
             .select("vec_id", "embedding").collect())

    def cand_count(qvec, bits, multiprobe):
        """vectors colliding with the query in ANY probed bucket"""
        banded = banded_sign_buckets(e.select("vec_id", "embedding"),
                                     bits, n_bands)
        t1, t2 = multiprobe if multiprobe else (0, 0)
        probes = [(b, key) for b in range(n_bands)
                  for key in probe_keys(qvec, b, bits, n_bands, t1, t2)]
        pdf = spark.createDataFrame(probes, "band_idx int, band_key int")
        return (banded.join(F.broadcast(pdf), ["band_idx", "band_key"])
                .select("vec_id").distinct().count())

    res = {"lsh1": [], "lshmp": [], "ivf": []}
    cands = {"lsh1": [], "lshmp": []}
    for r in qrows:
        qvec = [float(x) for x in r.embedding]
        exact = {x.vec_id for x in brute_force_topk(e, qvec, k=k).collect()}
        one = {x.vec_id for x in
               bucketed_topk(e, qvec, k=k, bits=bits1, n_bands=n_bands,
                             multiprobe=None).collect()}
        mp = {x.vec_id for x in
              bucketed_topk(e, qvec, k=k, bits=bits_mp,
                            n_bands=n_bands).collect()}
        ivf = {x.vec_id for x in
               ivf_topk(e, qvec, k=k, n_cells=16, n_probe=4).collect()}
        res["lsh1"].append(len(one & exact) / k)
        res["lshmp"].append(len(mp & exact) / k)
        res["ivf"].append(len(ivf & exact) / k)
        cands["lsh1"].append(cand_count(qvec, bits1, None))
        cands["lshmp"].append(cand_count(qvec, bits_mp,
                                         (MULTIPROBE_SINGLES,
                                          MULTIPROBE_PAIRS)))

    mean = lambda xs: sum(xs) / len(xs)
    c1, cmp_ = mean(cands["lsh1"]), mean(cands["lshmp"])
    print(f"| method | recall@{k} | mean candidates (scan frac) | corpus | params |")
    print("|---|---|---|---|---|")
    print(f"| brute force | 1.000 | {n} (1.00) | {n} | exact baseline |")
    print(f"| banded sign-LSH single-probe | {mean(res['lsh1']):.3f} | "
          f"{c1:.0f} ({c1 / n:.2f}) | {n} | bits={bits1} (adaptive), bands={n_bands} |")
    print(f"| banded sign-LSH multi-probe | {mean(res['lshmp']):.3f} | "
          f"{cmp_:.0f} ({cmp_ / n:.2f}) | {n} | bits={bits_mp} (probe-aware), "
          f"bands={n_bands}, T1={MULTIPROBE_SINGLES}, T2={MULTIPROBE_PAIRS} |")
    print(f"| IVF (seeded k-means codebook) | {mean(res['ivf']):.3f} | "
          f"~{n * 4 // 16} ({4 / 16:.2f}) | {n} | cells=16, probe=4 |")

    # IVF recall-vs-probe sweep (same trained codebook, the n_probe
    # knob buys recall linearly in scan fraction)
    from python_mecab_ner_spark.operators.ann import kmeans_codebook
    cb = kmeans_codebook(e, 16)
    print()
    print("| IVF n_probe | recall@10 | scan frac |")
    print("|---|---|---|")
    for npr in (2, 4, 6, 8):
        rec = []
        for r in qrows:
            qvec = [float(x) for x in r.embedding]
            exact = {x.vec_id for x in
                     brute_force_topk(e, qvec, k=k).collect()}
            ivf = {x.vec_id for x in
                   ivf_topk(e, qvec, k=k, n_cells=16, n_probe=npr,
                            codebook=cb).collect()}
            rec.append(len(ivf & exact) / k)
        print(f"| {npr} | {mean(rec):.3f} | {npr / 16:.2f} |")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1",
                  int(sys.argv[2]) if len(sys.argv) > 2 else 8,
                  int(sys.argv[3]) if len(sys.argv) > 3 else 10))
