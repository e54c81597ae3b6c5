"""Triple-level P/R gate: the distributed Spark pipeline vs the naive
pyref reference-semantics oracle, evaluated by the distributed eval
job itself."""

from pyspark.sql import functions as F

from python_mecab_ner_spark.operators.annotate import (annotate_pages,
                                                       triples_table)
from python_mecab_ner_spark.operators.metrics import (gold_triples_df,
                                                      prf_report)
from python_mecab_ner_spark.sources.corpus import pages_dataframe
from python_mecab_ner_spark.sources.gazetteer import broadcast_rows


def test_triple_prf_meets_gate(spark):
    pages = pages_dataframe(spark, 200, seed=13).select(
        "url", "warc_ts", "text", "lang")
    bc = broadcast_rows(spark)

    pred = triples_table(annotate_pages(pages, bc))
    gold = gold_triples_df(pages, bc)
    row = prf_report(pred, gold).first()

    assert row.n_gold > 0, "oracle produced no triples — corpus broken"
    assert row.precision >= 0.95 and row.recall >= 0.95, row
    # pinned vocabulary -> engines must agree exactly
    assert row.precision == 1.0 and row.recall == 1.0 and row.f1 == 1.0, row


def test_prf_counts_mismatches(spark):
    pred = spark.createDataFrame(
        [("u1", "a", "p", "b", 0, 2), ("u1", "x", "p", "y", 4, 6)],
        "url string, subj string, pred string, obj string, "
        "subj_start int, obj_start int")
    gold = pred.limit(1)
    row = prf_report(pred, gold).first()
    assert (row.n_pred, row.n_gold, row.tp) == (2, 1, 1)
    assert row.precision == 0.5 and row.recall == 1.0


def _bcubed_py(assign):
    """Exact python twin of bcubed_ppm's two-level integer floor."""
    from collections import Counter
    cs = Counter(c for _, c, _ in assign)
    gs = Counter(g for _, _, g in assign)
    pair = Counter((c, g) for _, c, g in assign)
    n = len(assign)
    pnum = sum((1_000_000 * cnt * cnt) // cs[c]
               for (c, g), cnt in pair.items())
    rnum = sum((1_000_000 * cnt * cnt) // gs[g]
               for (c, g), cnt in pair.items())
    p, r = pnum // n, rnum // n
    f1 = 0 if p + r == 0 else (2 * p * r) // (p + r)
    return (n, len(cs), len(gs), p, r, f1)


def test_bcubed_matches_python_twin(spark):
    from python_mecab_ner_spark.operators.metrics import bcubed_ppm

    # deterministic pseudo-random assignment: 120 items, 7 predicted
    # clusters, 5 gold classes, hash-derived so re-runs agree
    assign = [(i, (i * i + 3 * i) % 7, (i * 5 + 1) % 5 if i % 3 else 0)
              for i in range(120)]
    df = spark.createDataFrame(assign, "item int, cluster int, gold int")
    got = tuple(bcubed_ppm(df).first())
    assert got == _bcubed_py(assign)


def test_bcubed_perfect_and_degenerate(spark):
    from python_mecab_ner_spark.operators.metrics import bcubed_ppm

    # clusters == gold -> precision == recall == f1 == 1.0 (ppm)
    perfect = [(i, i % 4, i % 4) for i in range(40)]
    row = bcubed_ppm(spark.createDataFrame(
        perfect, "item int, cluster int, gold int")).first()
    assert (row.b3_precision_ppm, row.b3_recall_ppm,
            row.b3_f1_ppm) == (1_000_000, 1_000_000, 1_000_000)

    # everything in ONE cluster vs 8 singleton-ish gold classes:
    # recall perfect, precision = avg gold-class share
    lump = [(i, 0, i % 8) for i in range(64)]
    row = bcubed_ppm(spark.createDataFrame(
        lump, "item int, cluster int, gold int")).first()
    assert row.b3_recall_ppm == 1_000_000
    assert row.b3_precision_ppm == 125_000  # 8/64 per item
