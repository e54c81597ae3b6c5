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
