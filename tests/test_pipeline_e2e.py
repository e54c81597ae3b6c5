"""Full-pipeline e2e on a small synthesized corpus + resume semantics."""

import pytest

from python_mecab_ner_spark.plans.pipeline import extract_graph, run_pipeline
from python_mecab_ner_spark.sources.corpus import pages_dataframe


@pytest.fixture(scope="module")
def graph(spark):
    pages = pages_dataframe(spark, 150, seed=3, partitions=4)
    return extract_graph(spark, pages, canonicalize=False)


def test_linked_spans(graph):
    linked = graph["linked"]
    rows = linked.collect()
    assert rows
    # every exact-surface span links at level 0
    lvl0 = [r for r in rows if r.link_level == 0]
    assert len(lvl0) > 0
    for r in rows:
        assert r.link_level in (0, 1, 2, 3)


def test_edges_have_entities(graph):
    edges = graph["edges"].collect()
    assert edges
    for e in edges[:50]:
        assert e.src_id is not None and e.dst_id is not None
        assert e.pred


def test_vertices_join_entities(graph):
    v = graph["vertices"]
    assert v.filter("canonical is null").count() == 0
    assert v.count() == v.select("entity_id").distinct().count()


def test_run_pipeline_resume(spark, tmp_path):
    out = str(tmp_path / "kg")
    pages = pages_dataframe(spark, 60, seed=5, partitions=2)
    info1 = run_pipeline(spark, pages, out, n_parts=8, canonicalize=False)
    assert info1["annotated_rows"] == 60

    # resume: second run must skip all completed partitions (the
    # annotate fn would crash on any new input row)
    def boom(_):
        raise AssertionError("stage re-ran on completed partitions")

    from python_mecab_ner_spark.plans.lineage import run_stage
    annotated = run_stage(spark, "annotate", pages, boom, out,
                          key_col="url", n_parts=8)
    assert annotated.count() == 60

    from python_mecab_ner_spark.plans.lineage import metrics_table
    m = metrics_table(spark, out)
    assert m.filter("stage = 'annotate'").count() == 8  # one row per part_key
    assert m.filter("rows_out <= 0").count() == 0


def test_run_stage_executes_fn_once(spark, tmp_path):
    """The stage fn's plan must execute exactly once (the write): the
    manifest is derived from written partition dirs, never by
    re-running the (expensive) stage DAG.  Counted via an accumulator
    inside a mapInPandas in fn — with double-compute it would read
    2x the input rows."""
    import pandas as pd
    from pyspark.sql import functions as F

    from python_mecab_ner_spark.plans.lineage import run_stage

    acc = spark.sparkContext.accumulator(0)
    n_rows = 40
    inp = spark.range(n_rows).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        (F.col("id") * 2).alias("val"))

    def fn(df):
        def count_rows(batches):
            for pdf in batches:
                acc.add(len(pdf))
                yield pdf
        return df.mapInPandas(count_rows, schema=df.schema)

    out = run_stage(spark, "s1", inp, fn, str(tmp_path / "once"),
                    key_col="url", n_parts=4)
    assert out.count() == n_rows
    assert acc.value == n_rows, f"stage fn processed {acc.value} rows, expected {n_rows}"
