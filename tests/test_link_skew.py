"""Head-entity skew robustness of the link job (round-4 verdict task):
with one gazetteer entity injected into ~50% of Korean docs, the plan
must have no shuffle join keyed on an entity-valued column — entity
dimensions ride broadcast joins (skew-immune: the skewed key never
shuffles), and the only sort-merge joins key on the mention INSTANCE
(url, start, end), which spreads the skewed entity across distinct
urls.  AQE skew-join stays on as the runtime backstop.

The measured wall-clock companion is scripts/bench_link.py
--skew-pct 0.5 (table in BENCH_EXTRAS.md: 19.3s vs 18.2s uniform at
50k docs = 1.06x)."""

import re

from pyspark.sql import functions as F

from python_mecab_ner_spark.plans.pipeline import extract_graph
from python_mecab_ner_spark.sources.corpus import pages_dataframe

SKEW_ENTITY = "미국"


def test_skewed_link_plan_has_no_entity_keyed_shuffle_join(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get(
        "spark.sql.adaptive.skewJoin.enabled") == "true"

    pages = pages_dataframe(spark, 1500, seed=42,
                            skew=(SKEW_ENTITY, 0.5))
    g = extract_graph(spark, pages, canonicalize=False,
                      kb_holdout_mod=20)
    try:
        plan = g["linked"]._jdf.queryExecution().executedPlan() \
            .toString()
        shuffle_joins = re.findall(
            r"(?:SortMergeJoin|ShuffledHashJoin) \[([^\]]*)\]", plan)
        assert plan.count("BroadcastHashJoin") > 0
        assert shuffle_joins, "expected some mention-instance joins"
        for keys in shuffle_joins:
            # first (leading) join key must be the doc url — the
            # mention-instance composite key; an entity/surface-keyed
            # shuffle join would concentrate the skewed entity on one
            # partition
            assert keys.split(",")[0].strip().startswith("url#"), keys

        # the skew is real: the injected entity appears in >=40% of
        # linked korean docs and still links (level 0 exact match)
        linked = g["linked"]
        n_docs = pages.where(F.col("lang") == "ko").count()
        hits = (linked.where(F.col("surface") == SKEW_ENTITY)
                .select("url").distinct().count())
        assert hits >= int(0.4 * n_docs)
    finally:
        g["release"]()
