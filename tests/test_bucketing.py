"""Bucketed co-located joins: two tables bucketed on the join key
must join without any Exchange (the 100 TB shuffle-elimination
strategy; see sources.catalog.write_bucketed)."""

import pytest
from pyspark.sql import functions as F

from python_mecab_ner_spark.sources.catalog import write_bucketed


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    users = spark.range(0, 2000).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 7).alias("segment"))
    events = spark.range(0, 10000).select(
        (F.col("id") % 2000).alias("user_id"),
        (F.col("id") * 3 % 100).alias("value"))
    write_bucketed(users, "bt_users", "user_id", n_buckets=8)
    write_bucketed(events, "bt_events", "user_id", n_buckets=8)
    yield "bt_users", "bt_events"
    spark.sql("DROP TABLE IF EXISTS bt_users")
    spark.sql("DROP TABLE IF EXISTS bt_events")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    u, e = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (spark.table(e).join(spark.table(u), "user_id")
                  .groupBy("segment").agg(F.sum("value").alias("v")))
        plan = _plan(joined)
        # join itself must read co-located buckets: no Exchange below
        # the SortMergeJoin (the only exchange allowed is the final
        # low-cardinality groupBy on segment)
        join_part = plan.split("SortMergeJoin")[0] if "SortMergeJoin" in plan \
            else plan
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning(user_id" not in plan, plan
        assert joined.count() == 7
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_results_match_unbucketed(spark, bucketed_tables):
    u, e = bucketed_tables
    got = (spark.table(e).join(spark.table(u), "user_id")
           .agg(F.sum("value").alias("s")).first().s)
    users = spark.range(0, 2000).select(F.col("id").alias("user_id"))
    events = spark.range(0, 10000).select(
        (F.col("id") % 2000).alias("user_id"),
        (F.col("id") * 3 % 100).alias("value"))
    want = (events.join(users, "user_id")
            .agg(F.sum("value").alias("s")).first().s)
    assert got == want
