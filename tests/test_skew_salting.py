"""Computed skew handling (operators.graph): head keys are detected
from measured frequencies, their rows spread over multiple salts, and
cold keys stay single-partition (salt 0)."""

from pyspark.sql import functions as F

from python_mecab_ner_spark.operators.graph import add_salt, detect_head_keys


def _skewed_edges(spark):
    # one head entity with 5000 edges, 50 cold entities with 10 each
    head = spark.range(0, 5000).select(
        F.lit(1).alias("src_id"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"))
    cold = spark.range(0, 500).select(
        (F.col("id") % 50 + 100).alias("src_id"),
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("url"))
    return head.unionByName(cold)


def test_head_detection_is_computed(spark):
    edges = _skewed_edges(spark)
    heads = detect_head_keys(edges, "src_id", head_threshold=8.0)
    assert [r.src_id for r in heads.collect()] == [1]


def test_salting_spreads_only_head_keys(spark):
    edges = _skewed_edges(spark)
    heads = detect_head_keys(edges, "src_id", head_threshold=8.0)
    salted = add_salt(edges, heads, n_salt=16)
    totals = salted.groupBy("src_id").agg(
        F.countDistinct("salt").alias("n_salts"),
        F.count("*").alias("total"))
    per_salt_max = (salted.groupBy("src_id", "salt")
                    .agg(F.count("*").alias("per_salt"))
                    .groupBy("src_id")
                    .agg(F.max("per_salt").alias("mx")))
    dist = {r.src_id: (r.n_salts, r.mx / r.total)
            for r in totals.join(per_salt_max, "src_id").collect()}
    # head key spread across all 16 salts, no salt holding > 15%
    n_salts, max_share = dist[1]
    assert n_salts == 16 and max_share < 0.15
    # cold keys untouched (single salt 0)
    assert all(n == 1 for k, (n, _) in dist.items() if k != 1)
    assert salted.filter("src_id != 1 AND salt != 0").count() == 0


def test_pagerank_int_star_graph(spark):
    """Center of a star gets the highest rank; leaves tie exactly
    (integer arithmetic -> bit-exact equality, no float fuzz)."""
    from python_mecab_ner_spark.operators.graph import pagerank_int
    edges = [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)]
    e = spark.createDataFrame(edges, "src long, dst long")
    pr = {r.node: r.pr for r in pagerank_int(e, iters=3).collect()}
    assert len(pr) == 6
    leaves = {pr[i] for i in range(1, 6)}
    assert len(leaves) == 1          # exact tie
    assert pr[0] > leaves.pop()      # hub dominates
