"""Round-5 closeout additions: k-anonymity/l-diversity release audit
(q199) and the 2-D Pareto frontier (q200), each against a brute-force
Python twin on randomized inputs."""

import random

from pyspark.sql import functions as F

from python_mecab_ner_spark.operators.profile import k_anonymity_audit
from python_mecab_ner_spark.operators.sample import pareto_frontier


def test_k_anonymity_matches_brute_force(spark):
    rng = random.Random(2)
    rows = [(i, rng.randrange(6), rng.randrange(3), rng.randrange(4))
            for i in range(300)]
    df = spark.createDataFrame(
        rows, "id bigint, qa bigint, qb bigint, sens bigint")
    got = {(r["metric"], r["threshold"]):
           (r["groups_flagged"], r["rows_flagged"], r["rows_ppm"])
           for r in k_anonymity_audit(
               df, ["qa", "qb"], F.col("sens")).collect()}
    groups = {}
    for _, qa, qb, s in rows:
        groups.setdefault((qa, qb), []).append(s)
    tot = len(rows)
    exp = {}
    for k in (2, 5, 10):
        fl = [g for g in groups.values() if len(g) < k]
        exp[("k_anonymity", k)] = (
            len(fl), sum(map(len, fl)),
            sum(map(len, fl)) * 1_000_000 // tot)
    for l in (2, 3):
        fl = [g for g in groups.values() if len(set(g)) < l]
        exp[("l_diversity", l)] = (
            len(fl), sum(map(len, fl)),
            sum(map(len, fl)) * 1_000_000 // tot)
    assert got == exp


def _py_frontier(pts):
    out = set()
    for i, (px, py) in pts.items():
        dominated = any(
            qx >= px and qy >= py and (qx > px or qy > py)
            for j, (qx, qy) in pts.items() if j != i)
        if not dominated:
            out.add(i)
    return out


def _frontier_case(spark, pts):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in pts.items()],
        "id bigint, x bigint, y bigint")
    got = {r["id"] for r in pareto_frontier(df, "id", "x", "y",
                                            n_buckets=8).collect()}
    assert got == _py_frontier(pts)


def test_pareto_random(spark):
    rng = random.Random(9)
    pts = {i: (rng.randrange(30), rng.randrange(30))
           for i in range(250)}
    _frontier_case(spark, pts)


def test_pareto_duplicate_points_all_survive(spark):
    # co-located maxima are mutually undominated: every copy survives
    pts = {0: (10, 10), 1: (10, 10), 2: (10, 9), 3: (9, 10),
           4: (5, 20), 5: (20, 5), 6: (1, 1)}
    _frontier_case(spark, pts)


def test_pareto_anticorrelated_chain(spark):
    # a strict staircase: every point is on the frontier
    pts = {i: (i, 100 - i) for i in range(40)}
    _frontier_case(spark, pts)
