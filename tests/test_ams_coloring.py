"""Round-5 continuation: AMS F2 sketch (q204) and iterated-MIS
greedy coloring (q205), against brute-force Python twins."""

import hashlib
import random
from collections import Counter

import pytest

from python_mecab_ner_spark.operators.graph import mis_coloring
from python_mecab_ner_spark.operators.sketch import ams_f2


def _md5int(s, salt=""):
    return int(hashlib.md5((salt + s).encode()).hexdigest()[:15], 16)


def test_ams_f2_matches_python_twin(spark):
    rng = random.Random(4)
    words = [f"w{rng.randrange(25)}" for _ in range(400)]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r["est_id"]: (r["z_sum"], r["est_f2"], r["exact_f2"],
                         r["mean_f2"], r["err_ppm"])
           for r in ams_f2(df, "word", k=8).collect()}
    counts = Counter(words)
    exact = sum(c * c for c in counts.values())
    zs = [sum(1 if _md5int(w, f"ams{i}:") % 2 == 0 else -1
              for w in words) for i in range(8)]
    mean = sum(z * z for z in zs) // 8
    exp = {i: (z, z * z, exact, mean,
               abs(z * z - exact) * 1_000_000 // exact)
           for i, z in enumerate(zs)}
    assert got == exp
    # the mean estimator is unbiased; with k=8 it should land within
    # a factor of ~3 of exact on this input (sanity, not the contract)
    assert exact // 4 < mean < exact * 4


def _pri(v):
    return hashlib.md5(str(v).encode()).hexdigest() + "#" + str(v)


def _py_coloring(edges):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    remaining = set(adj)
    out, color = {}, 0
    while remaining:
        color += 1
        active = {v for v in remaining
                  if adj[v] & remaining}  # edge-bearing nodes
        isolated = remaining - active
        mis = set()
        while active:
            win = {v for v in active
                   if all(_pri(v) < _pri(u)
                          for u in adj[v] if u in active)}
            mis |= win
            rem = set()
            for w in win:
                rem |= adj[w] & active
            active -= win | rem
        for v in mis | isolated:
            out[v] = color
        remaining -= mis | isolated
        assert color < 64
    return out


def _run_coloring(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {r["node"]: r["color"]
            for r in mis_coloring(df, **kw).collect()}


def test_coloring_random_matches_python(spark):
    rng = random.Random(17)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(80)]
    got = _run_coloring(spark, edges)
    assert got == _py_coloring(edges)
    # proper coloring: no monochromatic edge
    for a, b in edges:
        if a != b:
            assert got[a] != got[b]


def test_coloring_star_two_colors(spark):
    edges = [(0, i) for i in range(1, 12)]
    got = _run_coloring(spark, edges)
    assert got == _py_coloring(edges)
    assert len(set(got.values())) == 2  # hub one color, leaves other


def test_coloring_budget_raises(spark):
    # K4 needs 4 colors; a 2-color budget must raise, not truncate
    edges = [(i, j) for i in range(4) for j in range(i)]
    with pytest.raises(RuntimeError):
        _run_coloring(spark, edges, max_colors=2)


def test_coloring_empty(spark):
    df = spark.createDataFrame([], "src bigint, dst bigint")
    assert mis_coloring(df).count() == 0
