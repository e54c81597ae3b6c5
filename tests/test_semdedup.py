"""SemDeDup (cluster-then-verify semantic dedup): numpy cross-check
with a hand-built codebook, cell locality, and the persist release."""

import math

import numpy as np
from pyspark.sql import functions as F

from python_mecab_ner_spark.operators.ann import ivf_cells, semdedup_pairs

RNG = np.random.RandomState(7)


def _vecs():
    """Two well-separated clusters of 10 vectors each (dim 8) with a
    planted near-dup pair inside each cluster and none across."""
    c0 = np.array([1, 0, 0, 0, 0, 0, 0, 0], dtype=float)
    c1 = np.array([0, 1, 0, 0, 0, 0, 0, 0], dtype=float)
    rows = []
    for i in range(10):
        base = c0 + 0.05 * RNG.randn(8)
        rows.append((i, base))
    for i in range(10, 20):
        base = c1 + 0.05 * RNG.randn(8)
        rows.append((i, base))
    # planted near-dups: 1 ~ 2 and 11 ~ 12 (tiny perturbation)
    rows[2] = (2, rows[1][1] + 0.001)
    rows[12] = (12, rows[11][1] + 0.001)
    return [(i, [float(x) for x in v]) for i, v in rows]


def _quant(v):
    return [max(-128, min(127, math.floor(round(x, 6) * 127))) for x in v]


def _expected_pairs(vecs, cells, threshold):
    got = {}
    for i, (ia, va) in enumerate(vecs):
        for ib, vb in vecs[i + 1:]:
            if cells[ia] != cells[ib]:
                continue
            qdot = sum(a * b for a, b in zip(_quant(va), _quant(vb)))
            if qdot >= threshold:
                got[(ia, ib)] = (cells[ia], qdot)
    return got


def test_semdedup_matches_numpy_bruteforce(spark):
    vecs = _vecs()
    df = spark.createDataFrame(vecs, "vec_id int, embedding array<double>")
    codebook = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
         (1, [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])],
        "cell_id int, cent_emb array<double>")
    cells = {r.vec_id: r.cell_id
             for r in ivf_cells(df, codebook=codebook).collect()}
    # the two planted clusters land in their own cells
    assert all(cells[i] == cells[0] for i in range(10))
    assert all(cells[i] == cells[10] for i in range(10, 20))

    threshold = 15500   # just below the planted-pair dot (~16.1k)
    out = semdedup_pairs(df, threshold=threshold, codebook=codebook)
    got = {(r.a, r.b): (r.cell_id, r.qdot) for r in out.collect()}
    out.unpersist_input()
    assert got == _expected_pairs(vecs, cells, threshold)
    # the planted near-dups are found
    assert (1, 2) in got and (11, 12) in got


def test_semdedup_never_crosses_cells(spark):
    vecs = _vecs()
    df = spark.createDataFrame(vecs, "vec_id int, embedding array<double>")
    codebook = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
         (1, [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])],
        "cell_id int, cent_emb array<double>")
    out = semdedup_pairs(df, threshold=-10**9, codebook=codebook)
    rows = out.collect()
    out.unpersist_input()
    # threshold disabled: exactly the within-cell pair count, no more
    assert len(rows) == 2 * (10 * 9 // 2)


def test_gram_matrix_finds_planted_dominant_direction(spark):
    """Gram reduce + client-side power iteration recover a planted
    dominant component: vectors = strong multiples of u plus small
    orthogonal noise -> the top eigenvector aligns with u."""
    import math
    import random

    import numpy as np

    from python_mecab_ner_spark.operators.ann import (dominant_component,
                                                      gram_matrix)
    dim = 8
    u = np.array([1.0, 2.0, -1.0, 0.5, 0.0, 3.0, -2.0, 1.5])
    u /= np.linalg.norm(u)
    rng = random.Random(5)
    rows = []
    for _ in range(200):
        coef = rng.uniform(0.5, 1.0)
        noise = np.array([rng.uniform(-0.05, 0.05) for _ in range(dim)])
        rows.append(([float(x) for x in coef * u + noise],))
    d = spark.createDataFrame(rows, "embedding array<float>")
    g = [(r.i, r.j, r.s) for r in gram_matrix(d).collect()]
    assert len(g) == dim * (dim + 1) // 2
    v = dominant_component(g, dim)
    cos = abs(float(np.dot(v, u)))
    assert cos > 0.99, cos
