"""Round-5 closeout additions: Borůvka minimum spanning forest
(q197) and the densest-subgraph greedy peel (q198).

Discipline as in test_mis_funnel.py: every test recomputes the
expected answer with plain Python on small randomized or hand-built
inputs, so the DuckDB oracles are not the only cross-check.
"""

import random

import pytest

from python_mecab_ner_spark.operators.graph import boruvka_mst


def _py_boruvka(edges):
    """Python twin of the deterministic round trajectory: per round,
    per-component min (w, a, b) edge, then merge."""
    es = {}
    for a, b, w in edges:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        es[k] = min(es.get(k, w), w)
    comp = {v: v for k in es for v in k}
    out = {}
    r = 0
    while True:
        r += 1
        cross = [(w, a, b) for (a, b), w in es.items()
                 if comp[a] != comp[b]]
        if not cross:
            break
        best = {}
        for w, a, b in cross:
            for c in (comp[a], comp[b]):
                if c not in best or (w, a, b) < best[c]:
                    best[c] = (w, a, b)
        winners = set(best.values())
        for w, a, b in winners:
            out[(a, b)] = (w, r)
        # contract: union the winner pairs (exact CC on winner graph)
        adj = {}
        for w, a, b in winners:
            adj.setdefault(comp[a], set()).add(comp[b])
            adj.setdefault(comp[b], set()).add(comp[a])
        lbl = {}
        for s in adj:
            if s in lbl:
                continue
            seen, stack = {s}, [s]
            while stack:
                u = stack.pop()
                for v in adj.get(u, ()):
                    if v not in seen:
                        seen.add(v)
                        stack.append(v)
            m = min(seen)
            for u in seen:
                lbl[u] = m
        comp = {v: lbl.get(c, c) for v, c in comp.items()}
        assert r < 64
    return out


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src bigint, dst bigint, w bigint")
    res = boruvka_mst(df, **kw).collect()
    return {(r["a"], r["b"]): (r["w"], r["mst_round"]) for r in res}


def test_mst_random_matches_python_twin(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(40), rng.randrange(40), rng.randrange(50))
             for _ in range(160)]
    got = _run(spark, edges)
    assert got == _py_boruvka(edges)


def test_mst_path_graph_one_round(spark):
    # increasing weights along a path: every node's min incident edge
    # is its left edge, so round 1 picks ALL edges and the winner
    # graph is one long chain — exercises the star-CC contraction
    edges = [(i, i + 1, 10 + i) for i in range(30)]
    got = _run(spark, edges)
    assert set(got) == {(i, i + 1) for i in range(30)}
    assert all(rnd == 1 for _, rnd in got.values())


def test_mst_total_weight_is_kruskal(spark):
    rng = random.Random(11)
    edges = [(rng.randrange(25), rng.randrange(25), rng.randrange(9))
             for _ in range(90)]
    got = _run(spark, edges)
    # independent check: Kruskal with the same (w, a, b) total order
    es = {}
    for a, b, w in edges:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        es[k] = min(es.get(k, w), w)
    parent = {v: v for k in es for v in k}

    def find(v):
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    kruskal = set()
    for w, a, b in sorted((w, a, b) for (a, b), w in es.items()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            kruskal.add((a, b))
    assert set(got) == kruskal
    assert sum(w for w, _ in got.values()) == sum(
        es[k] for k in kruskal)


def test_mst_disconnected_forest(spark):
    edges = [(0, 1, 5), (1, 2, 3), (10, 11, 7)]
    got = _run(spark, edges)
    assert set(got) == {(0, 1), (1, 2), (10, 11)}


def test_mst_budget_raises(spark):
    # 8-node path with DEcreasing weights: round 1 merges pairs only,
    # so 1 round cannot finish and the budget must raise, not truncate
    edges = [(i, i + 1, 100 - i) for i in range(8)]
    with pytest.raises(RuntimeError):
        _run(spark, edges, max_rounds=1)


def test_mst_negative_raises(spark):
    with pytest.raises(ValueError):
        _run(spark, [(0, 1, -3)])


def test_mst_empty(spark):
    df = spark.createDataFrame([], "src bigint, dst bigint, w bigint")
    assert boruvka_mst(df).count() == 0


# ---------------------------------------------------------------- densest

from python_mecab_ner_spark.operators.graph import densest_subgraph_peel


def _py_peel(edges, eps_num=1, eps_den=2, max_rounds=40):
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    rows = []
    for r in range(1, max_rounds + 1):
        m = len(es)
        if m == 0:
            break
        nodes = {v for k in es for v in k}
        n = len(nodes)
        rows.append((r, n, m, (1_000_000 * m) // n))
        thr = (2 * (eps_den + eps_num) * m) // (n * eps_den)
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        rm = {v for v, d in deg.items() if d <= thr}
        es = {(a, b) for a, b in es if a not in rm and b not in rm}
    best = max(rows, key=lambda t: (t[3], -t[0]))[0] if rows else 0
    return [(r, n, m, d, 1 if r == best else 0) for r, n, m, d in rows]


def _run_peel(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return sorted(tuple(r) for r in densest_subgraph_peel(df, **kw).collect())


def test_peel_random_matches_python_twin(spark):
    rng = random.Random(3)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(150)]
    assert _run_peel(spark, edges) == sorted(_py_peel(edges))


def test_peel_planted_clique_survives(spark):
    rng = random.Random(5)
    sparse = [(rng.randrange(100), rng.randrange(100)) for _ in range(120)]
    clique = [(200 + i, 200 + j) for i in range(8) for j in range(i)]
    edges = sparse + clique
    got = _run_peel(spark, edges)
    assert got == sorted(_py_peel(edges))
    best = [r for r in got if r[4] == 1]
    assert len(best) == 1
    # K8 density is 3.5; the greedy peel's best round is within the
    # 2(1+eps)=3 guarantee of the optimum, so well above the sparse
    # background's ~1.2
    assert best[0][3] >= 3_500_000 // 3


def test_peel_empty(spark):
    df = spark.createDataFrame([], "src bigint, dst bigint")
    assert densest_subgraph_peel(df).count() == 0
