"""Round-5 gap fills: deterministic maximal matching (q188),
taxonomy layering + ancestor closure (q187), and the integer CUSUM
change-point (q189).

Discipline as in test_mis_funnel.py: every test recomputes the
expected answer with plain Python on small randomized or hand-built
inputs, so the DuckDB oracles are not the only cross-check.
"""

import datetime
import hashlib
import random

import pytest

from python_mecab_ner_spark.operators.graph import (dag_layers,
                                                    maximal_matching)
from python_mecab_ner_spark.operators.spans import cusum_changepoint


def _epri(a, b):
    return (hashlib.md5(f"{a}#{b}".encode()).hexdigest()
            + f"#{a}#{b}")


def _py_matching(edges):
    """Python twin of the deterministic round trajectory."""
    act = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    out, r = {}, 0
    while act:
        r += 1
        mn = {}
        for a, b in act:
            p = _epri(a, b)
            for n in (a, b):
                if n not in mn or p < mn[n]:
                    mn[n] = p
        win = {(a, b) for a, b in act
               if _epri(a, b) == mn[a] and _epri(a, b) == mn[b]}
        out.update(((a, b), r) for a, b in win)
        matched = {n for e in win for n in e}
        act = {e for e in act
               if e[0] not in matched and e[1] not in matched}
    return out


def test_matching_random_graph_matches_python_twin(spark):
    rng = random.Random(41)
    edges = list({(rng.randrange(60), rng.randrange(60))
                  for _ in range(150)})
    edges = [(a, b) for a, b in edges if a != b]
    want = _py_matching(edges)
    got = {(r.a, r.b): r.match_round
           for r in maximal_matching(
               spark.createDataFrame(edges, ["src", "dst"])).collect()}
    assert got == want  # round trajectory, not just the final set
    # matching property: no node appears twice
    nodes = [n for e in got for n in e]
    assert len(nodes) == len(set(nodes))
    # maximality: every input edge touches a matched node
    matched = set(nodes)
    assert all(a in matched or b in matched for a, b in edges)


def test_matching_raises_on_round_exhaustion(spark):
    edges = [(i, i + 1) for i in range(40)]  # path needs >1 round
    df = spark.createDataFrame(edges, ["src", "dst"])
    with pytest.raises(Exception, match="max_rounds"):
        maximal_matching(df, max_rounds=1).collect()


def test_matching_self_loops_only(spark):
    df = spark.createDataFrame([(1, 1)], ["src", "dst"])
    assert maximal_matching(df).collect() == []


def _py_layers(edges):
    """Longest upward path + distinct ancestor closure."""
    parents = {}
    nodes = set()
    for c, p in edges:
        parents.setdefault(c, set()).add(p)
        nodes |= {c, p}
    layer, anc = {}, {}

    def go(v, stack=()):
        if v in layer:
            return
        assert v not in stack, "cycle"
        ps = parents.get(v, set())
        for p in ps:
            go(p, stack + (v,))
        layer[v] = 1 + max((layer[p] for p in ps), default=-1)
        anc[v] = set(ps)
        for p in ps:
            anc[v] |= anc[p]

    for v in nodes:
        go(v)
    return {v: (layer[v], len(anc[v])) for v in nodes}


def test_dag_layers_known_reconvergent_shape(spark):
    # diamond + tail: d -> b -> a, d -> c -> a, a -> r; e -> d
    edges = [("d", "b"), ("d", "c"), ("b", "a"), ("c", "a"),
             ("a", "r"), ("e", "d")]
    got = {r.node: (r.layer, r.n_ancestors)
           for r in dag_layers(
               spark.createDataFrame(edges, ["child", "parent"]))
           .collect()}
    assert got == {"r": (0, 0), "a": (1, 1), "b": (2, 2), "c": (2, 2),
                   "d": (3, 4),   # b, c, a, r — a/r counted ONCE
                   "e": (4, 5)}


def test_dag_layers_random_dag_twin(spark):
    rng = random.Random(7)
    # random DAG: edges only low -> high id, so acyclic by construction
    edges = list({(rng.randrange(30), rng.randrange(30))
                  for _ in range(120)})
    edges = [(a, b) for a, b in edges if a < b]
    want = _py_layers(edges)
    got = {r.node: (r.layer, r.n_ancestors)
           for r in dag_layers(
               spark.createDataFrame(edges, ["child", "parent"]))
           .collect()}
    assert got == want


def test_dag_layers_cycle_raises(spark):
    edges = [(1, 2), (2, 3), (3, 1), (4, 1)]
    df = spark.createDataFrame(edges, ["child", "parent"])
    with pytest.raises(Exception, match="cycle"):
        dag_layers(df).collect()


def test_dag_layers_without_ancestors(spark):
    edges = [(1, 2), (2, 3)]
    got = {r.node: (r.layer, r.n_ancestors)
           for r in dag_layers(
               spark.createDataFrame(edges, ["child", "parent"]),
               count_ancestors=False).collect()}
    assert got == {3: (0, -1), 2: (1, -1), 1: (2, -1)}


def _py_cusum(rows):
    daily = {}
    for key, ts in rows:
        d = ts.strftime("%Y-%m-%d")
        daily[(key, d)] = daily.get((key, d), 0) + 1
    out = {}
    bykey = {}
    for (key, d), c in daily.items():
        bykey.setdefault(key, []).append((d, c))
    for key, days in bykey.items():
        days.sort()
        total = sum(c for _, c in days)
        n = len(days)
        s, best = 0, None
        for t, (d, c) in enumerate(days, start=1):
            s += c
            ct = abs(n * s - t * total)
            # packed max, earliest-split tie-break
            if best is None or (ct, -t) > (best[0], -best[1]):
                best = (ct, t, d)
        out[key] = (n, total, best[2], best[1], best[0])
    return out


def test_cusum_random_twin(spark):
    rng = random.Random(13)
    t0 = datetime.datetime(2024, 3, 1)
    rows = [("k%d" % rng.randrange(4),
             t0 + datetime.timedelta(hours=rng.randrange(24 * 20)))
            for _ in range(500)]
    df = spark.createDataFrame([(k, t, "x") for k, t in rows],
                               ["key", "ts", "pad"])
    got = {r.key: (r.n_days, r.total, r.change_day, r.t_split,
                   r.cusum_stat)
           for r in cusum_changepoint(df, "ts", "key").collect()}
    assert got == _py_cusum(rows)


def test_cusum_detects_planted_level_shift(spark):
    # 30 days at 2/day then 30 days at 10/day: split lands on day 30
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for d in range(60):
        for i in range(2 if d < 30 else 10):
            rows.append(("k", t0 + datetime.timedelta(days=d, hours=i)))
    df = spark.createDataFrame([(k, t, "x") for k, t in rows],
                               ["key", "ts", "pad"])
    r = cusum_changepoint(df, "ts", "key").collect()[0]
    assert r.t_split == 30 and r.change_day == "2024-01-30"
    assert r.n_days == 60 and r.total == 360


def _py_betweenness(edges, roots, radius=3, scale=1_000_000):
    adj = {}
    for a, b in set(edges):
        if a != b:
            adj.setdefault(a, set()).add(b)
    out_nroots, out_bw = {}, {}
    for s in roots:
        # forward BFS with path counts
        levels = [{s: 1}]
        seen = {s}
        for _ in range(radius):
            nxt = {}
            for v, sig in levels[-1].items():
                for w in adj.get(v, ()):
                    nxt[w] = nxt.get(w, 0) + sig
            nxt = {w: c for w, c in nxt.items() if w not in seen}
            seen |= set(nxt)
            levels.append(nxt)
        delta = {v: 0 for v in levels[radius]}
        for d in range(radius - 1, 0, -1):
            nd = {}
            for v, sig in levels[d].items():
                tot = 0
                for w in adj.get(v, ()):
                    if w in levels[d + 1]:
                        tot += (sig * (scale + delta[w])) \
                            // levels[d + 1][w]
                nd[v] = tot
            for v in levels[radius]:
                nd.setdefault(v, delta.get(v, 0))
            # carry deeper-level deltas forward for lookup only
            delta = {**{w: 0 for w in levels[d + 1]}, **delta, **nd}
            delta.update(nd)
        for d in range(1, radius + 1):
            for v in levels[d]:
                out_nroots[v] = out_nroots.get(v, 0) + 1
                out_bw[v] = out_bw.get(v, 0) + delta.get(v, 0)
    return {v: (out_nroots[v], out_bw[v]) for v in out_nroots}


def test_betweenness_random_twin(spark):
    from python_mecab_ner_spark.operators.graph import betweenness_sampled
    rng = random.Random(29)
    und = list({(rng.randrange(30), rng.randrange(30))
                for _ in range(70)})
    und = [(a, b) for a, b in und if a != b]
    edges = und + [(b, a) for a, b in und]
    roots = sorted({a for a, _ in und})[:8]
    want = _py_betweenness(edges, roots)
    df = spark.createDataFrame(edges, ["src", "dst"])
    rdf = spark.createDataFrame([(r,) for r in roots], ["node"])
    got = {r.node: (r.n_roots, r.bw_scaled)
           for r in betweenness_sampled(df, rdf).collect()}
    assert got == want


def test_betweenness_star_center(spark):
    # star: all shortest paths between leaves pass the center
    from python_mecab_ner_spark.operators.graph import betweenness_sampled
    edges = [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    rdf = spark.createDataFrame([(i,) for i in range(1, 6)], ["node"])
    got = {r.node: (r.n_roots, r.bw_scaled)
           for r in betweenness_sampled(df, rdf, radius=2).collect()}
    # from each of the 5 leaf roots: center at d=1 (sigma 1) with 4
    # successors at d=2 (sigma 1, delta 0) -> delta = 4 * scale
    assert got[0] == (5, 5 * 4 * 1_000_000)
    # each non-root leaf is a d=2 endpoint for the other 4 roots
    for v in range(1, 6):
        assert got[v] == (4, 0)


def test_sssp_random_twin(spark):
    import heapq

    from python_mecab_ner_spark.operators.graph import sssp_int
    rng = random.Random(61)
    edges = list({(rng.randrange(40), rng.randrange(40))
                  for _ in range(120)})
    edges = [(a, b, rng.randrange(1, 9)) for a, b in edges if a != b]
    roots = [0, 1, 2]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    rdf = spark.createDataFrame([(r,) for r in roots], ["node"])
    got = {r.node: r.dist for r in sssp_int(df, rdf).collect()}
    # python twin: multi-source Dijkstra over min-weight parallel edges
    best = {}
    for a, b, w in edges:
        best[(a, b)] = min(w, best.get((a, b), w))
    adj = {}
    for (a, b), w in best.items():
        adj.setdefault(a, []).append((b, w))
    dist = {r: 0 for r in roots}
    pq = [(0, r) for r in roots]
    heapq.heapify(pq)
    while pq:
        d, v = heapq.heappop(pq)
        if d > dist.get(v, 1 << 60):
            continue
        for w, c in adj.get(v, ()):
            nd = d + c
            if nd < dist.get(w, 1 << 60):
                dist[w] = nd
                heapq.heappush(pq, (nd, w))
    assert got == dist


def test_sssp_raises_on_budget(spark):
    edges = [(i, i + 1, 1) for i in range(30)]  # 30-hop path
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    rdf = spark.createDataFrame([(0,)], ["node"])
    with pytest.raises(Exception, match="max_rounds"):
        sssp_from = __import__(
            "python_mecab_ner_spark.operators.graph",
            fromlist=["sssp_int"]).sssp_int
        sssp_from(df, rdf, max_rounds=3).collect()


def test_suffix_prefix_stitch(spark):
    from python_mecab_ner_spark.operators.crawl import \
        suffix_prefix_stitch
    rows = [
        (1, "alpha beta gamma delta cut1 cut2 cut3 cut4"),
        (2, "cut1 cut2 cut3 cut4 epsilon zeta eta theta"),
        (3, "unrelated words that stitch with nothing at all"),
        (4, "cut1 cut2 cut3 cut4"),  # 4 tokens < 2k: excluded
        (5, "  spaced   out\ttokens\nhere cut1 cut2 cut3 cut4 "),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.doc_a, r.doc_b): r.boundary
           for r in suffix_prefix_stitch(df, "text", "doc_id").collect()}
    # doc1 tail == doc2 head; doc5 (mixed whitespace) tail == doc2 head
    assert got == {(1, 2): "cut1 cut2 cut3 cut4",
                   (5, 2): "cut1 cut2 cut3 cut4"}
