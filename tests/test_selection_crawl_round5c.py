"""Round-5 closing additions: greedy max-coverage selection (q193),
farthest-first k-center (q194), URL path-template mining (q195), and
RAKE keyphrase extraction (q196).

Discipline as in test_matching_taxonomy.py: every test recomputes the
expected answer with plain Python on small randomized or hand-built
inputs, so the DuckDB oracles are not the only cross-check.
"""

import math
import random

from python_mecab_ner_spark.operators.ann import kcenter_centers
from python_mecab_ner_spark.operators.crawl import url_path_templates
from python_mecab_ner_spark.operators.sample import greedy_max_coverage


def _py_greedy(pairs, k):
    """Plain-python greedy max coverage: (max gain, min item) per
    round, winner's elements removed."""
    sets = {}
    for it, el in pairs:
        sets.setdefault(it, set()).add(el)
    covered, out = set(), []
    for rnd in range(1, k + 1):
        gains = {it: len(es - covered) for it, es in sets.items()
                 if len(es - covered) > 0}
        if not gains:
            break
        win = min(gains, key=lambda it: (-gains[it], it))
        out.append((rnd, win, gains[win]))
        covered |= sets[win]
    return out


def test_coverage_random_twin(spark):
    rng = random.Random(17)
    pairs = list({(rng.randrange(30), f"e{rng.randrange(80)}")
                  for _ in range(300)})
    df = spark.createDataFrame(pairs, ["item", "elem"])
    got = [(r.round, r.item, r.gain)
           for r in greedy_max_coverage(df, "item", "elem", k=6)
           .orderBy("round").collect()]
    assert got == _py_greedy(pairs, 6)


def test_coverage_early_stop_and_ties(spark):
    # two items share elements; a third is disjoint; universe dries up
    pairs = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "c")]
    df = spark.createDataFrame(pairs, ["item", "elem"])
    got = [(r.round, r.item, r.gain)
           for r in greedy_max_coverage(df, "item", "elem", k=5)
           .orderBy("round").collect()]
    # round 1: gain-2 tie between items 1 and 2 -> min item wins;
    # item 2's pairs vanish with the covered elems; round 3 is dry
    assert got == [(1, 1, 2), (2, 3, 1)]


def _py_kcenter(vecs, k):
    """Plain-python Gonzalez with the same int8 floor quantization and
    (max dist, min id) tie rule."""
    q = {i: [max(-128, min(127, math.floor(float(x) * 127))) for x in v]
         for i, v in vecs.items()}
    c0 = min(q)
    out = [(1, c0, 0)]
    dist = {i: sum((a - b) * (a - b) for a, b in zip(q[i], q[c0]))
            for i in q}
    for rnd in range(2, k + 1):
        win = min(dist, key=lambda i: (-dist[i], i))
        out.append((rnd, win, dist[win]))
        dist = {i: min(dist[i],
                       sum((a - b) * (a - b)
                           for a, b in zip(q[i], q[win])))
                for i in q}
    return out


def test_kcenter_random_twin(spark):
    rng = random.Random(23)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(40)}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id bigint, embedding array<float>")
    got = [(r.round, r.center_id, r.dist)
           for r in kcenter_centers(df, k=6).orderBy("round").collect()]
    # the python twin must quantize from the same float32-rounded
    # values Spark stores (array<float> narrows the doubles)
    import struct
    f32 = {i: [struct.unpack("f", struct.pack("f", x))[0] for x in v]
           for i, v in vecs.items()}
    assert got == _py_kcenter(f32, 6)


def test_kcenter_radius_monotone_and_spread(spark):
    # 3 tight clusters -> the first 3 centers land in distinct clusters
    base = {0: 0.9, 100: -0.9, 200: 0.1}
    rows = []
    for off, c in base.items():
        for j in range(5):
            rows.append((off + j, [c + 0.001 * j] * 4))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = kcenter_centers(df, k=3).orderBy("round").collect()
    clusters = {r.center_id // 100 for r in got}
    assert clusters == {0, 1, 2}
    dists = [r.dist for r in got[1:]]
    assert dists == sorted(dists, reverse=True)  # radius certificate


def test_url_templates(spark):
    rows = [
        ("https://a.com/post/123",),
        ("https://a.com/post/999",),
        ("https://a.com/u/0123456789abcdef/profile",),
        ("https://a.com/u/deadbeefdeadbeef/profile?x=1",),
        ("https://b.org/about",),
        ("https://b.org/tag/t3/page/7",),
        ("https://b.org/",),          # empty path -> "/"
        ("https://a.com/v2/item/42",),  # 'v2' mixed -> literal
    ]
    df = spark.createDataFrame(rows, ["url"])
    got = {(r.host, r.template): r.n_urls
           for r in url_path_templates(df).collect()}
    assert got == {
        ("a.com", "/post/{n}"): 2,
        ("a.com", "/u/{h}/profile"): 2,
        ("b.org", "/about"): 1,
        ("b.org", "/tag/t3/page/{n}"): 1,
        ("b.org", "/"): 1,
        ("a.com", "/v2/item/{n}"): 1,
    }


def _py_rake(docs, n_stop, max_len, min_occ):
    """Plain-python RAKE with the derived stoplist and capped
    pre-scoring candidate set."""
    toks = {d: [w for w in t.lower().split() if w] for d, t in docs}
    df = {}
    for _d, ws in toks.items():
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    stops = set(sorted(df, key=lambda w: (-df[w], w))[:n_stop])
    runs = []
    for d, ws in toks.items():
        cur = []
        for w in ws:
            if w in stops:
                if cur:
                    runs.append(cur)
                cur = []
            else:
                cur.append(w)
        if cur:
            runs.append(cur)
    runs = [r for r in runs if len(r) <= max_len]
    freq, deg = {}, {}
    for r in runs:
        for w in r:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(r)
    score = {w: (deg[w] * 1_000_000) // freq[w] for w in freq}
    out = {}
    for r in runs:
        p = " ".join(r)
        n, _pl, _s = out.get(p, (0, 0, 0))
        out[p] = (n + 1, len(r), sum(score[w] for w in r))
    return {p: v for p, v in out.items() if v[0] >= min_occ}


def test_rake_twin(spark):
    rng = random.Random(31)
    vocab = ["the", "of", "red", "apple", "pie", "green", "tart",
             "cold", "press", "oak"]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(40)))
            for i in range(25)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    from python_mecab_ner_spark.operators.retrieval import \
        rake_keyphrases
    got = {r.phrase: (r.n_occ, r.plen, r.score_ppm)
           for r in rake_keyphrases(df, "text", "doc_id", n_stop=2,
                                    max_len=3, min_occ=2).collect()}
    assert got == _py_rake(docs, n_stop=2, max_len=3, min_occ=2)
    # the derived stoplist really is the top-df pair: with seed 31
    # over 25x40 uniform draws, every word appears in >20 docs, so
    # the stoplist tie-break (df desc, word asc) is exercised
    assert len(got) > 0
