"""Round-3 late additions: PII scrubbing, corpus-level frequent-line
dedup, k-hop graph expansion, integer-PMI collocations — hand-computed
goldens + cross-engine twins where the function has one."""

import duckdb
from pyspark.sql import functions as F

from python_mecab_ner_spark.functions.text import (pii_counts,
                                                   pii_counts_sql,
                                                   pii_redact,
                                                   pii_redact_sql)
from python_mecab_ner_spark.operators.colloc import bigram_pmi
from python_mecab_ner_spark.operators.dedup import (doc_lines,
                                                    frequent_line_dedup)
from python_mecab_ner_spark.operators.graph import khop_neighbors

PII_DOCS = [
    (1, "call 010-123-4567 or mail a.b@x.co id 900101-1234567 end"),
    (2, "no pii here at all"),
    # digit run glued to a word char: \b forbids the ID match
    (3, "serial x123456-1234567 stays"),
    # two emails, back to back phone styles
    (4, "a@b.com c.d@e.org tel 02-555-0100"),
]

PII_GOLD = {
    1: (1, 1, 1, "call <PHONE> or mail <EMAIL> id <ID> end"),
    2: (0, 0, 0, "no pii here at all"),
    3: (0, 0, 0, "serial x123456-1234567 stays"),
    4: (0, 1, 2, "<EMAIL> <EMAIL> tel <PHONE>"),
}


def test_pii_spark_golden(spark):
    d = spark.createDataFrame(PII_DOCS, "doc_id int, text string")
    rows = d.select("doc_id", *pii_counts(F.col("text")),
                    pii_redact(F.col("text")).alias("red")).collect()
    got = {r.doc_id: (r.n_id, r.n_phone, r.n_email, r.red) for r in rows}
    assert got == PII_GOLD


def test_pii_duckdb_twin():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, '{t}')" for i, t in PII_DOCS)
                + ") v(doc_id, text)")
    counts = ", ".join(f"{sql} AS {name}"
                       for sql, name in pii_counts_sql("text"))
    rows = con.execute(
        f"SELECT doc_id, {counts}, {pii_redact_sql('text')} AS red "
        f"FROM documents ORDER BY doc_id").fetchall()
    got = {r[0]: tuple(r[1:]) for r in rows}
    assert got == PII_GOLD


def test_frequent_line_dedup_newline_mode(spark):
    d = spark.createDataFrame(
        [(1, "foo\nbar\nbaz"), (2, "foo\nqux"), (3, "foo\nbar")],
        "doc_id int, text string")
    got = {r.doc_id: (r.n_lines, r.n_dropped) for r in
           frequent_line_dedup(d, "text", "doc_id", min_df=2).collect()}
    # df: foo=3, bar=2, baz=1, qux=1 -> frequent {foo, bar}
    assert got == {1: (3, 2), 2: (2, 1), 3: (2, 2)}


def test_doc_lines_chunk_mode(spark):
    d = spark.createDataFrame([(1, "a b c d e"), (2, ""), (3, "  x  ")],
                              "doc_id int, text string")
    rows = doc_lines(d, "text", "doc_id", chunk=2).collect()
    got = sorted((r.doc_id, r.line) for r in rows)
    # non-overlapping 2-token chunks, ragged tail kept, empty docs drop
    assert got == [(1, "a b"), (1, "c d"), (1, "e"), (3, "x")]


def test_khop_two_hops_distinct(spark):
    # 1->2, 2->3, 1->3: the direct edge must not double-count node 3
    e = spark.createDataFrame([(1, 2), (2, 3), (1, 3)],
                              "src bigint, dst bigint")
    rows = khop_neighbors(e, k=2).collect()
    got = {}
    for r in rows:
        got.setdefault(r.node, set()).add(r.nbr)
    assert got == {1: {2, 3}, 2: {3}}


def test_khop_cycle_excludes_self(spark):
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 1)],
                              "src bigint, dst bigint")
    rows = khop_neighbors(e, k=2).collect()
    got = {}
    for r in rows:
        got.setdefault(r.node, set()).add(r.nbr)
    # 2 hops around a 3-cycle reaches both other nodes, never self
    assert got == {1: {2, 3}, 2: {3, 1}, 3: {1, 2}}


def test_bigram_pmi_golden(spark):
    ctx = spark.createDataFrame(
        [(1, 0, "a"), (1, 1, "b"), (1, 2, "a"), (1, 3, "b"),
         (2, 0, "a"), (2, 1, "b")],
        "url int, idx int, word string")
    rows = bigram_pmi(ctx, min_count=1).collect()
    got = {(r.w1, r.w2): (r.c_xy, r.pmi_ppm) for r in rows}
    # N=6, c_a=3, c_b=3; (a,b) 3x -> 3*6e6/9; (b,a) 1x -> 6e6/9
    assert got == {("a", "b"): (3, 2000000), ("b", "a"): (1, 666666)}


def test_quantize_embeddings_golden(spark):
    from python_mecab_ner_spark.operators.ann import (quantize_embeddings,
                                                      quantize_vec)
    d = spark.createDataFrame([(1, [0.5, -0.5, 1.5, -1.5, 0.0])],
                              "vec_id int, embedding array<float>")
    [row] = quantize_embeddings(d).collect()
    # floor(0.5*127)=63, floor(-0.5*127)=-64, clip at +-[127,-128]
    assert row.qemb == [63, -64, 127, -128, 0]
    assert quantize_vec([0.5, -0.5, 1.5, -1.5, 0.0]) == row.qemb


def test_quantized_topk_golden(spark):
    from python_mecab_ner_spark.operators.ann import quantized_topk
    d = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [-1.0, 0.0]),
         (3, [0.0, 1.0])],
        "vec_id int, embedding array<float>")
    rows = quantized_topk(d, [1.0, 0.0], k=3).collect()
    got = [(r.vec_id, r.qdot, r.rank) for r in rows]
    # q=[127,0]; dots: v0=127*127, v1=floor(.9*127)=114*127, v3=0
    assert got == [(0, 16129, 1), (1, 14478, 2), (3, 0, 3)]


def test_triangle_counts_k4(spark):
    from python_mecab_ner_spark.operators.graph import triangle_counts
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    e = spark.createDataFrame(k4, "src bigint, dst bigint")
    got = {r.node: r.n_tri for r in triangle_counts(e).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_pendant_and_reverse_edges(spark):
    from python_mecab_ner_spark.operators.graph import triangle_counts
    # one triangle + a pendant; reverse duplicates must not double-count
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (1, 3), (3, 4)],
        "src bigint, dst bigint")
    got = {r.node: r.n_tri for r in triangle_counts(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_doc_surprisal_golden(spark):
    from python_mecab_ner_spark.operators.colloc import doc_surprisal
    ctx = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "c")],
        "url int, word string")
    got = {r.url: (r.n_toks, r.sum_idf, r.rarity_milli)
           for r in doc_surprisal(ctx).collect()}
    # N=5: idf(a)=bitlen(5 div 3)=1, idf(b)=idf(c)=bitlen(5)=3
    assert got == {1: (3, 5, 1666), 2: (2, 4, 2000)}


# ---- survivor selection (packed-integer argmax) ---------------------------

def test_survivor_selection_argmax_and_ties(spark):
    from python_mecab_ner_spark.operators.dedup import survivor_selection
    rows = [
        # cluster 10: clear quality winner (id 7, q 90)
        (10, 3, 50), (10, 7, 90), (10, 9, 40),
        # cluster 20: tie at q 80 -> MIN id (4) wins, not max
        (20, 8, 80), (20, 4, 80), (20, 6, 10),
        # singleton cluster
        (30, 5, 0),
    ]
    m = spark.createDataFrame(rows, "cluster_id long, doc_id long, q int")
    got = {r.cluster: (r.survivor_id, r.best_score, r.n_members)
           for r in survivor_selection(m, "cluster_id", "doc_id",
                                       "q").collect()}
    assert got == {10: (7, 90, 3), 20: (4, 80, 3), 30: (5, 0, 1)}


def test_survivor_selection_is_single_aggregate_no_window(spark):
    from python_mecab_ner_spark.operators.dedup import survivor_selection
    m = spark.createDataFrame([(1, 2, 3)],
                              "cluster_id long, doc_id long, q int")
    plan = (survivor_selection(m, "cluster_id", "doc_id", "q")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan
    # partial (map-side) aggregation present: two HashAggregate levels,
    # one Exchange
    assert plan.count("Exchange") <= 1


# ---- URL canonicalization -------------------------------------------------

URL_GOLD = [
    ("HTTP://News.Example.COM/art/3#sec", "http://news.example.com/art/3"),
    # slash-before-query collapses; utm-only query drops entirely
    ("http://a.com/p/?utm_source=x", "http://a.com/p"),
    # utm run of 3 (two bounded passes + tail pass)
    ("http://a.com/p?utm_a=1&utm_b=2&utm_c=3", "http://a.com/p"),
    # utm interleaved with kept params
    ("http://a.com/p?utm_a=1&id=2&utm_b=3", "http://a.com/p?id=2"),
    ("http://a.com/p?id=2&utm_b=3#frag", "http://a.com/p?id=2"),
    # path case preserved, host lowered, trailing slashes stripped
    ("https://A.B.Com/Mixed/Case//", "https://a.b.com/Mixed/Case"),
    ("http://a.com/", "http://a.com"),
    # schemeless input passes through the chain instead of erasing
    ("Example.com/p/?utm_a=1#f", "Example.com/p"),
]


def test_canonical_url_goldens(spark):
    from python_mecab_ner_spark.functions.text import canonical_url
    d = spark.createDataFrame(URL_GOLD, "u string, want string")
    bad = (d.select("u", "want", canonical_url(F.col("u")).alias("got"))
           .where(F.col("got") != F.col("want")).collect())
    assert bad == [], bad


def test_canonical_url_cross_engine_agreement(spark):
    """Spark (Java regex) vs DuckDB (RE2) byte-agreement on a
    generated messy-URL population — the patterns avoid every
    dialect-divergent construct, so outputs must be identical."""
    from python_mecab_ner_spark.functions.text import (canonical_url,
                                                       canonical_url_sql)
    urls = []
    for i in range(300):
        scheme = ["http://", "HTTP://", "https://"][i % 3]
        host = ["Ex.COM", "ex.com", "sub.Ex.Org"][i % 3 if i % 2 else 0]
        path = f"/p{i % 17}" + ("/" if i % 5 == 0 else "")
        q = ["", "?utm_s=1", f"?id={i % 7}", f"?utm_a=1&id={i % 7}&utm_b=2",
             "?utm_a=1&utm_b=2&utm_c=3"][i % 5]
        frag = "#x" if i % 4 == 0 else ""
        urls.append((i, scheme + host + path + q + frag))
    d = spark.createDataFrame(urls, "i long, u string")
    got = {r.i: r.c for r in
           d.select("i", canonical_url(F.col("u")).alias("c")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, u VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", urls)
    want = dict(con.execute(
        f"SELECT i, {canonical_url_sql('u')} FROM t").fetchall())
    assert got == want


# ---- count-min sketch -----------------------------------------------------

def test_cm_sketch_overestimates_and_probes_exact(spark):
    from python_mecab_ner_spark.operators.sketch import (cm_estimate,
                                                         cm_sketch)
    toks = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 7 + [(f"t{i}",) for i in range(40)],
        "word string")
    sk = cm_sketch(toks, "word", d=4, w=64)
    # total mass preserved per row
    per_row = {r.r: 0 for r in sk.collect()}
    for r in sk.collect():
        per_row[r.r] += r.cnt
    assert set(per_row.values()) == {97}
    terms = spark.createDataFrame([("a",), ("b",), ("zz",)],
                                  "word string")
    est = {r.term: r.cm_est
           for r in cm_estimate(terms, sk, "word", d=4, w=64).collect()}
    # CM guarantee: estimate >= true count; unseen term close to 0
    assert est["a"] >= 50 and est["b"] >= 7
    assert est["zz"] <= 40  # bounded by colliding tail mass


def test_cm_sketch_is_single_aggregate(spark):
    from python_mecab_ner_spark.operators.sketch import cm_sketch
    toks = spark.createDataFrame([("a",)], "word string")
    plan = (cm_sketch(toks, "word")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") <= 1  # one combinable agg, one scan


# ---- randomized agreement sweeps ------------------------------------------

def test_chunk_documents_randomized_vs_python(spark):
    """Random token counts (incl. the size/stride boundary cases) vs a
    direct python chunker — exact (doc, idx, toks) agreement."""
    import random

    from python_mecab_ner_spark.operators.pack import chunk_documents
    rng = random.Random(7)
    docs = [(i, " ".join(f"w{rng.randrange(50)}"
                         for _ in range(rng.choice(
                             [0, 1, 23, 24, 25, 31, 32, 33, 100]))))
            for i in range(60)]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.doc_id, r.chunk_idx): r.chunk_toks
           for r in chunk_documents(d, "text", "doc_id",
                                    size=32, stride=24).collect()}
    want = {}
    for i, text in docs:
        toks = text.split()
        for ci, s in enumerate(range(0, max(len(toks), 1), 24)):
            chunk = toks[s:s + 32]
            if chunk:
                want[(i, ci)] = len(chunk)
    assert got == want


def test_survivor_selection_randomized_vs_python(spark):
    import random

    from python_mecab_ner_spark.operators.dedup import survivor_selection
    rng = random.Random(11)
    rows = [(rng.randrange(40), i, rng.randrange(5))  # dense score ties
            for i in range(500)]
    m = spark.createDataFrame(rows, "c long, id long, q int")
    got = {r.cluster: (r.survivor_id, r.best_score, r.n_members)
           for r in survivor_selection(m, "c", "id", "q").collect()}
    want = {}
    for c, i, q in rows:
        cur = want.get(c)
        if cur is None or (q, -i) > (cur[1], -cur[0]):
            want[c] = (i, q, 0)
    counts = {}
    for c, *_ in rows:
        counts[c] = counts.get(c, 0) + 1
    want = {c: (i, q, counts[c]) for c, (i, q, _) in want.items()}
    assert got == want


# ---- BPE vocabulary induction ---------------------------------------------

def test_bpe_merge_table_golden(spark):
    """Classic BPE toy corpus: weighted counts, bytewise tie-break
    ('l o' beats 'o w' at equal weight), merges feed later rounds."""
    from python_mecab_ner_spark.operators.bpe import bpe_merge_table
    d = spark.createDataFrame(
        [(1, "low low low"), (2, "lower lower"), (3, "newest")],
        "doc_id long, text string")
    got = [(r.rank, r.pair, r.cnt)
           for r in bpe_merge_table(spark, d, "text", iters=3)
           .orderBy("rank").collect()]
    assert got == [(0, "l o", 5), (1, "lo w", 5), (2, "e r", 2)]


def test_bpe_merge_applies_across_repeat_runs(spark):
    """The 3-pass literal replace merges EVERY occurrence in an
    alternating run ('ababab' -> ab ab ab), not just the first — the
    round-2 pair counts prove the application was complete."""
    from python_mecab_ner_spark.operators.bpe import bpe_merge_table
    d = spark.createDataFrame([(1, "ababab ababab")],
                              "doc_id long, text string")
    got = [(r.rank, r.pair, r.cnt)
           for r in bpe_merge_table(spark, d, "text", iters=2)
           .orderBy("rank").collect()]
    assert got == [(0, "a b", 6), (1, "ab ab", 4)]


def test_bpe_token_counts_golden(spark):
    """low/lower/newest corpus after 3 merges (l o, lo w, e r):
    low -> [low]=1, lower -> [low, er]=2, newest -> 6 chars."""
    from python_mecab_ner_spark.operators.bpe import bpe_token_counts
    d = spark.createDataFrame(
        [(1, "low low low"), (2, "lower lower"), (3, "newest")],
        "doc_id long, text string")
    got = {r.doc_id: r.n_bpe_tokens
           for r in bpe_token_counts(spark, d, "text", "doc_id",
                                     iters=3).collect()}
    assert got == {1: 3, 2: 4, 3: 6}


# ---- sketch mergeability (incremental maintenance) ------------------------

def test_cm_sketch_merge_equals_sketch_of_union(spark):
    """sketch(A ∪ B) == cellwise-merge(sketch(A), sketch(B)) — the
    property that lets a daily crawl fold per-day sketches without
    re-reading history."""
    from python_mecab_ner_spark.operators.sketch import cm_merge, cm_sketch
    a = spark.createDataFrame([(w,) for w in "x y x z".split()],
                              "word string")
    b = spark.createDataFrame([(w,) for w in "y y q x".split()],
                              "word string")
    both = a.unionByName(b)
    want = {(r.r, r.b): r.cnt
            for r in cm_sketch(both, "word", d=3, w=32).collect()}
    got = {(r.r, r.b): r.cnt
           for r in cm_merge(cm_sketch(a, "word", d=3, w=32),
                             cm_sketch(b, "word", d=3, w=32)).collect()}
    assert got == want


def test_minhash_merge_equals_signature_of_union(spark):
    """sig over the union of two text slices == elementwise min of the
    per-slice signatures (same doc split across slices)."""
    from python_mecab_ner_spark.operators.dedup import (minhash_merge,
                                                        minhash_signatures)
    a = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "one two three four")],
        "doc_id long, text string")
    b = spark.createDataFrame(
        [(1, "beta gamma epsilon zeta"), (2, "five six seven eight")],
        "doc_id long, text string")
    both = a.unionByName(b)
    want = {r.doc_id: tuple(r[f"mh{i}"] for i in range(16))
            for r in minhash_signatures(both, "text", "doc_id").collect()}
    got = {r.doc_id: tuple(r[f"mh{i}"] for i in range(16))
           for r in minhash_merge(
               minhash_signatures(a, "text", "doc_id"),
               minhash_signatures(b, "text", "doc_id")).collect()}
    assert got == want


def test_hll_registers_merge_and_estimate(spark):
    """hll(A ∪ B) == elementwise-max merge (exact), and the
    client-side estimate lands within 20% of the true distinct count
    on 5000 terms (deterministic hashes -> deterministic estimate)."""
    from python_mecab_ner_spark.operators.sketch import (hll_estimate,
                                                         hll_merge,
                                                         hll_registers)
    a = spark.createDataFrame([(f"t{i}",) for i in range(3000)],
                              "word string")
    b = spark.createDataFrame([(f"t{i}",) for i in range(2000, 5000)],
                              "word string")
    both = a.unionByName(b)
    want = {r.bucket: r.max_rho
            for r in hll_registers(both, "word").collect()}
    got = {r.bucket: r.max_rho
           for r in hll_merge(hll_registers(a, "word"),
                              hll_registers(b, "word")).collect()}
    assert got == want
    regs = [want.get(i, 0) for i in range(64)]
    est = hll_estimate(regs)
    assert abs(est - 5000) / 5000 < 0.20, est


def test_hll_rho_integer_exact_vs_python(spark):
    """Register values equal a direct python recompute of the same
    hash/shift arithmetic (guards the 60-bit/no-float-division
    contract)."""
    from python_mecab_ner_spark.functions.hashing import md5_int_py
    from python_mecab_ner_spark.operators.sketch import hll_registers
    words = [f"w{i}" for i in range(500)]
    d = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r.bucket: r.max_rho
           for r in hll_registers(d, "word").collect()}
    want = {}
    for w in words:
        h = md5_int_py(w, salt="hll:")
        b, hp = h & 63, h >> 6
        rho = 55 - hp.bit_length() if hp > 0 else 55
        want[b] = max(want.get(b, 0), rho)
    assert got == want


def test_cm_estimate_empty_cells_count_zero(spark):
    """A term hashing to any untouched cell must estimate 0 (the cell
    exists implicitly with count 0) — regression for the inner-join
    version that dropped such probes."""
    from python_mecab_ner_spark.operators.sketch import (cm_estimate,
                                                         cm_sketch)
    toks = spark.createDataFrame([("a",), ("b",)], "word string")
    sk = cm_sketch(toks, "word", d=4, w=4096)  # 8 touched cells of 16k
    terms = spark.createDataFrame(
        [(f"unseen{i}",) for i in range(50)] + [("a",)], "word string")
    est = {r.term: r.cm_est
           for r in cm_estimate(terms, sk, "word", d=4, w=4096).collect()}
    assert len(est) == 51          # nothing dropped
    assert est["a"] >= 1
    assert min(est[f"unseen{i}"] for i in range(50)) == 0


def _minhash_py(text, n_hashes=8, k=3):
    import re

    from python_mecab_ner_spark.functions.hashing import md5_int_py
    w = re.sub(r"\s+", " ", text.lower().strip()).split(" ")
    # windows start only at 0..len-k (one truncated gram iff len < k)
    # — operators.dedup.shingles' exact semantics
    grams = {" ".join(w[i:i + k])
             for i in range(max(len(w) - k, 0) + 1)} - {""}
    return [min(md5_int_py(g, salt=f"mh{i}:") for g in grams)
            for i in range(n_hashes)]


def test_incremental_lsh_equals_full_lsh_on_delta_pairs(spark):
    """incremental_lsh_pairs(old_sigs, new_sigs) finds EXACTLY the
    full-corpus LSH candidate pairs that touch a new doc — no pair
    missed, no old x old pair emitted — and its signature-side
    verification count matches the python minhash twin."""
    from pyspark.sql import functions as F

    from python_mecab_ner_spark.operators.dedup import (
        incremental_lsh_pairs, lsh_candidate_pairs, minhash_signatures)

    base = ["alpha beta gamma delta epsilon zeta eta theta",
            "one two three four five six seven eight nine",
            "lorem ipsum dolor sit amet consectetur adipiscing"]
    rows = []
    for i in range(24):
        t = base[i % 3] + (" extra tail" if i % 6 >= 3 else "")
        rows.append((i, t))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    full = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(
        df, "text", "doc_id", k=3, n_hashes=8, bands=4).collect()}
    expected = {(a, b) for a, b in full if a % 3 == 0 or b % 3 == 0}

    old_sigs = minhash_signatures(df.where(F.col("doc_id") % 3 != 0),
                                  "text", "doc_id", k=3, n_hashes=8)
    new_sigs = minhash_signatures(df.where(F.col("doc_id") % 3 == 0),
                                  "text", "doc_id", k=3, n_hashes=8)
    inc = incremental_lsh_pairs(old_sigs, new_sigs,
                                n_hashes=8, bands=4).collect()
    got = {(r.doc_a, r.doc_b) for r in inc}
    assert got == expected and got  # non-trivial

    texts = dict(rows)
    for r in inc:
        # side classification and the signature-match verification
        assert r.side == ("new_new" if (r.doc_a % 3 == 0
                                        and r.doc_b % 3 == 0)
                          else "new_old")
        ma, mb = _minhash_py(texts[r.doc_a]), _minhash_py(texts[r.doc_b])
        assert r.sig_matches == sum(x == y for x, y in zip(ma, mb))


def test_simhash_weighted_python_twin_and_boilerplate_damping(spark):
    """Bit-exact python recompute, plus the property the weighting
    buys: two docs sharing only template boilerplate (df = n_docs,
    weight 1) land FARTHER apart than the unweighted simhash puts
    them relative to their rare-word content."""
    from python_mecab_ner_spark.functions.hashing import md5_int_py
    from python_mecab_ner_spark.operators.dedup import simhash_weighted

    rows = [(1, "the quick brown fox copyright footer nav"),
            (2, "the lazy green dog copyright footer nav"),
            (3, "the quick brown fox copyright footer nav"),
            (4, "zebra quark xylem vortex copyright footer nav")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.simhash_w
           for r in simhash_weighted(df, "text", "doc_id",
                                     n_bits=16).collect()}

    import re
    texts = dict(rows)
    n = len(rows)
    dfc = {}
    for t in texts.values():
        for w in set(re.split(r"\s+", t.lower().strip())) - {""}:
            dfc[w] = dfc.get(w, 0) + 1
    exp = {}
    for d, t in texts.items():
        votes = [0] * 16
        for w in re.split(r"\s+", t.lower().strip()):
            if not w:
                continue
            wt = (n // dfc[w]).bit_length()
            h = md5_int_py(w)
            for i in range(16):
                votes[i] += wt if (h >> i) & 1 else -wt
        exp[d] = sum(1 << i for i in range(16) if votes[i] > 0)
    assert got == exp
    # identical docs collide exactly; boilerplate-only overlap doesn't
    assert got[1] == got[3]
    assert got[1] != got[4]
