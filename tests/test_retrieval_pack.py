"""Integer BM25 retrieval + training-sequence packing goldens."""

from pyspark.sql import functions as F

from python_mecab_ner_spark.operators.pack import pack_sequences
from python_mecab_ner_spark.operators.retrieval import bm25_topk


def _ctx(spark, docs):
    d = spark.createDataFrame(docs, "url int, text string")
    return (d.select("url", F.explode(F.split(F.lower(F.trim("text")),
                                              r"\s+")).alias("word"))
            .where("word <> ''"))


def test_bm25_hand_golden(spark):
    # N=3 docs, total tokens 10, avgdl = 10 div 3 = 3
    # df(spark)=1 -> idf = bitlen(3)=2; df(query)=1 -> idf=2
    # doc1 tf(spark)=2, dl=4: 2*2*44000*3 // (120+18+72) = 2514
    # doc2 tf(query)=1, dl=2: 2*1*44000*3 // (60+18+36)  = 2315
    ctx = _ctx(spark, [(1, "spark spark is fast"),
                       (2, "query engine"),
                       (3, "no relevant words here")])
    rows = bm25_topk(ctx, ["spark", "query"], k=10,
                     id_col="url").collect()
    got = [(r.doc_id, r.n_terms, r.bm25_milli) for r in rows]
    assert got == [(1, 1, 2514), (2, 1, 2315)]


def test_bm25_rank_order_and_limit(spark):
    # more matching terms -> higher score; k truncates
    ctx = _ctx(spark, [(i, "spark query" if i == 1 else "spark filler")
                       for i in range(1, 6)])
    rows = bm25_topk(ctx, ["spark", "query"], k=2, id_col="url").collect()
    assert [r.doc_id for r in rows] == [1, 2]
    assert rows[0].n_terms == 2 and rows[1].n_terms == 1
    assert rows[0].bm25_milli > rows[1].bm25_milli


def test_pack_sequences_single_bucket_golden(spark):
    d = spark.createDataFrame(
        [(1, 300), (2, 300), (3, 100), (4, 600)],
        "doc_id int, n_tokens int")
    out = pack_sequences(d, "doc_id", "n_tokens", budget=512, n_buckets=1)
    got = {r.doc_id: (r.bin_id, r.start_off, r.spill_bins)
           for r in out.collect()}
    assert got == {1: (0, 0, 0),       # [0, 300)
                   2: (0, 300, 1),     # [300, 600) straddles 512
                   3: (1, 88, 0),      # [600, 700)
                   4: (1, 188, 1)}     # [700, 1300) straddles 1024


def test_pack_sequences_partitioning_invariant(spark):
    d = spark.createDataFrame([(i, (i * 13) % 97 + 1) for i in range(100)],
                              "doc_id int, n_tokens int")
    a = {r.doc_id: (r.bucket, r.bin_id, r.start_off)
         for r in pack_sequences(d, "doc_id", "n_tokens", 128,
                                 n_buckets=4).collect()}
    b = {r.doc_id: (r.bucket, r.bin_id, r.start_off)
         for r in pack_sequences(d.repartition(7), "doc_id", "n_tokens",
                                 128, n_buckets=4).collect()}
    assert a == b
    # each bucket is an independent stream: its first doc starts at slot 0
    firsts = {}
    for doc_id in sorted(a):
        bucket = a[doc_id][0]
        firsts.setdefault(bucket, a[doc_id][1:])
    assert all(v == (0, 0) for v in firsts.values())


# ---- overlapping chunking -------------------------------------------------

def test_chunk_documents_golden(spark):
    from python_mecab_ner_spark.operators.pack import chunk_documents
    docs = [
        (1, "a b c d e f g h i j"),   # 10 toks, size 4 stride 3
        (2, "x"),                      # single token -> one chunk
        (3, "   "),                    # whitespace-only -> no chunks
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    rows = chunk_documents(d, "text", "doc_id", size=4, stride=3).collect()
    got = {(r.doc_id, r.chunk_idx): r.chunk_toks for r in rows}
    # starts 0,3,6,9 -> lengths 4,4,4,1; overlap of 1 token per step
    assert got == {(1, 0): 4, (1, 1): 4, (1, 2): 4, (1, 3): 1,
                   (2, 0): 1}
    # fingerprints of overlapping chunks differ (content differs)
    fps = [r.chunk_fp for r in rows if r.doc_id == 1]
    assert len(set(fps)) == 4


def test_chunk_documents_is_shuffle_free(spark):
    from python_mecab_ner_spark.operators.pack import chunk_documents
    d = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (chunk_documents(d, "text", "doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Generate" in plan  # the posexplode row-multiplier


def test_kwic_snippets_golden_and_clamping(spark):
    from python_mecab_ner_spark.operators.retrieval import kwic_snippets
    rows = [(1, "spark runs fast"),             # occurrence at pos 0
            (2, "a b c spark d e f"),           # centered
            (3, "tail ends with spark"),        # right-clamped
            (4, "no match here"),
            (5, "spark x spark")]               # two occurrences
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {(r.doc_id, r.pos): r.snippet
           for r in kwic_snippets(df, "text", "doc_id",
                                  term="spark", window=3).collect()}
    assert got == {
        (1, 0): "spark runs fast",
        (2, 3): "a b c spark d e f",
        (3, 3): "tail ends with spark",
        (5, 0): "spark x spark",
        (5, 2): "spark x spark",
    }


def test_kwic_plan_is_shuffle_free(spark):
    from python_mecab_ner_spark.operators.retrieval import kwic_snippets
    df = spark.createDataFrame([(1, "spark a b")],
                               "doc_id bigint, text string")
    out = kwic_snippets(df, "text", "doc_id", term="spark")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan and "Join" not in plan, plan
