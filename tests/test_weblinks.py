"""Web link-graph extraction: Spark (regexp_extract_all over the
binary html) vs pyref (re.findall over the same generated pages) —
exact edge-count agreement, plus plan hygiene (no Python worker, no
extra shuffle)."""

import re
from collections import Counter
from urllib.parse import urlsplit

from python_mecab_ner_spark.operators.weblinks import (host_graph,
                                                       outlinks)
from python_mecab_ner_spark.sources.corpus import (LINK_HOSTS, gen_pages,
                                                   pages_dataframe)

N = 400


def _pyref_edges():
    edges = Counter()
    n_links = 0
    for p in gen_pages(N, seed=42):
        src = urlsplit(p["url"]).netloc.lower()
        for dst in re.findall(r'href="([^"]+)"',
                              p["html"].decode("utf-8")):
            edges[(src, urlsplit(dst).netloc.lower())] += 1
            n_links += 1
    return edges, n_links


def test_host_graph_matches_pyref(spark):
    pages = pages_dataframe(spark, N, seed=42)
    got = {(r.src_host, r.dst_host): r.n_links
           for r in host_graph(pages).collect()}
    want, n_links = _pyref_edges()
    assert got == dict(want)
    assert sum(got.values()) == n_links
    # the corpus actually exercises the operator: links exist, the
    # head host dominates, and every pool host appears
    assert n_links > N  # ~2 links/page on average
    # 200-host Zipf pool: every observed host comes from the pool and
    # the graph is non-trivial (many distinct hosts on both sides)
    dst_hosts = {h for _, h in got}
    src_hosts = {h for h, _ in got}
    assert dst_hosts <= set(LINK_HOSTS)
    assert src_hosts <= set(LINK_HOSTS)
    assert len(dst_hosts) >= 40 and len(src_hosts) >= 40
    head = sum(v for (_, d), v in got.items() if d == LINK_HOSTS[0])
    assert head > n_links // 3  # heavy-tailed dst-host skew present


def test_outlinks_plan_is_narrow(spark):
    pages = pages_dataframe(spark, 50, seed=42)
    plan = (outlinks(pages)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan  # pure projection + explode
    # the href extraction itself runs JVM-side: the only Python stage
    # is the corpus synthesizer's mapInPandas
    assert plan.count("MapInPandas") == 1


def test_text_bytes_unchanged_by_anchor_stream():
    """The anchor rng is a separate stream: text (the byte-identity
    anchor of the whole suite) must not shift when links exist."""
    for p in gen_pages(30, seed=42):
        body = re.sub(r"<a href=.*?</a>", "",
                      p["html"].decode("utf-8"))
        assert body == f"<html><body><p>{p['text']}</p></body></html>"


def _pyref_weighted_pr(edges, iters=3, scale=1_000_000, dn=85, dd=100):
    """Python reference of the integer weighted-PageRank recurrence."""
    base = (scale * (dd - dn)) // dd
    nodes = {s for s, _, _ in edges} | {d for _, d, _ in edges}
    wt = Counter()
    for s, _, w in edges:
        wt[s] += w
    pr = {n: scale for n in nodes}
    for _ in range(iters):
        m = Counter()
        for s, d, w in edges:
            m[d] += (pr[s] * w) // wt[s]
        pr = {n: base + (dn * m.get(n, 0)) // dd for n in nodes}
    return pr


def test_weighted_pagerank_matches_pyref_on_host_graph(spark):
    from python_mecab_ner_spark.operators.graph import \
        pagerank_weighted_int
    want_edges, _ = _pyref_edges()
    edges = [(s, d, int(w)) for (s, d), w in want_edges.items()]
    e = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r.node: r.pr
           for r in pagerank_weighted_int(e, iters=3).collect()}
    assert got == _pyref_weighted_pr(edges)
    # weighting matters: the head host out-ranks every other host
    assert max(got, key=got.get) == LINK_HOSTS[0]


def test_label_propagation_golden_ties_and_sync(spark):
    """Two triangles bridged by one weak edge: LPA keeps them as two
    communities; within a round every update uses the PREVIOUS round's
    labels (synchronous), and equal-weight votes pick the smallest
    label."""
    from python_mecab_ner_spark.operators.graph import \
        label_propagation_int
    tri1 = [(1, 2), (2, 3), (3, 1)]
    tri2 = [(10, 11), (11, 12), (12, 10)]
    bridge = [(3, 10)]
    und = [(a, b) for a, b in tri1 + tri2 + bridge] + \
          [(b, a) for a, b in tri1 + tri2 + bridge]
    e = spark.createDataFrame(und, "src long, dst long")
    got = {r.node: r.community
           for r in label_propagation_int(e, iters=2).collect()}
    # round 1 (unweighted, min-label ties): each triangle collapses
    # toward its smallest ids; round 2 settles 1,2,3 -> 1 and the
    # second triangle onto its own min labels — communities never mix
    assert set(got) == {1, 2, 3, 10, 11, 12}
    assert len({got[1], got[2], got[3]} & {got[10], got[11], got[12]}) \
        <= 1  # bridge may pull node 10 at most
    assert {got[1], got[2], got[3]} == {1}  # first triangle unified


def test_outlinks_is_streaming_compatible(spark, tmp_path):
    """The outlink extractor is a stateless projection, so it applies
    to a readStream unchanged — crawl-time link discovery without a
    separate code path.  Batch and stream results agree exactly."""
    import datetime as dt

    from pyspark.sql import types as T

    src, out, ckpt = (str(tmp_path / d) for d in ("p", "o", "c"))
    t0 = dt.datetime(2026, 1, 1, 12, 0)
    rows = [("https://a.com/1", t0,
             b'<html><a href="https://b.com/x">x</a>'
             b'<a href="https://c.com/y">y</a></html>'),
            ("https://b.com/2", t0, b"<html>no links</html>")]
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
    ])
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (outlinks(stream).writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    got = {(r.src_url, r.dst_url)
           for r in spark.read.parquet(out).collect()}
    want = {(r.src_url, r.dst_url)
            for r in outlinks(spark.read.parquet(src)).collect()}
    assert got == want == {("https://a.com/1", "https://b.com/x"),
                           ("https://a.com/1", "https://c.com/y")}


def test_anchor_profile_matches_pyref(spark):
    """Anchor-text extraction (href + text zipped) vs re.findall on
    the same generated pages — exact (host, term) count agreement;
    gazetteer-surface anchors actually occur."""
    from python_mecab_ner_spark.operators.weblinks import (
        ANCHOR_PATTERN, inbound_anchor_profile)
    want = Counter()
    for p in gen_pages(N, seed=42):
        for dst, txt in re.findall(ANCHOR_PATTERN,
                                   p["html"].decode("utf-8")):
            want[(urlsplit(dst).netloc.lower(), txt)] += 1
    pages = pages_dataframe(spark, N, seed=42)
    got = {(r.dst_host, r.term): r.n
           for r in inbound_anchor_profile(pages).collect()}
    assert got == dict(want)
    # real vocabulary anchors present (not just the l0..l4 filler)
    assert any(not t.startswith("l") for _, t in got)


def _pyref_html_to_text(html: str) -> str:
    """Python twin of functions.text.html_to_text (same chain, same
    order)."""
    s = re.sub(r"(?is)<(script|style)[^>]*>.*?</\1>", " ", html)
    s = re.sub(r"<[^>]*>", " ", s)
    for ent, rep in (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                     ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")):
        s = s.replace(ent, rep)
    return re.sub(r"\s+", " ", s).strip()


def test_html_to_text_matches_pyref_on_corpus(spark):
    from pyspark.sql import functions as F

    from python_mecab_ner_spark.functions.text import html_to_text
    pages = pages_dataframe(spark, 100, seed=42)
    got = {r.url: r.t for r in pages.select(
        "url", html_to_text(F.col("html").cast("string")).alias("t"))
        .collect()}
    for p in gen_pages(100, seed=42):
        want = _pyref_html_to_text(p["html"].decode("utf-8"))
        assert got[p["url"]] == want
        # the original text survives extraction verbatim
        assert p["text"] in got[p["url"]]


def test_html_to_text_edge_cases(spark):
    from pyspark.sql import functions as F

    from python_mecab_ner_spark.functions.text import html_to_text
    cases = [
        ("<html><script>var x = '<p>';</script><p>kept</p></html>",
         "kept"),
        ("<style a=b>h1 {color: red}</style>text", "text"),
        ("a &amp;lt; b", "a &lt; b"),   # &amp; decoded LAST, once
        ("x&nbsp;&nbsp;y", "x y"),
        ("<br/>line<BR>two", "line two"),
    ]
    d = spark.createDataFrame(cases, "h string, want string")
    bad = (d.select("h", "want", html_to_text(F.col("h")).alias("got"))
           .where(F.col("got") != F.col("want")).collect())
    assert bad == [], bad
    for h, want in cases:
        assert _pyref_html_to_text(h) == want


def test_pipeline_writes_web_graph_tables(spark, tmp_path):
    from python_mecab_ner_spark.plans.pipeline import run_pipeline
    out = str(tmp_path / "kg")
    pages = pages_dataframe(spark, 80, seed=42)
    info = run_pipeline(spark, pages, out, n_parts=4, canonicalize=False)
    assert info["hosts"].endswith("/hosts")
    hosts = spark.read.parquet(info["hosts"])
    anchors = spark.read.parquet(info["anchors"])
    assert set(hosts.columns) == {"src_host", "dst_host", "n_links"}
    assert set(anchors.columns) == {"dst_host", "term", "n"}
    # agrees with the direct operators on the same pages
    from python_mecab_ner_spark.operators.weblinks import host_graph
    want = {(r.src_host, r.dst_host): r.n_links
            for r in host_graph(pages).collect()}
    got = {(r.src_host, r.dst_host): r.n_links for r in hosts.collect()}
    assert got == want
