"""Recrawl merge: Spark upsert + change ledger vs a pyref recompute
from the same deterministic generators, plus plan hygiene (merge is
one combinable aggregate, no window)."""

from collections import Counter

from python_mecab_ner_spark.operators.crawl import (merge_crawls,
                                                    recrawl_stats)
from python_mecab_ner_spark.sources.corpus import (gen_page,
                                                   pages_dataframe,
                                                   recrawl_page,
                                                   recrawl_pages)

N = 400


def _pyref():
    old = {p["url"]: p for p in
           (gen_page(i, 42) for i in range(N))}
    new = {}
    for i in range(N // 2, N // 2 + N):
        p = recrawl_page(i, 42)
        new[p["url"]] = p
    st = Counter()
    for url, p in old.items():
        if url not in new:
            st["carried"] += 1
        elif new[url]["text"] == p["text"]:
            st["unchanged"] += 1
        else:
            st["changed"] += 1
    st["added"] = sum(1 for u in new if u not in old)
    merged = dict(old)
    merged.update(new)  # every new row has a later warc_ts
    return st, merged


def test_recrawl_stats_match_pyref(spark):
    old = pages_dataframe(spark, N, seed=42)
    new = recrawl_pages(spark, N, seed=42)
    got = {r.status: r.n_urls
           for r in recrawl_stats(old, new).collect()}
    want, merged = _pyref()
    assert got == dict(want)
    # the ledger exercises every status
    assert set(got) == {"added", "changed", "unchanged", "carried"}
    assert sum(got.values()) == len(merged)


def test_merge_crawls_latest_wins(spark):
    old = pages_dataframe(spark, N, seed=42)
    new = recrawl_pages(spark, N, seed=42)
    m = merge_crawls(old, new)
    _, want = _pyref()
    got = {r.url: (r.warc_ts, r.text) for r in m.collect()}
    assert len(got) == len(want)
    for url, (ts, text) in got.items():
        assert ts == want[url]["warc_ts"]
        assert text == want[url]["text"]


def test_merge_is_single_aggregate_no_window(spark):
    old = pages_dataframe(spark, 20, seed=42)
    new = recrawl_pages(spark, 20, seed=42)
    plan = (merge_crawls(old, new)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan
    assert plan.count("Exchange") <= 1
