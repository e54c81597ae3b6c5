"""End-to-end Spark annotate stage vs the single-process kernel."""

import pytest

from python_mecab_ner_spark.kernel.lexicon import load_gazetteer_rows
from python_mecab_ner_spark.kernel.matcher import (CompiledGazetteer,
                                                   find_mentions,
                                                   infer_extend, ner_spans)
from python_mecab_ner_spark.kernel.tokenizer import tokenize
from python_mecab_ner_spark.kernel.triples import extract_triples
from python_mecab_ner_spark.operators.annotate import (annotate_pages,
                                                       mentions_table,
                                                       triples_table)
from python_mecab_ner_spark.sources.corpus import gen_pages, pages_dataframe
from python_mecab_ner_spark.sources.gazetteer import broadcast_rows


@pytest.fixture(scope="module")
def annotated(spark):
    pages = pages_dataframe(spark, 120, seed=11, partitions=4)
    bc = broadcast_rows(spark)
    return annotate_pages(pages, bc).cache()


def test_no_shuffle_in_plan(spark, annotated):
    plan = annotated._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # extract path must be narrow


def test_matches_kernel(annotated):
    rows = load_gazetteer_rows()
    gaz = CompiledGazetteer(rows)
    got = {r.url: r for r in annotated.collect()}
    pages = gen_pages(120, seed=11)
    assert len(got) == len(pages)
    for p in pages:
        toks = tokenize(p["text"])
        mentions = infer_extend(find_mentions(toks, gaz), toks)
        spans = ner_spans(toks, mentions)
        trips = extract_triples(toks, spans)
        r = got[p["url"]]
        assert [(m.start, m.end, m.surface) for m in mentions] == \
            [(m["start"], m["end"], m["surface"]) for m in r.mentions]
        assert [(t[0], t[1], t[2]) for t in trips] == \
            [(t["subj"], t["pred"], t["obj"]) for t in r.triples]


def test_projections(annotated):
    m = mentions_table(annotated)
    t = triples_table(annotated)
    assert m.columns == ["url", "start", "end", "surface", "large", "small"]
    assert {"url", "subj", "pred", "obj", "conf"} <= set(t.columns)
    assert m.count() > 0 and t.count() > 0


def test_context_tokens_slim_agreement(spark):
    """with_tokens='context' emits exactly the 4-field slim struct and
    tokens_table over it equals tokens_table over the full struct; the
    tokenize-only path (tokenize_pages) reproduces the full token
    arrays bit-for-bit (the posseq restore contract)."""
    from python_mecab_ner_spark.kernel.tokenizer import TOKEN_FIELDS
    from python_mecab_ner_spark.operators.annotate import (tokenize_pages,
                                                           tokens_table)

    pages = pages_dataframe(spark, 40, seed=13, partitions=2).cache()
    bc = broadcast_rows(spark)
    slim = annotate_pages(pages, bc, with_tokens="context")
    full = annotate_pages(pages, bc, with_tokens=True)
    assert [f.name for f in slim.schema["tokens"].dataType.elementType] == \
        ["word", "pos", "begin", "end"]
    key = ["url", "idx", "word", "pos", "begin", "end"]
    a = sorted(map(tuple, tokens_table(slim).select(*key).collect()))
    b = sorted(map(tuple, tokens_table(full).select(*key).collect()))
    assert a == b and a

    tok_only = {r.url: r.tokens for r in tokenize_pages(pages).collect()}
    for r in full.select("url", "tokens").collect():
        got = [tuple(t[f] for f in TOKEN_FIELDS) for t in tok_only[r.url]]
        want = [tuple(t[f] for f in TOKEN_FIELDS) for t in r.tokens]
        assert got == want
    pages.unpersist()


def test_en_rows_pass_through(annotated):
    en = annotated.filter("lang = 'en'").collect()
    assert en, "expected some en rows"
    for r in en:
        assert r.mentions == [] and r.triples == []
        assert r.extracted_text  # tokenized, zero mentions
