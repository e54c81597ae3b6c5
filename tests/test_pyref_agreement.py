"""P/R harness: optimized AC-replay engine vs the naive pyref oracle
(independent re-implementation of the reference scan).  The BASELINE
gate is P/R >= 0.95; the engines are expected to agree exactly on the
pinned-vocabulary corpus."""

from python_mecab_ner_spark.kernel.lexicon import load_gazetteer_rows
from python_mecab_ner_spark.kernel.matcher import CompiledGazetteer, ner_parse
from python_mecab_ner_spark.kernel.pyref import pyref_ners
from python_mecab_ner_spark.kernel.tokenizer import tokenize
from python_mecab_ner_spark.sources.corpus import gen_pages


def prf(pred, gold):
    tp = len(pred & gold)
    p = tp / len(pred) if pred else 1.0
    r = tp / len(gold) if gold else 1.0
    return p, r


def test_engine_matches_pyref_on_corpus():
    rows = load_gazetteer_rows()
    gaz = CompiledGazetteer(rows)
    pred, gold = set(), set()
    for page in gen_pages(300, seed=7):
        toks = tokenize(page["text"])
        parsed, _ = ner_parse(toks, gaz)
        engine = [(w, lg, sm) for w, pos, lg, sm in parsed if pos == "ner"]
        for i, ent in enumerate(engine):
            pred.add((page["url"], i) + ent)
        for i, ent in enumerate(pyref_ners(page["text"], rows)):
            gold.add((page["url"], i) + ent)
    assert gold, "oracle produced no entities — corpus broken"
    p, r = prf(pred, gold)
    assert p >= 0.95 and r >= 0.95, (p, r)
    # stronger: exact agreement expected on pinned vocabulary
    assert pred == gold
