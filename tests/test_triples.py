from python_mecab_ner_spark.kernel.lexicon import load_gazetteer_rows
from python_mecab_ner_spark.kernel.matcher import CompiledGazetteer, ner_parse
from python_mecab_ner_spark.kernel.tokenizer import tokenize
from python_mecab_ner_spark.kernel.triples import extract_triples


def _triples(text, gaz):
    toks = tokenize(text)
    _, spans = ner_parse(toks, gaz)
    return extract_triples(toks, spans)


def test_location_triple():
    gaz = CompiledGazetteer(load_gazetteer_rows())
    t = _triples("미국은 경복궁에 있다", gaz)
    assert len(t) == 1
    subj, pred, obj = t[0][:3]
    assert (subj, pred, obj) == ("미국", "있", "경복궁")


def test_light_verb_stem():
    gaz = CompiledGazetteer(load_gazetteer_rows())
    t = _triples("아이유가 경복궁을 방문했다", gaz)
    assert len(t) == 1
    assert t[0][:3] == ("아이유", "방문하", "경복궁")


def test_no_cross_sentence_pairs():
    gaz = CompiledGazetteer(load_gazetteer_rows())
    # two sentences, one mention each: no pair within a segment
    t = _triples("나는 경복궁에 갔어. 나는 창덕궁에 갔어", gaz)
    assert t == []


def test_spans_and_conf():
    gaz = CompiledGazetteer(load_gazetteer_rows())
    t = _triples("미국은 경복궁에 있다", gaz)
    subj, pred, obj, ss, se, os_, oe, conf = t[0]
    assert (ss, se) == (0, 1)
    # 경복궁 is pinned as two tokens (경복 궁) by the compiled gazetteer
    assert (os_, oe) == (2, 4)
    assert 0 < conf <= 1
