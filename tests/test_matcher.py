"""NER goldens: literals from reference tests/test_mecab_ner.py.

Entry iteration order is OS-dependent in the reference; this engine
fixes a deterministic canonical order, so order-sensitive asserts are
ported as set/position-order asserts (SURVEY.md §7.4 item 2).
"""

import pytest

from python_mecab_ner_spark.kernel.lexicon import load_gazetteer_rows
from python_mecab_ner_spark.kernel.matcher import (CompiledGazetteer,
                                                   find_mentions,
                                                   infer_extend, merge_runs,
                                                   morphs, ner_parse, ners)
from python_mecab_ner_spark.kernel.tokenizer import tokenize

SENT = "아이유의 금요일에 만나요를 들으면서 신촌 딸기를 먹을래"


@pytest.fixture(scope="module")
def rows():
    return load_gazetteer_rows()


@pytest.fixture(scope="module")
def gaz(rows):
    return CompiledGazetteer(rows)


def test_parse_simple(gaz):
    # reference tests/test_mecab_ner.py:15-22
    toks = tokenize(SENT)
    parsed, _ = ner_parse(toks, gaz)
    assert len(parsed) == 10
    assert morphs(toks, gaz) == [
        "아이유", "의", "금요일에 만나요", "를", "듣", "으면서",
        "신촌 딸기", "를", "먹", "을래"]
    assert ners(toks, gaz) == [
        ("아이유", "ner_example_music_singer", "가수"),
        ("금요일에 만나요", "ner_example_music_song", "노래"),
        ("신촌 딸기", "ner_example_fruit", "과일")]


def test_search_category(rows):
    # reference tests/test_mecab_ner.py:25-50
    toks = tokenize(SENT)
    g1 = CompiledGazetteer(rows, ["ner_example_music_singer"])
    parsed, _ = ner_parse(toks, g1)
    assert len(parsed) == 15
    assert morphs(toks, g1) == [
        "아이유", "의", "금", "요일", "에", "만나", "요", "를", "듣",
        "으면서", "신촌", "딸기", "를", "먹", "을래"]
    assert ners(toks, g1) == [("아이유", "ner_example_music_singer", "가수")]

    g2 = CompiledGazetteer(rows, ["ner_example_music_singer", "ner_example_fruit"])
    parsed, _ = ner_parse(toks, g2)
    assert len(parsed) == 14
    assert ners(toks, g2) == [
        ("아이유", "ner_example_music_singer", "가수"),
        ("신촌 딸기", "ner_example_fruit", "과일")]


def test_infer_off(rows, gaz):
    # reference tests/test_mecab_ner.py:53-78
    toks = tokenize(SENT)
    parsed, _ = ner_parse(toks, gaz, infer=False)
    assert len(parsed) == 11
    assert ners(toks, gaz, infer=False) == [
        ("아이유", "ner_example_music_singer", "가수"),
        ("금요일에 만나요", "ner_example_music_song", "노래"),
        ("딸기", "ner_example_fruit", "과일")]
    g2 = CompiledGazetteer(rows, ["ner_example_music_singer", "ner_example_fruit"])
    parsed, _ = ner_parse(toks, g2, infer=False)
    assert len(parsed) == 15
    assert ners(toks, g2, infer=False) == [
        ("아이유", "ner_example_music_singer", "가수"),
        ("딸기", "ner_example_fruit", "과일")]


def test_category_entities(gaz):
    # reference tests/test_mecab_ner.py:81-104 (order-insensitive port)
    toks = tokenize(SENT)
    got = {(m.surface, m.large, m.small) for m in find_mentions(toks, gaz)}
    assert got == {
        ("아이유", "ner_example_music_singer", "가수"),
        ("딸기", "ner_example_fruit", "과일"),
        ("금요일에 만나요", "ner_example_music_song", "노래")}


def test_bitmap_and_runs(gaz):
    # reference tests/test_mecab_ner.py:132-138
    toks = tokenize(SENT)
    mentions = infer_extend(find_mentions(toks, gaz), toks)
    blank = [0] * len(toks)
    for m in mentions:
        for i in range(m.start, m.end):
            blank[i] = 1
    assert blank == [1, 0, 1, 1, 1, 1, 1, 0, 0, 0, 1, 1, 0, 0, 0]
    assert merge_runs(mentions, len(toks)) == [(0, 0), (2, 6), (10, 11)]


def test_ner_feature_spans(gaz):
    # reference tests/test_mecab_ner.py:107-130
    toks = tokenize(SENT)
    _, spans = ner_parse(toks, gaz)
    got = {(s.word, s.large, s.small) for s in spans}
    assert got == {
        ("아이유", "ner_example_music_singer", "가수"),
        ("금요일에 만나요", "ner_example_music_song", "노래"),
        ("신촌 딸기", "ner_example_fruit", "과일")}
    # '#' stripped from small category (reference mecab_ner.py:249,253)
    assert all("#" not in s.small for s in spans)


def test_masking_prevents_nested(rows):
    # the 양념 치킨 / 치킨 case (reference mecab_ner.py:93): after the
    # longer entry matches, the nested shorter entry must not re-match
    gaz = CompiledGazetteer(rows, ["ner_example_fastfood"])
    toks = tokenize("양념 치킨 먹고 싶어")
    mentions = find_mentions(toks, gaz)
    assert [(m.surface, m.start, m.end) for m in mentions] == [("양념 치킨", 0, 2)]


def test_token0_infer_quirk(rows):
    # reference mecab_ner.py:196-205: token 0 reachable only when
    # start_idx == 1.  신촌 딸기를: 딸기 at idx 1, 신촌 at idx 0 -> extended.
    gaz = CompiledGazetteer(rows, ["ner_example_fruit"])
    toks = tokenize("신촌 딸기를 먹고 싶어")
    mentions = infer_extend(find_mentions(toks, gaz), toks)
    assert [(m.start, m.end) for m in mentions] == [(0, 2)]
