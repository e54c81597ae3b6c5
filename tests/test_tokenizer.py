"""Tokenizer goldens: every expected value is a literal from the
reference pytest suite (citations per case) plus the 570-line compiled
gazetteer, which pins the reference MeCab tokenization of each surface.
"""

import pytest

from python_mecab_ner_spark.kernel.lexicon import (_align_entry,
                                                   load_gazetteer_rows)
from python_mecab_ner_spark.kernel.tokenizer import (extracted_text,
                                                     restore_tokens, tokenize)

# reference tests/test_mecab_parser.py:14-30
GOLDEN_WORDS = [
    ("프룬", "프 루 ᆫ"),
    ("프룬이 먹고 싶어", "프 룬 이 먹 고 싶 어"),
    ("의창지", "의창 하 지"),
    ("의창지를 먹고 싶어", "의창 지 를 먹 고 싶 어"),
    ("금요일에 만나요", "금 요일 에 만나 요"),
    ("아이유의 금요일에 만나요를 들으면서 라즈베리를 먹을래",
     "아이유 의 금 요일 에 만나 요 를 듣 으면서 라즈베리 를 먹 을래"),
    # reference tests/test_mecab_parser.py:61
    ("나는 서울대병원에 갔어", "나 는 서울 대 병원 에 가 았 어"),
    # reference tests/test_mecab_parser.py:133
    ("그러니까 전철역이 그게 뭐 어쩌고 저쩟다는 거지",
     "그러니까 전철 역 이 그것 이 뭐 어쩌 고 저 쩟 다는 거 이 지"),
]


@pytest.mark.parametrize("text,want", GOLDEN_WORDS)
def test_extracted_text_goldens(text, want):
    assert extracted_text(text) == want


def test_token_counts():
    # reference tests/test_mecab_parser.py:44,58: 7 base / 9 expanded
    toks = tokenize("나는 서울대병원에 갔어")
    assert len(toks) == 9
    assert len({t["mecab_token"] for t in toks}) == 7
    # mecab_compound is the enumeration order (reference :56)
    assert [t["mecab_compound"] for t in toks] == list(range(9))


def test_restore_goldens():
    # reference tests/test_mecab_parser.py:138
    toks = tokenize("그러니까 전철역이 그게 뭐 어쩌고 저쩟다는 거지")
    assert restore_tokens(toks) == [
        "그러니까", "전철역이", "그게", "뭐", "어쩌고", "저쩟다는", "거지"]
    assert restore_tokens(tokenize("나는 서울대병원에 갔어")) == [
        "나는", "서울대병원에", "갔어"]


def test_restore_roundtrip_long():
    # reference tests/test_mecab_parser.py:149-156
    s = ("아~ 제목을 그냥 탄소 아~ 그리고 인간 원리 다중 우주 아~ 이런 제목을 "
         "잡았는데 어~ 뭐 뭐 물리학 하시는 분이나 천문학 하시는 분은 딱을 제목만 "
         "보고도 아~ 무슨 얘기할 거다라는 걸 아마 짐작을 하실 것 같습니다.")
    assert " ".join(restore_tokens(tokenize(s))) == s


def test_gazetteer_is_tokenization_oracle():
    """Every aligned compiled-gazetteer line pins tokenizer output; the
    tokenizer must reproduce the reference tokenization byte-for-byte."""
    rows = load_gazetteer_rows()
    aligned = 0
    for _large, _small, surface, tokenized in rows:
        if _align_entry(surface, tokenized.split()) is None:
            continue  # Inflect-style reference quirks, matcher-only
        aligned += 1
        assert extracted_text(surface) == tokenized, surface
    assert aligned >= 550  # 560 of 570 align in the shipped snapshot


def test_char_offsets():
    text = "나는 서울대병원에 갔어"
    toks = tokenize(text)
    for t in toks:
        if t["type"] == "Inflect":
            # Inflect sub-tokens share the reading's span (reference
            # mecab_parser.py:182-190)
            assert text[t["begin"]:t["end"]] == t["reading"]
        else:
            # plain and Compound sub-tokens own their word's span
            assert text[t["begin"]:t["end"]] == t["word"]
    # space indexes map to whitespace tokens
    assert [t["space"] for t in toks] == [0, 0, 1, 1, 1, 1, 2, 2, 2]


def test_latin_lowercased_like_reference():
    # gazetteer pins: "Orangestar,orangestar", "N서울타워,n 서울 타워"
    assert extracted_text("Orangestar") == "orangestar"
    assert extracted_text("N서울타워") == "n 서울 타워"
    assert extracted_text("63빌딩") == "63 빌딩"
