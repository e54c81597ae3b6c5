from python_mecab_ner_spark.kernel.jamo import (
    from_jamo, has_jongseong, jamo_shingles, to_jamo)


def test_to_jamo_basic():
    # reference to_jaso semantics: no-final syllables contribute 2 jamo
    assert to_jamo("가") == "ㄱㅏ"
    assert to_jamo("안") == "ㅇㅏㄴ"
    assert to_jamo("안녕하세요") == "ㅇㅏㄴㄴㅕㅇㅎㅏㅅㅔㅇㅛ"


def test_to_jamo_passthrough():
    assert to_jamo("abc 123!") == "abc 123!"
    assert to_jamo("한a글") == "ㅎㅏㄴaㄱㅡㄹ"


def test_roundtrip():
    for s in ["안녕하세요", "대한민국", "서울대병원", "값", "닭"]:
        assert from_jamo(to_jamo(s)) == s


def test_has_jongseong():
    assert has_jongseong("값")
    assert has_jongseong("서울")
    assert not has_jongseong("아이유")
    assert not has_jongseong("abc")
    assert not has_jongseong("")


def test_shingles():
    sh = jamo_shingles("좋은 날", k=3)
    assert all(len(x) == 3 for x in sh)
    assert jamo_shingles("", k=3) == []
    assert jamo_shingles("가", k=3) == ["ㄱㅏ"]
