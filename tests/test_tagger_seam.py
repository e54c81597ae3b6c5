"""The real-MeCab swap seam is load-bearing: a mock tagger
implementing the REAL tagger surface (parse(text) -> nodes with
.surface + the 8-field mecab-ko-dic .feature CSV, reference
mecab_parser.py:34-48) drops into both the adapter and the
distributed annotate UDF unchanged."""

import pytest

from python_mecab_ner_spark.kernel.matcher import (CompiledGazetteer,
                                                   find_mentions)
from python_mecab_ner_spark.kernel.tagger_adapter import tokens_from_tagger
from python_mecab_ner_spark.kernel.tokenizer import TOKEN_FIELDS


class _Node:
    def __init__(self, surface, feature):
        self.surface = surface
        self.feature = feature


class MockTagger:
    """The reference's _mecab.Tagger shape for a fixed corpus: plain
    nouns/particles, one Inflect (있다 -> 있/VV + 다/EF sharing the
    group span) and one Compound (능금나무 -> 능금 + 나무 with split
    spans)."""

    LEXICON = {
        "네팔": ("네팔", "NNP,지명,T,네팔,*,*,*,*"),
        "은": ("은", "JX,*,T,은,*,*,*,*"),
        "경복궁": ("경복궁", "NNP,지명,T,경복궁,*,*,*,*"),
        "에": ("에", "JKB,*,F,에,*,*,*,*"),
        "있다": ("있다", "VV+EF,*,F,있다,Inflect,VV,EF,있/VV/*+다/EF/*"),
        "능금나무": ("능금나무", "NNG,*,F,능금나무,Compound,*,*,"
                               "능금/NNG/*+나무/NNG/*"),
    }

    def parse(self, text):
        nodes = []
        for eojeol in text.split():
            rest = eojeol
            while rest:
                for key in sorted(self.LEXICON, key=len, reverse=True):
                    if rest.startswith(key):
                        nodes.append(_Node(*self.LEXICON[key]))
                        rest = rest[len(key):]
                        break
                else:
                    nodes.append(_Node(rest[0], "UNKNOWN,*,*,*,*,*,*,*"))
                    rest = rest[1:]
        return nodes


SENT = "네팔은 경복궁에 있다"


def test_adapter_emits_engine_records():
    toks = tokens_from_tagger(MockTagger(), SENT)
    assert [set(t) == set(TOKEN_FIELDS) for t in toks]
    assert [(t["word"], t["pos"]) for t in toks] == [
        ("네팔", "NNP"), ("은", "JX"), ("경복궁", "NNP"), ("에", "JKB"),
        ("있", "VV"), ("다", "EF")]
    # positional indexes: space / mecab_token / mecab_compound
    assert [t["space"] for t in toks] == [0, 0, 1, 1, 2, 2]
    assert [t["mecab_token"] for t in toks] == [0, 1, 2, 3, 4, 4]
    assert [t["mecab_compound"] for t in toks] == [0, 1, 2, 3, 4, 5]
    # char offsets in the ORIGINAL text; the Inflect sub-tokens SHARE
    # the group span (있다 at chars 9-11)
    assert (toks[0]["begin"], toks[0]["end"]) == (0, 2)
    assert (toks[4]["begin"], toks[4]["end"]) == (9, 11)
    assert (toks[5]["begin"], toks[5]["end"]) == (9, 11)


def test_adapter_compound_spans():
    toks = tokens_from_tagger(MockTagger(), "능금나무")
    assert [(t["word"], t["pos"], t["begin"], t["end"]) for t in toks] == [
        ("능금", "NNG", 0, 2), ("나무", "NNG", 2, 4)]
    assert all(t["type"] == "Compound" and t["reading"] == "능금나무"
               for t in toks)


def _mock_gazetteer_rows():
    """S4/D2 through the SAME tagger: entries tokenized by the mock."""
    tagger = MockTagger()
    rows = []
    for large, small, surface in [
            ("ner_example_location_country", "c", "네팔"),
            ("ner_example_location_tour", "t", "경복궁")]:
        words = [t["word"] for t in tokens_from_tagger(tagger, surface)]
        rows.append((large, small, surface, " ".join(words)))
    return rows


def test_annotate_udf_accepts_tagger(spark):
    """The distributed annotate UDF runs end-to-end on mock-tagger
    tokens: same mentions as a driver-side kernel matcher pass over
    the same adapter tokens, byte-identical extracted text."""
    import os

    from python_mecab_ner_spark.operators.annotate import annotate_pages

    # the tokenizer closure pickles a reference to THIS module; ship
    # the file so executors can import it (exactly what a production
    # job does for its real-tagger adapter module via --py-files)
    spark.sparkContext.addPyFile(os.path.abspath(__file__))

    rows = _mock_gazetteer_rows()
    bc = spark.sparkContext.broadcast(rows)
    pages = spark.createDataFrame(
        [("u1", SENT), ("u2", "경복궁에 있다"), ("u3", "능금나무")],
        "url string, text string")

    def mock_tokenizer(text):
        return tokens_from_tagger(MockTagger(), text)

    ann = {r.url: r for r in
           annotate_pages(pages, bc, with_tokens=True,
                          tokenizer=mock_tokenizer).collect()}

    gaz = CompiledGazetteer(rows)
    texts = {"u1": SENT, "u2": "경복궁에 있다", "u3": "능금나무"}
    for url, text in texts.items():
        toks = mock_tokenizer(text)
        want = [(m.start, m.end, m.surface, m.large)
                for m in find_mentions(toks, gaz)]
        got_tokens = [(t["word"], t["pos"]) for t in ann[url].tokens]
        assert got_tokens == [(t["word"], t["pos"]) for t in toks]
        got = [(m["start"], m["end"], m["surface"], m["large"])
               for m in ann[url].mentions]
        # annotate runs infer_extend; on this corpus no mention has an
        # extendable NNG/NNP left-neighbor outside itself, so raw ==
        # extended and the parity is exact
        assert got == want
        assert ann[url].extracted_text == \
            " ".join(t["word"] for t in toks)
    assert ann["u1"].mentions, "expected gazetteer hits via the tagger"
