"""Real-MeCab swap seam: adapt a MeCab-style tagger to the engine's
token records.

SURVEY.md §7.2 sanctions the pinned-lexicon segmenter with the claim
that a real MeCab tagger can be swapped in later.  This module makes
that claim load-bearing: `tokens_from_tagger` consumes any object
implementing the real tagger surface the reference uses —
`parse(text)` yielding nodes with `.surface` and the 8-field
mecab-ko-dic `.feature` CSV
(`pos,semantic,has_jongseong,reading,type,start_pos,end_pos,
expression`; reference mecab_parser.py:34-48) — and emits the exact
TOKEN_FIELDS records kernel.tokenizer.tokenize produces, including
the reference's Compound/Inflect expansion (expression split on '+',
mecab_parser.py:160-205):

- Compound sub-tokens get consecutive char spans inside the group;
- Inflect sub-tokens SHARE the whole group span (the reference's
  begin/end rule, mecab_parser.py:182-190);
- `space` is the whitespace-token index, `mecab_token` the
  pre-expansion node index, `mecab_compound` the post-expansion index.

annotate_pages(tokenizer=...) accepts any `text -> [token dict]`
callable, so `lambda t: tokens_from_tagger(real_tagger, t)` drops a
real MeCab straight into the distributed UDF; the executor-side
automaton then matches whatever tokenization the tagger emits (the
gazetteer must be compiled through the same tagger — S4/D2).
"""

from __future__ import annotations

from .jamo import has_jongseong


def _node_fields(feature: str):
    vals = [v if v != "*" else None for v in feature.split(",")]
    if len(vals) != 8:
        raise ValueError(f"expected 8-field mecab-ko-dic feature, got {feature!r}")
    return vals


def tokens_from_tagger(tagger, text: str) -> list[dict]:
    """tagger.parse(text) node stream -> engine token records
    (kernel.tokenizer.TOKEN_FIELDS shape, byte-identical contract)."""
    ejs = text.split()
    ej_begins = []
    off = 0
    for ej in ejs:
        b = text.index(ej, off)
        ej_begins.append(b)
        off = b + len(ej)

    def space_of(begin: int) -> int:
        idx = 0
        for i, b in enumerate(ej_begins):
            if b <= begin:
                idx = i
            else:
                break
        return idx

    tokens: list[dict] = []
    cursor = 0
    mcomp = 0
    for mtok, node in enumerate(tagger.parse(text)):
        pos, _sem, jong, reading, gtype, _sp, _ep, expr = \
            _node_fields(node.feature)
        surface = node.surface
        reading = reading if reading is not None else surface
        g_begin = text.index(surface, cursor)
        g_end = g_begin + len(surface)
        cursor = g_end
        if gtype in ("Compound", "Inflect") and expr:
            parts = [p.split("/") for p in expr.split("+")]
            b = g_begin
            for word, sub_pos, _x in parts:
                if gtype == "Inflect":
                    # sub-tokens share the whole group span (reference
                    # mecab_parser.py:182-190)
                    begin, end = g_begin, g_end
                else:
                    begin, end = b, b + len(word)
                    b += len(word)
                tokens.append({
                    "word": word, "pos": sub_pos,
                    "has_jongseong": has_jongseong(word),
                    "reading": reading, "type": gtype,
                    "space": space_of(g_begin), "mecab_token": mtok,
                    "mecab_compound": mcomp, "begin": begin, "end": end,
                    "label": "O"})
                mcomp += 1
        else:
            tokens.append({
                "word": surface, "pos": pos,
                "has_jongseong": (jong == "T") if jong else
                has_jongseong(surface),
                "reading": reading, "type": gtype,
                "space": space_of(g_begin), "mecab_token": mtok,
                "mecab_compound": mcomp, "begin": g_begin, "end": g_end,
                "label": "O"})
            mcomp += 1
    return tokens
