"""Hangul syllable <-> compatibility-jamo conversion.

Standard Unicode arithmetic (syllable = 0xAC00 + 588*cho + 28*jung +
jong), producing Hangul *Compatibility* Jamo (U+3130 block) like the
reference library does (reference: python_mecab_ner/service/unicode.py,
itself derived from the public hangul-utils project).  Used for:

- jamo-level shingling in canonicalization / MinHash blocking,
- alias normalization in entity linking,
- fuzzy (jamo-substring) surface comparison.

Decomposition drops the jongseong position entirely when a syllable has
no final consonant (reference `to_jaso` appends JONGSUNGS[0] == '').
"""

from __future__ import annotations

_SYL_BASE = 0xAC00
_SYL_LAST = 0xD7A3
_N_JUNG = 21
_N_JONG = 28

# Compatibility-jamo codepoints, index-aligned with the syllable formula.
_CHO = [chr(c) for c in (
    0x3131, 0x3132, 0x3134, 0x3137, 0x3138, 0x3139, 0x3141, 0x3142,
    0x3143, 0x3145, 0x3146, 0x3147, 0x3148, 0x3149, 0x314A, 0x314B,
    0x314C, 0x314D, 0x314E)]
_JUNG = [chr(0x314F + i) for i in range(_N_JUNG)]
# index 0 = "no final consonant" -> empty string
_JONG = [""] + [chr(c) for c in (
    0x3131, 0x3132, 0x3133, 0x3134, 0x3135, 0x3136, 0x3137, 0x3139,
    0x313A, 0x313B, 0x313C, 0x313D, 0x313E, 0x313F, 0x3140, 0x3141,
    0x3142, 0x3144, 0x3145, 0x3146, 0x3147, 0x3148, 0x314A, 0x314B,
    0x314C, 0x314D, 0x314E)]

_CHO_IDX = {c: i for i, c in enumerate(_CHO)}
_JUNG_IDX = {c: i for i, c in enumerate(_JUNG)}
_JONG_IDX = {c: i for i, c in enumerate(_JONG) if c}


def is_syllable(ch: str) -> bool:
    return _SYL_BASE <= ord(ch) <= _SYL_LAST


def has_jongseong(word: str) -> bool:
    """True when the last char is a Hangul syllable with a final consonant."""
    if not word:
        return False
    ch = word[-1]
    if not is_syllable(ch):
        return False
    return (ord(ch) - _SYL_BASE) % _N_JONG != 0


def decompose_char(ch: str) -> tuple[str, str, str]:
    """Syllable -> (cho, jung, jong); jong is '' when absent."""
    code = ord(ch) - _SYL_BASE
    jong = code % _N_JONG
    rest = code // _N_JONG
    return _CHO[rest // _N_JUNG], _JUNG[rest % _N_JUNG], _JONG[jong]


def to_jamo(text: str) -> str:
    """Flatten syllables to a compat-jamo stream; pass non-Hangul through.

    Matches the reference's `to_jaso`: syllables without a final
    consonant contribute only two jamo characters.
    """
    out: list[str] = []
    for ch in text:
        if is_syllable(ch):
            out.extend(decompose_char(ch))
        else:
            out.append(ch)
    return "".join(out)


def compose(cho: str, jung: str, jong: str = "") -> str:
    """(cho, jung[, jong]) compat jamo -> one syllable."""
    j = _JONG_IDX[jong] if jong else 0
    return chr(_SYL_BASE + (_CHO_IDX[cho] * _N_JUNG + _JUNG_IDX[jung]) * _N_JONG + j)


def from_jamo(stream: str) -> str:
    """Greedy left-to-right recomposition of a compat-jamo stream.

    Consumes cho+jung(+jong) triples where possible; a jong candidate is
    only absorbed when the following char does not start a new syllable
    (i.e. is not a cho followed by a jung).  Characters that cannot form
    a syllable pass through unchanged.  This is a simplification of the
    reference's queue automaton (`join_jamos`) sufficient for alias
    normalization round-trips of well-formed decompositions.
    """
    out: list[str] = []
    i, n = 0, len(stream)
    while i < n:
        c = stream[i]
        if c in _CHO_IDX and i + 1 < n and stream[i + 1] in _JUNG_IDX:
            jung = stream[i + 1]
            jong = ""
            nxt = i + 2
            if nxt < n and stream[nxt] in _JONG_IDX:
                # absorb as final unless it begins the next syllable
                if not (stream[nxt] in _CHO_IDX and nxt + 1 < n and stream[nxt + 1] in _JUNG_IDX):
                    jong = stream[nxt]
                    nxt += 1
            out.append(compose(c, jung, jong))
            i = nxt
        else:
            out.append(c)
            i += 1
    return "".join(out)


def jamo_shingles(text: str, k: int = 3) -> list[str]:
    """k-gram shingles over the jamo stream (spaces removed), for
    MinHash/LSH blocking in canonicalization."""
    stream = to_jamo(text.replace(" ", ""))
    if len(stream) < k:
        return [stream] if stream else []
    return [stream[i:i + k] for i in range(len(stream) - k + 1)]
