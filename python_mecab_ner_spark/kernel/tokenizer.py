"""Deterministic lexicon-driven tokenizer + surface restore.

Replaces the reference's MeCab lattice parse (reference
mecab_parser.py:137-217) with a longest-match segmenter over the pinned
lexicon (kernel.lexicon).  Emits the same per-token record the
reference builds: word/pos/reading/type plus the three positional
indexes (`space` whitespace-token index, `mecab_token` pre-expansion
index, `mecab_compound` post-expansion index; reference
mecab_domain.py:61-77) and char offsets.

This module is pure Python with no Spark imports: it is executed inside
Arrow-batched pandas UDFs on executors AND by the single-process pyref
oracle, guaranteeing one source of truth for the byte-identity
invariant (extracted text per url).
"""

from __future__ import annotations

from .jamo import has_jongseong, is_syllable
from .lexicon import Lexicon, default_lexicon

# Token record field order (kept in sync with operators.schemas.TOKEN_SCHEMA)
TOKEN_FIELDS = (
    "word", "pos", "has_jongseong", "reading", "type",
    "space", "mecab_token", "mecab_compound", "begin", "end", "label",
)


_JONG_CACHE: dict = {}


def _has_jongseong_cached(word: str) -> bool:
    v = _JONG_CACHE.get(word)
    if v is None:
        if len(_JONG_CACHE) >= 500_000:
            _JONG_CACHE.clear()
        v = _JONG_CACHE[word] = has_jongseong(word)
    return v


def _token(word, pos, reading, gtype, space, mtok, mcomp, begin, end):
    return {
        "word": word,
        "pos": pos,
        "has_jongseong": _has_jongseong_cached(word),
        "reading": reading,
        "type": gtype,
        "space": space,
        "mecab_token": mtok,
        "mecab_compound": mcomp,
        "begin": begin,
        "end": end,
        "label": "O",
    }


def _fallback_group(ej: str, i: int):
    """Segment one unknown position: latin runs (SL, lowercased), digit
    runs (SN), single Hangul syllables (UNKNOWN), anything else (SY)."""
    ch = ej[i]
    if ch.isascii() and ch.isalpha():
        j = i
        while j < len(ej) and ej[j].isascii() and ej[j].isalpha():
            j += 1
        return (None, ej[i:j], ((ej[i:j].lower(), "SL"),)), j - i
    if ch.isdigit():
        j = i
        while j < len(ej) and ej[j].isdigit():
            j += 1
        return (None, ej[i:j], ((ej[i:j], "SN"),)), j - i
    pos = "UNKNOWN" if is_syllable(ch) else "SY"
    return (None, ch, ((ch, pos),)), 1


def _segment_eojeol(ej: str, lex: Lexicon):
    """Memoized per-eojeol segmentation: web-corpus eojeol vocabulary
    is heavy-tailed, so the per-worker cache converts repeat eojeols to
    one dict hit.  Bounded (cleared at 200k entries) so a pathological
    corpus cannot grow worker memory unboundedly."""
    cache = getattr(lex, "_seg_cache", None)
    if cache is None:
        cache = lex._seg_cache = {}
    groups = cache.get(ej)
    if groups is None:
        groups = _segment_eojeol_uncached(ej, lex)
        if len(cache) >= 200_000:
            cache.clear()
        cache[ej] = groups
    return groups


def _segment_eojeol_uncached(ej: str, lex: Lexicon):
    """Eojeol -> tuple of groups.  Pinned whole-eojeol entries win;
    otherwise greedy longest-prefix over the chunk table with run-based
    fallback.  Deterministic by construction (no dict-order effects)."""
    entry = lex.eojeols.get(ej)
    if entry is not None:
        return entry
    low = ej.lower()
    entry = lex.eojeols.get(low)
    if entry is not None:
        return entry

    groups = []
    i, n = 0, len(low)
    while i < n:
        hit = None
        top = min(lex.max_chunk_len, n - i)
        for length in range(top, 0, -1):
            cand = lex.chunks.get(low[i:i + length])
            if cand is not None:
                hit = cand
                i += length
                break
        if hit is not None:
            groups.extend(hit)
            continue
        grp, consumed = _fallback_group(ej, i)
        groups.append(grp)
        i += consumed
    return tuple(groups)


def _eojeol_token_protos(ej: str, lex: Lexicon):
    """Memoized per-eojeol token PROTOTYPES: everything about the
    emitted tokens that does not depend on sentence position —
    (word, pos, has_jongseong, reading, type, rel_begin, rel_end,
    group_idx) — plus the group count.  The tokenize() fallthrough
    (plain eojeols, the overwhelmingly common case on a heavy-tailed
    web corpus) then emits by offset arithmetic instead of re-running
    the group walk per occurrence (the emit loop was ~30% of kernel
    CPU).  Phrase pins and remainders keep the full emit path."""
    cache = getattr(lex, "_proto_cache", None)
    if cache is None:
        cache = lex._proto_cache = {}
    entry = cache.get(ej)
    if entry is None:
        protos = []
        pos_in_ej = 0
        g = 0
        for gtype, reading, words_pos in _segment_eojeol(ej, lex):
            if reading is None:
                reading = "".join(w for w, _ in words_pos)
            g_begin = pos_in_ej
            g_end = g_begin + len(reading)
            pos_in_ej = g_end
            if gtype == "Inflect":
                for w, p in words_pos:
                    protos.append((w, p, _has_jongseong_cached(w), reading,
                                   gtype, g_begin, g_end, g))
            else:
                b = g_begin
                for w, p in words_pos:
                    protos.append((w, p, _has_jongseong_cached(w), reading,
                                   gtype, b, b + len(w), g))
                    b += len(w)
            g += 1
        if len(cache) >= 200_000:
            cache.clear()
        entry = cache[ej] = (tuple(protos), g)
    return entry


def _match_phrase(ejs_low, i, lex: Lexicon):
    """Multi-eojeol phrase pin at eojeol index i; the final eojeol may
    carry a particle suffix (segmented separately).  Returns
    (n_eojeols, [groups per eojeol], remainder_str) or None."""
    for ptuple, entries in lex.phrases.get(ejs_low[i], []):
        k = len(ptuple)
        if i + k > len(ejs_low):
            continue
        if any(ejs_low[i + j] != ptuple[j] for j in range(k - 1)):
            continue
        last = ejs_low[i + k - 1]
        if not last.startswith(ptuple[-1]):
            continue
        return k, list(entries), last[len(ptuple[-1]):]
    return None


def tokenize(text: str, lex: Lexicon | None = None) -> list[dict]:
    """Sentence -> expanded token records (the reference's
    gen_mecab_compound_token_feature output, mecab_parser.py:208-217)."""
    lex = lex or default_lexicon()
    ejs = text.split()
    ejs_low = [e.lower() for e in ejs]
    # eojeol char offsets in the original text
    begins = []
    offset = 0
    for ej in ejs:
        b = text.index(ej, offset)
        begins.append(b)
        offset = b + len(ej)

    tokens: list[dict] = []
    mtok = 0
    mcomp = 0

    def emit(groups, ej_begin, space_idx, start_in_ej=0):
        nonlocal mtok, mcomp
        pos_in_ej = start_in_ej
        for gtype, reading, words_pos in groups:
            if reading is None:
                reading = "".join(w for w, _ in words_pos)
            g_begin = ej_begin + pos_in_ej
            g_end = g_begin + len(reading)
            pos_in_ej += len(reading)
            if gtype == "Inflect":
                # sub-tokens share the whole group span (reference
                # mecab_parser.py:182-190)
                for w, p in words_pos:
                    tokens.append(_token(w, p, reading, gtype, space_idx,
                                         mtok, mcomp, g_begin, g_end))
                    mcomp += 1
            else:
                b = g_begin
                for w, p in words_pos:
                    tokens.append(_token(w, p, reading, gtype, space_idx,
                                         mtok, mcomp, b, b + len(w)))
                    b += len(w)
                    mcomp += 1
            mtok += 1
        return pos_in_ej

    i = 0
    while i < len(ejs):
        hit = _match_phrase(ejs_low, i, lex) if ejs_low[i] in lex.phrases else None
        if hit is not None:
            k, per_ej_groups, remainder = hit
            for j in range(k):
                consumed = emit(per_ej_groups[j], begins[i + j], i + j)
                if j == k - 1 and remainder:
                    emit(_segment_eojeol(remainder, lex), begins[i + j], i + j,
                         start_in_ej=consumed)
            i += k
            continue
        # plain-eojeol fast path: cached prototypes + offset arithmetic
        # (byte-identical to emit(_segment_eojeol(...), ...))
        protos, n_groups = _eojeol_token_protos(ejs[i], lex)
        eb = begins[i]
        for w, p, jong, reading, gtype, rb, re_, gi in protos:
            tokens.append({
                "word": w, "pos": p, "has_jongseong": jong,
                "reading": reading, "type": gtype, "space": i,
                "mecab_token": mtok + gi, "mecab_compound": mcomp,
                "begin": eb + rb, "end": eb + re_, "label": "O"})
            mcomp += 1
        mtok += n_groups
        i += 1
    return tokens


def words(tokens: list[dict]) -> list[str]:
    return [t["word"] for t in tokens]


def extracted_text(text: str, lex: Lexicon | None = None) -> str:
    """The byte-identity anchor: space-joined expanded words (reference
    get_word_from_mecab_compound, mecab_parser.py:219-231)."""
    return " ".join(words(tokenize(text, lex)))


_INFLECT_WORD_POS = ("NNG", "NNP", "XSN", "UNA")


def restore_tokens(tokens: list[dict]) -> list[str]:
    """Token slice -> original eojeol surfaces, one string per distinct
    `space` index in ascending order (reference
    mecab_storage.py:54-88).  Inflect groups with non-nominal POS emit
    their `reading` once (consecutive same reading+space deduped)."""
    data: dict[int, list[str]] = {}
    tmp_word = None
    tmp_space = None
    for t in tokens:
        sp = t["space"]
        if t["type"] is None:
            data.setdefault(sp, []).append(t["word"])
            tmp_word = None
            continue
        if tmp_word == t["reading"] and tmp_space == sp:
            continue
        if t["type"] == "Inflect" and t["pos"] not in _INFLECT_WORD_POS:
            rv = t["reading"]
        else:
            rv = t["word"]
        data.setdefault(sp, []).append(rv)
        tmp_word = rv
        tmp_space = sp
    return ["".join(data[k]) for k in sorted(data)]


def restore_surface(tokens: list[dict]) -> str:
    return " ".join(restore_tokens(tokens))
