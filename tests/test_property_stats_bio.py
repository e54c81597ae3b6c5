"""Hypothesis property tests for the round-2 kernel modules
(stats scoring, BIO writeback, POS-seq scan) — the §5 test-pyramid
layer that pins invariants no golden can cover exhaustively."""

from hypothesis import given, settings
from hypothesis import strategies as st

from python_mecab_ner_spark.kernel.bio import bio_vector
from python_mecab_ner_spark.kernel.posseq import PosSeqScanner
from python_mecab_ner_spark.kernel.stats import (SCORE_CAP, best_label,
                                                 neighbor_counts, score_label)

POS = st.sampled_from(["NNG", "NNP", "VV", "JKB", "EC", "SY"])
WORD = st.text(alphabet="abcdefg", min_size=1, max_size=3)


spans_strategy = st.lists(
    st.tuples(st.integers(0, 10), st.integers(1, 6),
              st.sampled_from(["X", "Y", "Z"])),
    max_size=5).map(lambda xs: [(s, s + l, lab) for s, l, lab in xs])


@settings(max_examples=200, deadline=None)
@given(n=st.integers(0, 20), spans=spans_strategy)
def test_bio_vector_invariants(n, spans):
    labels = bio_vector(n, spans)
    assert len(labels) == n
    for i, lab in enumerate(labels):
        if lab == "O":
            assert not any(s <= i < e for s, e, _ in spans if s < n)
        else:
            # every labeled position is explained by a covering span
            # with the right B/I role relative to THAT span's start
            prefix, name = lab[:2], lab[2:]
            assert any(s <= i < e and name == l
                       and (prefix == "B-") == (i == s)
                       for s, e, l in spans)
    # NOTE orphan I- CAN appear for overlapping input spans — that is
    # reference-faithful (set_mecab_label stamps I- at any non-start
    # position, and the first-writer guard only skips taken tokens,
    # mecab_category_storage.py:157-169); non-overlapping spans below
    # produce well-formed BIO
    if not any(set(range(s1, e1)) & set(range(s2, e2))
               for i1, (s1, e1, _) in enumerate(spans)
               for (s2, e2, _) in spans[i1 + 1:]):
        for i, lab in enumerate(labels):
            if lab.startswith("I-"):
                assert i > 0 and labels[i - 1] in (f"B-{lab[2:]}",
                                                   f"I-{lab[2:]}")


@settings(max_examples=150, deadline=None)
@given(tags=st.lists(POS, max_size=15),
       pats=st.lists(st.lists(POS, min_size=1, max_size=3),
                     min_size=1, max_size=6))
def test_posseq_scan_invariants(tags, pats):
    sc = PosSeqScanner(pats)
    spans = sc.scan(tags)
    seen = set()
    for s, e, seq in spans:
        assert 0 <= s < e <= len(tags)
        # the reported sequence matches the tags exactly
        assert "+".join(tags[s:e]) == seq
        # spans never overlap (reference CK masking)
        for i in range(s, e):
            assert i not in seen
            seen.add(i)
    # every unigram pattern position is covered by SOME span
    unigrams = {p[0] for p in pats if len(p) == 1}
    for i, t in enumerate(tags):
        if t in unigrams:
            assert i in seen


@settings(max_examples=150, deadline=None)
@given(tokens=st.lists(st.tuples(WORD, POS), min_size=1, max_size=12),
       start=st.integers(0, 5), length=st.integers(1, 4))
def test_neighbor_counts_window_bounds(tokens, start, length):
    end = min(len(tokens), start + length)
    if start >= len(tokens):
        return
    counts = neighbor_counts(tokens, [(start, end, "L")])
    # every counted (word, pos) occurs within +-3 of the span and
    # outside it
    window = [tokens[i] for i in range(max(0, start - 3),
                                       min(len(tokens), end + 3))
              if not (start <= i < end)]
    assert sum(counts.values()) == len(window)
    for (lab, w, p), c in counts.items():
        assert lab == "L" and c >= 1
        assert (w, p) in window


@settings(max_examples=150, deadline=None)
@given(ctx=st.lists(st.tuples(WORD, POS), max_size=6),
       extra=st.tuples(WORD, POS), cnt=st.integers(1, SCORE_CAP))
def test_score_monotone_in_evidence(ctx, extra, cnt):
    """Adding evidence for a label never lowers its score (the
    property that makes the capped product an argmax twin of the
    reference's log-smoothed sum)."""
    base = {("A", w, p): 1 for w, p in ctx}
    s0 = score_label(base, "A", ctx)
    more = dict(base)
    more[("A", extra[0], extra[1])] = more.get(("A",) + extra, 0) + cnt
    s1 = score_label(more, "A", ctx)
    assert s1 >= s0
    # and the winner flips toward the label with strictly more
    # evidence on a shared context token
    if ctx:
        w, p = ctx[0]
        counts = {("A", w, p): 2, ("B", w, p): 1}
        win = best_label(["A", "B"],
                         lambda lab: score_label(counts, lab, [ctx[0]]),
                         floor=1)
        assert win is not None and win[0] == "A"


@settings(max_examples=200, deadline=None)
@given(qvec=st.lists(st.floats(-1, 1, allow_nan=False, width=32),
                     min_size=8, max_size=64),
       band=st.integers(0, 7), bits=st.integers(1, 8),
       t1=st.integers(0, 8), t2=st.integers(0, 8))
def test_probe_keys_properties(qvec, band, bits, t1, t2):
    """Multi-probe key-set invariants: contains the query's own key,
    size is exactly 1 + min(t1, b) + C(min(t2, b), 2) minus XOR
    collisions (pair flips are distinct from single flips and the base
    by construction, so no collisions: exact size), every key within
    Hamming distance 2 of the base, and the set is deterministic."""
    from python_mecab_ner_spark.operators.ann import probe_keys
    n_bands = 8
    keys = probe_keys(qvec, band, bits, n_bands, t1, t2)
    assert keys == sorted(set(keys))
    b_eff = len([i for i in range(bits) if band + i * n_bands < len(qvec)])
    qkey = 0
    for i in range(bits):
        idx = band + i * n_bands
        if idx < len(qvec) and qvec[idx] >= 0:
            qkey |= 1 << i
    assert qkey in keys
    s1 = min(t1, b_eff)
    s2 = min(t2, b_eff)
    assert len(keys) == 1 + s1 + s2 * (s2 - 1) // 2
    for k in keys:
        assert bin(k ^ qkey).count("1") <= 2
    assert probe_keys(qvec, band, bits, n_bands, t1, t2) == keys


@settings(max_examples=200, deadline=None)
@given(tokens=st.lists(st.tuples(WORD, POS), max_size=12),
       anchor=st.integers(0, 11),
       cnts=st.dictionaries(st.tuples(st.sampled_from(["A", "B"]), WORD, POS),
                            st.integers(0, 9), max_size=8))
def test_duplicate_score_properties(tokens, anchor, cnts):
    """delete_duplicate twin invariants: additive and non-negative,
    never counts the anchor position, POS-gated sum <= ungated sum,
    and splitting counts between the core and neighbor maps never
    changes the total (the reference adds counter_dict +
    counter_near_dict)."""
    from python_mecab_ner_spark.kernel.stats import duplicate_score
    s_gated = duplicate_score(cnts, {}, "A", tokens, anchor)
    s_open = duplicate_score(cnts, {}, "A", tokens, anchor,
                             pos_filter=None)
    assert 0 <= s_gated <= s_open
    # split invariance: core+neighbor maps sum, they don't interact
    half = {k: v // 2 for k, v in cnts.items()}
    rest = {k: v - half[k] for k, v in cnts.items()}
    assert duplicate_score(half, rest, "A", tokens, anchor,
                           pos_filter=None) == s_open
    # anchor exclusion: inflating evidence AT the anchor changes nothing
    if 0 <= anchor < len(tokens):
        w, p = tokens[anchor]
        boosted = dict(cnts)
        boosted[("A", w, p)] = boosted.get(("A", w, p), 0) + 100
        others = [i for i in range(len(tokens))
                  if i != anchor and tokens[i] == (w, p)
                  and abs(i - anchor) <= 5]
        if not others:
            assert duplicate_score(boosted, {}, "A", tokens, anchor,
                                   pos_filter=None) == s_open
