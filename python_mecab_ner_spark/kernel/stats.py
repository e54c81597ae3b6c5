"""Learned neighbor-context statistics: the kernel twin of the Spark
stats/linking operators (one source of truth for tests and the Spark
SQL expressions).

Generalizes the reference's experimental statistical subsystem:

- neighbor_counts == set_mecab_token_storage's neighbor_word Counter
  (reference mecab_category_storage.py:326-354): per label, counts of
  (word, pos) tokens within +-NEIGHBOR_DISTANCE of an entity span.
- core_counts == core_key_word (same function, level 1): per label,
  counts of the entity's LAST (word, pos).
- score_label == delete_duplicate_value's scoring (reference
  mecab_category_storage.py:39-63): the reference sums
  log(neighbor_count + 1) over the +-3 context; we use the exact
  integer CAPPED PRODUCT prod(min(count, CAP) + 1), which has the
  same argmax whenever no count exceeds CAP (log is monotone:
  sum log(c_i+1) = log prod(c_i+1)) and is bit-exact across engines —
  float log sums are last-ulp fragile cross-engine, the exact trap the
  oracle contract forbids.  CAP=63 bounds the product at 64^6 = 2^36
  for the 6-token (+-3 minus span) context window, exactly
  representable in the double that SQL product() aggregates return on
  BOTH engines (2^36 << 2^53).
- brute_score == set_infer_ner's brute branch (reference
  mecab_category_storage.py:534-595): plain sum of core counts over
  the [start-2, end+2) window.
"""

from __future__ import annotations

NEIGHBOR_DISTANCE = 3   # reference mecab_category_storage.py:23
BRUTE_DISTANCE = 2      # reference mecab_category_storage.py:577
SCORE_CAP = 63
DUPLICATE_DISTANCE = 5  # reference mecab_category_storage.py:621
# reference mecab_category_storage.py:16 (duplicate_pos)
DUPLICATE_POS = frozenset(["NNG", "NNP", "VV", "VA"])


def neighbor_counts(token_rows, mention_spans, window: int = NEIGHBOR_DISTANCE):
    """token_rows: [(word, pos)] per sentence position;
    mention_spans: [(start, end_exclusive, label)].
    Returns {(label, word, pos): count} over the +-window context of
    each span (span-internal positions excluded)."""
    counts: dict = {}
    for start, end, label in mention_spans:
        lo = max(0, start - window)
        hi = min(len(token_rows), end + window)
        for i in range(lo, hi):
            if start <= i < end:
                continue
            w, p = token_rows[i]
            key = (label, w, p)
            counts[key] = counts.get(key, 0) + 1
    return counts


def core_counts(mention_tokens_by_label):
    """{label: [[(word,pos), ...] per mention]} -> {(label, word, pos):
    count} of mention LAST tokens (reference core_key_word)."""
    counts: dict = {}
    for label, mentions in mention_tokens_by_label.items():
        for toks in mentions:
            if not toks:
                continue
            w, p = toks[-1]
            key = (label, w, p)
            counts[key] = counts.get(key, 0) + 1
    return counts


def score_label(counts, label, context_tokens, cap: int = SCORE_CAP) -> int:
    """Capped-product neighbor score (argmax-equivalent to the
    reference's sum of log(count+1) while counts <= cap).  Returns 1
    when no context token has evidence (the multiplicative zero)."""
    score = 1
    for w, p in context_tokens:
        c = counts.get((label, w, p), 0)
        score *= min(c, cap) + 1
    return score


def brute_score(counts, label, window_tokens) -> int:
    """Plain core-count sum over the widened window (reference brute
    branch: mecab_category_storage.py:577-581)."""
    return sum(counts.get((label, w, p), 0) for w, p in window_tokens)


def duplicate_score(core_counts, neighbor_counts, label, token_rows,
                    anchor: int, window: int = DUPLICATE_DISTANCE,
                    pos_filter=DUPLICATE_POS) -> int:
    """The reference's SECOND homonym-disambiguation policy
    (delete_duplicate, mecab_category_storage.py:619-656): plain raw
    SUM of core + neighbor counts of the label over the
    [anchor-window, anchor+window) token window, the anchor position
    itself excluded, restricted to tokens whose POS is in
    duplicate_pos (NNG/NNP/VV/VA).  Additive — use floor=0 with
    best_label.  pos_filter=None disables the POS gate (for corpora
    without POS tags)."""
    score = 0
    lo = max(0, anchor - window)
    hi = min(len(token_rows), anchor + window)
    for i in range(lo, hi):
        if i == anchor:
            continue
        w, p = token_rows[i]
        if pos_filter is not None and p not in pos_filter:
            continue
        score += core_counts.get((label, w, p), 0) \
            + neighbor_counts.get((label, w, p), 0)
    return score


def best_label(labels, scorer, *, floor: int) -> tuple | None:
    """argmax with the deterministic tiebreaker (score desc, label
    asc); None when every score is at the no-evidence floor.  `floor`
    is keyword-REQUIRED because the right value depends on the scorer:
    1 for the multiplicative neighbor score (score_label), 0 for the
    additive brute/duplicate scores — a defaulted floor silently drops
    score-1 labels for additive callers."""
    best = None
    for label in sorted(labels):
        s = scorer(label)
        if best is None or s > best[1]:
            best = (label, s)
    if best is None or best[1] <= floor:
        return None
    return best
