"""BIO label writeback: the kernel twin of operators/bio.py.

Generalizes the reference's two labelers:
- set_mecab_label (mecab_category_storage.py:157-169): stamp B-label
  on an entity's first token, I-label on the rest; already-labeled
  tokens are never overwritten (first writer wins).
- set_bi_tag (mecab_category_storage.py:233-273): char-span -> token
  alignment; a token belongs to the NE iff it overlaps [begin, end)
  (the reference's three positional conditions reduce to interval
  overlap), with the same first-writer guard.

Deliberate simplifications vs the reference, documented per SURVEY.md
§7.4: the reference's star-masking consumption and jamo-fallback
re-matching inside set_bi_tag exist to recover from MeCab tokens that
disagree with the raw sentence; our tokenizer's char offsets are exact
by construction, so interval overlap is the complete rule.  Writer
order in the reference follows entity_list order (OS/dict dependent);
we fix the deterministic total order (start asc, end desc, label asc).
"""

from __future__ import annotations


def _ordered(spans):
    return sorted(spans, key=lambda s: (s[0], -s[1], s[2]))


def bio_vector(n_tokens: int, spans) -> list[str]:
    """spans: [(start, end_exclusive, label)] token-index spans ->
    per-token BIO labels, first writer wins."""
    labels = ["O"] * n_tokens
    for start, end, label in _ordered(spans):
        for i in range(max(0, start), min(n_tokens, end)):
            if labels[i] != "O":
                continue
            prefix = "B-" if i == start else "I-"
            labels[i] = prefix + label
    return labels


def char_spans_to_token_spans(tokens, ne_spans):
    """tokens: records with begin/end char offsets; ne_spans:
    [(begin, end_exclusive, label)] char spans -> [(tok_start,
    tok_end_exclusive, label)] covering every overlapping token
    (reference set_bi_tag's positional conditions as interval
    overlap)."""
    out = []
    for begin, end, label in ne_spans:
        hit = [i for i, t in enumerate(tokens)
               if t["begin"] < end and t["end"] > begin]
        if hit:
            out.append((hit[0], hit[-1] + 1, label))
    return out


def bio_from_char_spans(tokens, ne_spans) -> list[str]:
    """Char-annotated NE spans (the KLUE corpus shape, reference
    main.py:80-86) -> per-token BIO labels."""
    return bio_vector(len(tokens),
                      char_spans_to_token_spans(tokens, ne_spans))
