"""Pure-python twin of the distributed BPE trainer
(operators/bpe.py) — the agreement oracle for merge counts beyond
what the q73 unrolled-SQL oracle can cover (the SQL unroll is
per-merge; a 64+-merge run needs a programmatic twin).

Mirrors the Spark semantics BIT-EXACTLY, including the deliberate
approximations:

* words are lowercased, split on whitespace, empties dropped;
* symbols ride a space-sentinel string ' a b c ' and a merge is a
  LITERAL replace ' a b ' -> ' ab ' run 3 times (runs of up to 7
  consecutive occurrences — same divergence from exact greedy BPE as
  the engine, see operators/bpe.py docstring);
* candidate order is (cnt DESC, pair ASC bytewise) — python's
  str sort is code-point order, which equals UTF-8 byte order;
* batching uses THE SAME select_batch function as the engine
  (imported, not re-implemented) on the top max(4*batch, 8)
  candidates.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Iterable

from ..operators.bpe import select_batch

_WS = re.compile(r"\s+")


def word_freq(texts: Iterable[str]) -> Counter:
    wf: Counter = Counter()
    for t in texts:
        for w in _WS.split(t.strip().lower()):
            if w:
                wf[w] += 1
    return wf


def _sym0(word: str) -> str:
    return " " + " ".join(word) + " "


def _apply_merge(sym: str, pair: str) -> str:
    tgt = " " + pair + " "
    rep = " " + pair.replace(" ", "") + " "
    for _ in range(3):
        sym = sym.replace(tgt, rep)
    return sym


def bpe_merge_table_ref(texts: Iterable[str], iters: int,
                        batch: int = 1) -> list[tuple[int, str, int]]:
    """Returns [(rank, pair, cnt), ...] — must equal the engine's
    bpe_merge_table rows for the same corpus/iters/batch."""
    wf = word_freq(texts)
    syms = {_sym0(w): n for w, n in wf.items()}
    # identical words collapse to identical sym strings; weights sum
    merged: dict[str, int] = {}
    for s, n in syms.items():
        merged[s] = merged.get(s, 0) + n
    syms = merged
    merges: list[tuple[int, str, int]] = []
    fetch_k = max(4 * batch, 8)
    while len(merges) < iters:
        pc: Counter = Counter()
        for s, n in syms.items():
            toks = s.strip().split(" ")
            for i in range(len(toks) - 1):
                pc[toks[i] + " " + toks[i + 1]] += n
        if not pc:
            break
        top = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:fetch_k]
        accepted = select_batch(top, min(batch, iters - len(merges)))
        if not accepted:
            break
        for pair, cnt in accepted:
            merges.append((len(merges), pair, cnt))
        nxt: dict[str, int] = {}
        for s, n in syms.items():
            for pair, _ in accepted:
                s = _apply_merge(s, pair)
            nxt[s] = nxt.get(s, 0) + n
        syms = nxt
    return merges


def bpe_segment_ref(word: str, merges: list[str]) -> list[str]:
    """Apply a rank-ordered merge list to one word; returns symbols.
    Twin of operators/bpe.py::apply_merges on a single row."""
    s = _sym0(word)
    for pair in merges:
        s = _apply_merge(s, pair)
    return s.strip().split(" ")
