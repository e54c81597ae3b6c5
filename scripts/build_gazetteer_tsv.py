"""One-time dev script: flatten the reference's compiled gazetteer
(`python_mecab_ner/data/mecab_data/*.txt`, lines `original,tokenized`,
headers `#small`) into a single TSV asset shipped with this repo.

The mecab_data files are the reference's materialized tokenization
cache (written by MecabDataController.write_category, reference
mecab_reader.py:221-241) and double as the tokenizer oracle: each line
pins the exact reference tokenization of one surface form.

Output: python_mecab_ner_spark/data/gazetteer.tsv with columns
    large \t small \t surface \t tokenized (space-joined words)

Also reports alignment diagnostics: surfaces whose per-eojeol word
concatenation does not reproduce the eojeol text (these need Inflect
-style handling in the lexicon).
"""

from __future__ import annotations

import sys
from pathlib import Path

SRC = Path("/root/reference/python_mecab_ner/data/mecab_data")
DST = Path(__file__).resolve().parent.parent / "python_mecab_ner_spark" / "data" / "gazetteer.tsv"


def eojeol_concat_ok(original: str, words: list[str]) -> bool:
    """Check the per-eojeol greedy concat alignment used by the lexicon."""
    wi = 0
    for ej in original.lower().split():
        consumed = ""
        while wi < len(words) and consumed != ej:
            nxt = consumed + words[wi]
            if ej.startswith(nxt):
                consumed = nxt
                wi += 1
            else:
                return False
        if consumed != ej:
            return False
    return wi == len(words)


def main() -> None:
    rows: list[tuple[str, str, str, str]] = []
    misaligned: list[tuple[str, str]] = []
    for path in sorted(SRC.glob("*.txt")):
        large = path.stem
        small = large
        for line in path.read_text(encoding="utf-8-sig").splitlines():
            line = line.strip()
            if not line:
                continue
            if line.startswith("#"):
                small = line[1:].strip()
                continue
            original, _, tokenized = line.partition(",")
            words = tokenized.split()
            if not eojeol_concat_ok(original, words):
                misaligned.append((original, tokenized))
            rows.append((large, small, original, tokenized))

    DST.parent.mkdir(parents=True, exist_ok=True)
    with DST.open("w", encoding="utf-8") as f:
        f.write("large\tsmall\tsurface\ttokenized\n")
        for r in rows:
            f.write("\t".join(r) + "\n")

    print(f"wrote {len(rows)} rows -> {DST}")
    print(f"misaligned (need Inflect handling): {len(misaligned)}")
    for orig, tok in misaligned:
        print(f"  {orig!r} -> {tok!r}")


if __name__ == "__main__":
    sys.exit(main())
