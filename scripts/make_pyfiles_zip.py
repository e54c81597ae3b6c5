"""Build dist/python_mecab_ner_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "python_mecab_ner_spark.zip"
    pkg = REPO / "python_mecab_ner_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg.rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
        for tsv in sorted(pkg.rglob("*.tsv")):
            zf.write(tsv, tsv.relative_to(REPO))
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
