"""Portable deterministic hashing.

Engine-internal hot paths use xxhash64 (JVM-side, codegen-friendly).
Cross-engine-checkable operators (dedup keys, minhash, simhash,
fingerprints) use an md5-derived 32/60-bit integer that DuckDB computes
identically, so every hash-bearing query has an exact SQL oracle:

    Spark : conv(substr(md5(s), 1, 15), 16, 10)::bigint
    DuckDB: ('0x' || substr(md5(s), 1, 15))::bigint

15 hex digits = 60 bits, safely inside a signed BIGINT in both engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_int(col, bits_hex: int = 15, salt: str = "") -> Column:
    """Spark Column: md5-derived non-negative bigint of a string col."""
    s = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(s), 1, bits_hex), 16, 10).cast("bigint")


def md5_int_sql(expr: str, bits_hex: int = 15, salt: str = "") -> str:
    """DuckDB SQL twin of md5_int (same value, same inputs)."""
    inner = f"concat('{salt}', {expr})" if salt else expr
    return f"(('0x' || substr(md5({inner}), 1, {bits_hex}))::bigint)"


def md5_int_py(s: str, bits_hex: int = 15, salt: str = "") -> int:
    """Python twin (used inside pandas UDFs / kernel code)."""
    return int(hashlib.md5((salt + s).encode("utf-8")).hexdigest()[:bits_hex], 16)


def bucket(col, n: int, salt: str = "") -> Column:
    """Stable partition-key bucketing (used by lineage/resume)."""
    return F.pmod(md5_int(col, salt=salt), F.lit(n)).cast("int")


def bucket_sql(expr: str, n: int, salt: str = "") -> str:
    return f"(({md5_int_sql(expr, salt=salt)}) % {n})"
