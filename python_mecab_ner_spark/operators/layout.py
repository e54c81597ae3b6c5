"""Data-layout operators: Z-order (Morton) clustering keys and the
zone-map data-skipping audit that justifies them.

At 100 TB the scan is the query: a parquet lake is pruned by per-file
min/max zone maps, and pruning quality is decided ENTIRELY by how
rows were laid out at write time.  A single-column sort (the default
"partition by day" layout) gives perfect pruning on that column and
NONE on any other; interleaving the bits of two (or more) bucketized
dimensions into one Morton key and range-splitting on it bounds the
per-file span of EVERY interleaved dimension at once — the standard
Delta/Iceberg OPTIMIZE ZORDER rationale, computed here as plain
integer columns so the layout decision is testable and
oracle-certifiable.

Everything is exact 64-bit integer bit arithmetic (shiftleft /
shiftright / &), no UDFs: the key computation rides the scan stage
and the audit is one explode + one combinable aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(d1: Column, d2: Column, bits: int = 6) -> Column:
    """Morton-interleave two `bits`-bit bucket ids into one 2*bits-bit
    key (d1 takes the odd bit positions).  Callers bucketize first
    (e.g. `user_id % 64`, `day % 64`); values outside [0, 2^bits)
    alias by truncation — bucketize, don't trust."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(d1, i)
                                 .bitwiseAND(F.lit(1)), 2 * i + 1))
        parts.append(F.shiftleft(F.shiftright(d2, i)
                                 .bitwiseAND(F.lit(1)), 2 * i))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out.cast("bigint")


def layout_audit(df: DataFrame, d1: Column, d2: Column,
                 bits: int = 6, file_bits: int = 6) -> DataFrame:
    """Zone-map audit of two write layouts over the same rows:
    `zorder` range-splits the Morton key into 2^file_bits files,
    `linear` range-splits the d2-major concatenated key (the
    "sort by time, then whatever" default).  Returns one row per
    (layout, file_id): row count + per-file min/max of both
    dimensions — the exact zone maps a reader's pruning sees.  Under
    `linear`, d1 spans the full domain in every file (a d1-sliced
    query reads ALL files); under `zorder`, both spans are bounded
    by the interleave, so either dimension prunes.

    ONE corpus scan: both (layout, file_id) assignments ride in an
    exploded 2-element array, then one combinable min/max aggregate
    on the 2*2^file_bits-key space.  No sort is performed — file
    assignment is arithmetic on the key, which is exactly what a
    range-partitioning writer would do with the same key."""
    shift = 2 * bits - file_bits
    z = zorder_key(d1, d2, bits)
    lin = (F.shiftleft(d2, bits) + d1).cast("bigint")
    tagged = df.select(
        d1.cast("bigint").alias("d1"), d2.cast("bigint").alias("d2"),
        F.explode(F.array(
            F.struct(F.lit("zorder").alias("layout"),
                     F.shiftright(z, shift).cast("bigint")
                     .alias("file_id")),
            F.struct(F.lit("linear").alias("layout"),
                     F.shiftright(lin, shift).cast("bigint")
                     .alias("file_id")))).alias("f"))
    return (tagged.groupBy(F.col("f.layout").alias("layout"),
                           F.col("f.file_id").alias("file_id"))
            .agg(F.count("*").cast("bigint").alias("n_rows"),
                 F.min("d1").alias("d1_min"), F.max("d1").alias("d1_max"),
                 F.min("d2").alias("d2_min"), F.max("d2").alias("d2_max")))


def reshard_audit(df: DataFrame, key_col, n_from: int = 16,
                  n_to: int = 17, salt: str = "shard:") -> DataFrame:
    """Elastic-resharding audit: how many keys MOVE when the shard
    count grows n_from -> n_to, under (a) mod-hash placement and
    (b) rendezvous / highest-random-weight hashing (Thaler &
    Ravishankar 1998 — each key goes to the shard whose
    md5(key#shard) is largest).  Mod placement remaps ~(1 - 1/n_to)
    of ALL keys on any resize — every bucket boundary shifts — while
    rendezvous moves only the ~1/n_to of keys the NEW shard wins:
    the difference between re-ingesting the lake and topping up one
    node.  The data-placement complement of zorder/layout_audit
    (that file layout is WITHIN a shard; this is which shard).

    Integer determinism: 48-bit md5 weights packed as (h << 6) | s
    so one n-ary greatest() both picks the max weight AND carries
    the winning shard id (the house packed-argmax; 6 bits caps
    shards at 64, asserted).  One corpus scan, one 2-row aggregate.

    Returns (method, n_keys, moved, moved_ppm)."""
    from ..functions.hashing import md5_int
    assert 2 <= n_from <= 64 and 2 <= n_to <= 64, \
        "2..64 shards (packed id is 6 bits; greatest() needs >= 2)"
    key = key_col if hasattr(key_col, "cast") else F.col(key_col)
    h = md5_int(key, bits_hex=12, salt=salt)

    def hrw(n):
        packed = [
            F.shiftleft(md5_int(F.concat(key, F.lit(f"#{s}")),
                                bits_hex=12, salt=salt), 6) + s
            for s in range(n)]
        return F.pmod(F.greatest(*packed), F.lit(64))
    tagged = df.select(
        (F.pmod(h, F.lit(n_from)) != F.pmod(h, F.lit(n_to)))
        .cast("int").alias("mod_moved"),
        (hrw(n_from) != hrw(n_to)).cast("int").alias("hrw_moved"))
    agg = tagged.agg(F.count("*").alias("n"),
                     F.sum("mod_moved").alias("mm"),
                     F.sum("hrw_moved").alias("hm"))
    return agg.selectExpr(
        "stack(2, 'mod', CAST(mm AS BIGINT),"
        " 'rendezvous', CAST(hm AS BIGINT)) AS (method, moved)",
        "CAST(n AS BIGINT) AS n_keys") \
        .select("method", "n_keys", "moved",
                F.expr("(moved * 1000000) div n_keys")
                .cast("bigint").alias("moved_ppm"))
