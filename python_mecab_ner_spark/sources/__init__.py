"""Data sources: deterministic corpus synthesis, gazetteer ingest,
table catalog (partitioned Parquet now, Iceberg when a runtime jar is
present)."""
