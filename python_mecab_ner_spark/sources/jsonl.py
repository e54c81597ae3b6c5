"""JSONL source/sink with a corrupt-record ledger.

The JSON-lines interchange path every corpus pipeline has next to
WARC (sources/warc.py) and KLUE-JSON (sources/klue.py): shards of
one-object-per-line JSON, where real-world shards carry truncated
tails, encoding damage, and mid-file garbage.  The reader NEVER
drops a line silently: Spark's PERMISSIVE JSON parse routes every
malformed line into a corrupt-record column, and the ledger
aggregates per-shard good/corrupt counts — the same
account-for-every-byte discipline as the WARC ledger/resync pair
(q145 family).  All parsing is JVM-side (from_json / the native
JSON datasource); no Python crossing.

Two layers:
- line-level (`jsonl_lines` / `parse_jsonl_lines`): pure-DataFrame
  synth + parse, used by the oracled round-trip query (q203) so the
  whole contract is hash-certified without touching a filesystem.
- file-level (`write_jsonl` / `read_jsonl_ledger`): the production
  path over real shard files, ledger keyed by input file name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def jsonl_lines(df: DataFrame, cols: list[str],
                line_col: str = "line") -> DataFrame:
    """One JSON-object line per row from the given columns (field
    order = cols order, so a deterministic prefix truncation stays
    deterministic)."""
    return df.select(
        F.to_json(F.struct(*[F.col(c) for c in cols])).alias(line_col))


def _schema_with_corrupt(schema_ddl: str) -> str:
    return f"{schema_ddl}, {CORRUPT_COL} string"


def parse_jsonl_lines(lines: DataFrame, schema_ddl: str,
                      line_col: str = "line") -> DataFrame:
    """Parse JSON lines already in a DataFrame: returns the schema's
    columns plus CORRUPT_COL (null for clean rows, the raw line for
    malformed ones).  Pass-through columns other than line_col are
    preserved (e.g. a shard id)."""
    other = [c for c in lines.columns if c != line_col]
    parsed = lines.select(
        *other,
        F.from_json(F.col(line_col), _schema_with_corrupt(schema_ddl),
                    {"columnNameOfCorruptRecord": CORRUPT_COL})
        .alias("_p"))
    return parsed.select(*other, "_p.*")


def write_jsonl(df: DataFrame, path: str, cols: list[str],
                n_files: int = 8) -> None:
    """Write df as n_files JSONL shards (text files, one object per
    line)."""
    jsonl_lines(df, cols).repartition(n_files).write.mode(
        "overwrite").text(path)


def read_jsonl_ledger(spark: SparkSession, path: str,
                      schema_ddl: str) -> tuple[DataFrame, DataFrame]:
    """Read JSONL shards with an account-for-every-line ledger.

    Returns (good, ledger): good = rows that parsed clean, ledger =
    one row per shard file (file, n_good, n_corrupt).  Corrupt lines
    are counted, never silently dropped — the WARC-ledger rule.  The
    raw read keeps the corrupt column so a resync/repair pass can
    retrieve the damaged bytes."""
    # read as TEXT and parse with the expression-level from_json:
    # same JVM Jackson parser as the json datasource, but immune to
    # UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN (the json
    # reader forbids a scan pruned to only the corrupt column; the
    # documented cache workaround would materialize the whole corpus
    # — wrong at scale, a text scan + projection is one clean pass)
    raw = (spark.read.text(path)
           .select(F.input_file_name().alias("_file"),
                   F.col("value").alias("line")))
    parsed = parse_jsonl_lines(raw, schema_ddl)
    good = parsed.where(F.col(CORRUPT_COL).isNull()).drop(
        CORRUPT_COL, "_file")
    ledger = (parsed.groupBy(F.col("_file").alias("file"))
              .agg(F.sum(F.when(F.col(CORRUPT_COL).isNull(), 1)
                         .otherwise(0)).alias("n_good"),
                   F.sum(F.when(F.col(CORRUPT_COL).isNotNull(), 1)
                         .otherwise(0)).alias("n_corrupt")))
    return good, ledger
