"""Training-sequence packing: the concat-and-chunk assembly step.

LLM pretraining consumes fixed-length token sequences, not documents;
the assembly step concatenates documents and cuts at the sequence
budget (GPT-style packing).  At 100 TB a single global concatenation
order is a serial bottleneck, so the distributed form packs WITHIN
deterministic hash buckets: every bucket is an independent stream,
packed in parallel, and the (bucket, bin) pair is the training
sequence id.  Determinism comes from the content-hash bucket + the
total id order inside it — a re-run, a backfill, or a different
cluster size produces byte-identical packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import bucket as hash_bucket


def pack_sequences(df: DataFrame, id_col: str, n_tokens_col: str,
                   budget: int, n_buckets: int = 16,
                   salt: str = "pack:") -> DataFrame:
    """Assign every document a (bucket, bin_id, start_off) packing slot:
    bucket = pmod(md5(salt || id), n_buckets); within a bucket,
    documents are concatenated in id order and bin_id/start_off are the
    sequence index and in-sequence position where the document starts
    (start_off is in tokens; a document may spill into the next bin —
    spill_bins counts the extra boundaries it crosses, 0 for most).

    Scale shape: one hash shuffle into buckets + a per-bucket running
    sum (window, ROWS frame — streaming-friendly, no second sort
    since rows arrive sorted once per bucket).  Buckets bound the
    window's partition size: n_buckets scales with the corpus so each
    bucket fits an executor's sort spill budget.  All arithmetic is
    integer, so the layout is engine-exact."""
    w = (Window.partitionBy("bucket").orderBy(F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    nt = F.col(n_tokens_col).cast("bigint")
    return (df.withColumn("bucket",
                          hash_bucket(F.col(id_col).cast("string"),
                                      n_buckets, salt=salt))
            .withColumn("prev", F.coalesce(F.sum(nt).over(w), F.lit(0))
                        .cast("bigint"))
            .withColumn("bin_id", F.expr(f"prev div {budget}")
                        .cast("bigint"))
            .withColumn("start_off", F.expr(f"prev % {budget}")
                        .cast("bigint"))
            .withColumn(
                "spill_bins",
                F.expr(f"(CASE WHEN {n_tokens_col} > 0 THEN "
                       f"(prev + {n_tokens_col} - 1) div {budget} "
                       f"ELSE prev div {budget} END) - (prev div {budget})")
                .cast("bigint"))
            .drop("prev"))
