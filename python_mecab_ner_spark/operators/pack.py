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
from ..functions.hashing import md5_int


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


def chunk_documents(df: DataFrame, text_col: str, id_col: str,
                    size: int = 32, stride: int = 24) -> DataFrame:
    """Overlapping fixed-size token chunking (the RAG / long-context
    preprocessing unit: windows of `size` tokens starting every
    `stride`, overlap = size - stride carried across boundaries).

    Returns (doc_id, chunk_idx, chunk_toks, chunk_fp) — the
    fingerprint stands in for the chunk payload so the operator's
    output is integer-exact cross-engine; downstream embedders read
    the text via the same slice.

    Scale shape: per-row array code only (split -> filtered start
    sequence -> posexplode -> slice/join) — zero shuffle, zero Python;
    chunk fan-out is ~n_toks/stride per document, the same
    row-multiplier class as the shingle explode."""
    assert stride >= 1 and size >= 1, "size/stride must be positive"
    toks = F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))),
                                    r"\s+", " "), " ")
    n = F.size(toks)
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
        lambda s: s < n)
    return (df.select(F.col(id_col).alias("doc_id"),
                      toks.alias("_w"),
                      F.posexplode(starts).alias("chunk_idx", "_s"))
            .select("doc_id",
                    F.col("chunk_idx").cast("int").alias("chunk_idx"),
                    F.array_join(F.slice("_w", F.col("_s") + 1, size), " ")
                    .alias("_ct"))
            .where(F.col("_ct") != "")
            .select("doc_id", "chunk_idx",
                    (F.size(F.split(F.col("_ct"), " "))).cast("int")
                    .alias("chunk_toks"),
                    md5_int(F.col("_ct")).alias("chunk_fp")))


def contrastive_pairs(df: DataFrame, text_col: str, id_col: str,
                      size: int = 32, stride: int = 24,
                      n_buckets: int = 64,
                      salt: str = "ctr:") -> DataFrame:
    """Contrastive training-pair generation for retrieval/embedding
    encoders (the SimCSE / DPR in-document positive recipe): every
    chunk with a successor becomes an anchor, its positive is the
    NEXT overlapping chunk of the same document, and its negative is
    a deterministic corpus sample — the representative (min
    fingerprint) chunk of a content-hash bucket probed by the
    anchor's own hash.

    The negative is the house content-hash discipline, not an RNG:
    the same (anchor, negative) pairing at any cluster size, on
    re-runs, and in the DuckDB twin.  Anchors whose probed bucket
    representative comes from the SAME document are dropped (a
    false-negative would otherwise poison the loss; the drop is
    deterministic and ~1/n_docs rare).

    Returns (doc_id, chunk_idx, anchor_fp, pos_fp, neg_fp) — chunk
    fingerprints, not text (integer-exact cross-engine; downstream
    trainers re-slice the text exactly as chunk_documents does).

    Scale shape: chunking is per-row array code (zero shuffle); the
    positive join is co-keyed on (doc_id, chunk_idx); the negative
    dimension is TWO bounded aggregates over n_buckets keys plus one
    broadcast probe join — no corpus-sized shuffle beyond the
    positive self-join.  The chunk table is persisted: four consumers
    (bucketing, the negative-dim join-back, both sides of the
    positive join) would otherwise each replay the NARROW
    split/explode/md5 pipeline — no exchange to reuse, so this is
    the persist-pays case (measured 20.8 -> 4.3 s at sf0.1), the
    opposite call from the wedge-join dead end.  Release via
    .unpersist_input."""
    ch = chunk_documents(df, text_col, id_col, size=size,
                         stride=stride).persist()
    key = F.concat_ws(":", F.col("doc_id").cast("string"),
                      F.col("chunk_idx").cast("string"))
    chb = ch.withColumn(
        "_nb", F.pmod(md5_int(key, salt=salt), F.lit(n_buckets)))
    negf = chb.groupBy("_nb").agg(F.min("chunk_fp").alias("neg_fp"))
    negd = (negf.join(chb.select("_nb",
                                 F.col("chunk_fp").alias("neg_fp"),
                                 F.col("doc_id").alias("neg_doc")),
                      ["_nb", "neg_fp"])
            .groupBy("_nb", "neg_fp")
            .agg(F.min("neg_doc").alias("neg_doc")))
    nxt = ch.select("doc_id",
                    (F.col("chunk_idx") - 1).alias("chunk_idx"),
                    F.col("chunk_fp").alias("pos_fp"))
    anchors = (ch.join(nxt, ["doc_id", "chunk_idx"])
               .withColumn("_qb",
                           F.pmod(md5_int(key, salt=salt + "q"),
                                  F.lit(n_buckets))))
    out = (anchors.join(F.broadcast(negd),
                        anchors["_qb"] == negd["_nb"])
           .where(F.col("neg_doc") != F.col("doc_id"))
           .select("doc_id",
                   F.col("chunk_idx").cast("int").alias("chunk_idx"),
                   F.col("chunk_fp").alias("anchor_fp"),
                   "pos_fp", "neg_fp"))
    out.unpersist_input = ch.unpersist
    return out
