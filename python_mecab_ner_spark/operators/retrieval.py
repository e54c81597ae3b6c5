"""Lexical retrieval scoring: integer fixed-point BM25.

The retrieval side of a data engine (find the documents most relevant
to a query; rank eval-set neighbors; build hard negatives for
embedding training) is BM25 long before it is ANN.  Classic BM25 is
float-valued; this formulation clears all fractions to 64-bit integer
arithmetic so ranking is bit-identical across engines and the oracle
hash-matches:

    idf(t)   = bit_length(N div df_t)          (the q38 integer-idf family)
    k1 = 6/5, b = 3/4 (the standard 1.2 / 0.75), avgdl = floor mean
    tf-part  = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
             = tf*44*avgdl / (20*avgdl*tf + 6*avgdl + 18*dl)   [cleared]
    score_milli(d) = sum_t floor(idf * tf * 44000 * avgdl
                                 / (20*avgdl*tf + 6*avgdl + 18*dl))

Monotone in the float score for fixed (dl, avgdl); the milli scale
keeps the floor from collapsing ranks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(ctx: DataFrame, query_terms: Sequence[str], k: int = 20,
              id_col: str = "url", word_col: str = "word") -> DataFrame:
    """Top-k documents by integer-milli BM25 for a bag of query terms,
    over a (doc, word) token stream like _doc_context / g["context"].

    Columns: (doc_id, n_terms, bm25_milli) ordered score desc, id asc.

    Scale shape: the query-term filter prunes the token stream BEFORE
    any shuffle (predicate on a literal IN-list, pushed to the scan
    when ctx is a direct read); tf and df are map-side-combinable
    aggregates over the pruned stream; document length is one
    aggregate over the full stream (shared with every other stats
    consumer when ctx is the persisted context table); corpus totals
    and the per-term idf dimension are broadcast.  Final top-k is
    TakeOrderedAndProject — no global sort materializes."""
    terms = [t for t in query_terms]
    doc = F.col(id_col)
    dl = ctx.groupBy(doc.alias("doc_id")).agg(
        F.count("*").cast("bigint").alias("dl"))
    totals = F.broadcast(dl.agg(
        F.sum("dl").cast("bigint").alias("tot"),
        F.count("*").cast("bigint").alias("n_docs")))
    qt = ctx.where(F.col(word_col).isin(terms)).select(
        doc.alias("doc_id"), F.col(word_col).alias("word"))
    tf = qt.groupBy("doc_id", "word").agg(
        F.count("*").cast("bigint").alias("tf"))
    dfq = (qt.distinct().groupBy("word")
           .agg(F.count("*").cast("bigint").alias("df")))
    avgdl = F.expr("tot div n_docs")
    idf = F.length(F.bin(F.expr("n_docs div df"))).cast("bigint")
    scored = (tf.join(F.broadcast(dfq), "word")
              .join(dl, "doc_id")
              .crossJoin(totals)
              .withColumn("avgdl", avgdl)
              .withColumn("idf", idf)
              .withColumn(
                  "contrib",
                  F.expr("(idf * tf * 44000 * avgdl) div "
                         "(20 * avgdl * tf + 6 * avgdl + 18 * dl)")))
    return (scored.groupBy("doc_id")
            .agg(F.count("*").cast("int").alias("n_terms"),
                 F.sum("contrib").cast("bigint").alias("bm25_milli"))
            .orderBy(F.col("bm25_milli").desc(), F.col("doc_id").asc())
            .limit(k))
