"""Distributed BPE vocabulary induction (the tokenizer-training half
of a pretraining pipeline).

The standard scale decomposition: the corpus is reduced ONCE to the
weighted word-frequency table (one combinable aggregate — the only
corpus-sized pass), and the merge loop then runs on that vocab-sized
table, exactly like production BPE trainers (SentencePiece/HF count
words first, train on the counts).  Each merge round is:

    adjacent symbol pairs (per-row array code + explode)
    -> pair-weight sum (combinable aggregate on the pair key)
    -> argmax pair (tiny: ORDER BY cnt DESC, pair LIMIT 1 — the
       1-row collect per round is the trainer's synchronization
       point, standard and unavoidable)
    -> apply the merge (literal space-sentinel replace, 3 passes)

Merge application detail: symbols are space-joined with space
sentinels, and the merge replaces ' a b ' -> ' ab ' LITERALLY (no
regex — symbols may contain regex metacharacters).  A literal
left-to-right replace consumes the shared boundary space between two
adjacent occurrences (' x a b a b x ' merges only the first), so the
replace runs 3 times per round — handling runs of up to 7 consecutive
occurrences, beyond any real word length here.  Documented divergence
from exact greedy BPE: longer same-pair runs would need more passes.

Integer counts + bytewise string tie-break keep every round
bit-exact cross-engine (the q73 oracle unrolls the same rounds in
SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _sym0(word):
    """word -> ' c h a r s ' (space-joined chars, space sentinels)."""
    return F.concat(F.lit(" "),
                    F.trim(F.regexp_replace(word, "(.)", "$1 ")),
                    F.lit(" "))


def _adjacent_pairs(sym):
    """array of 'a b' strings for adjacent symbol pairs.  The symbol
    array is _let-bound: HOF lambdas re-evaluate captured outer
    expressions per element (the winnowing lesson, dedup.py)."""
    from ..functions.text import _let

    def body(arr):
        n = F.size(arr)
        idx = F.filter(F.sequence(F.lit(0), F.greatest(n - 2, F.lit(0))),
                       lambda i: i < n - 1)
        return F.transform(
            idx, lambda i: F.concat(F.element_at(arr, i + 1), F.lit(" "),
                                    F.element_at(arr, i + 2)))

    return _let(F.split(F.trim(sym), " "), body)


def _apply_merge(sym, pair: str):
    tgt = F.lit(" " + pair + " ")
    rep = F.lit(" " + pair.replace(" ", "") + " ")
    out = sym
    for _ in range(3):
        out = F.replace(out, tgt, rep)
    return out


def bpe_merge_table(spark: SparkSession, df: DataFrame, text_col: str,
                    iters: int = 3) -> DataFrame:
    """Train `iters` BPE merges; returns (rank, pair, cnt) — the merge
    table that IS the tokenizer artifact.  One corpus pass (word
    frequency), then vocab-sized rounds."""
    wf = (df.select(F.explode(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word"))
        .where("word <> ''")
        .groupBy("word").agg(F.count("*").cast("bigint").alias("n"))
        .select(_sym0(F.col("word")).alias("sym"), "n")
        .persist())
    wf.count()  # materialize once; rounds re-derive from this table
    sym = wf
    merges = []
    for rank in range(iters):
        pairs = (sym.select(F.explode(
            _adjacent_pairs(F.col("sym"))).alias("pair"), "n")
            .groupBy("pair").agg(F.sum("n").alias("cnt")))
        best = pairs.orderBy(F.col("cnt").desc(),
                             F.col("pair").asc()).limit(1).collect()
        if not best:
            break
        merges.append((rank, best[0].pair, int(best[0].cnt)))
        sym = sym.select(_apply_merge(F.col("sym"),
                                      best[0].pair).alias("sym"), "n")
    out = spark.createDataFrame(merges, "rank int, pair string, cnt long")
    wf.unpersist()
    return out


def bpe_token_counts(spark: SparkSession, df: DataFrame, text_col: str,
                     id_col: str, iters: int = 3) -> DataFrame:
    """Corpus token counts under the learned BPE — 'how many tokens is
    my dataset', the first question every pretraining budget asks.

    Scale decomposition mirrors training: segmentation happens per
    DISTINCT word (vocab-sized — each word is segmented once, not once
    per occurrence), the per-word token count is broadcast back, and
    the per-doc count is one combinable sum.  Returns
    (doc_id, n_bpe_tokens)."""
    merges = [r.pair for r in
              bpe_merge_table(spark, df, text_col, iters=iters)
              .orderBy("rank").collect()]
    words = (df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                          r"\s+")).alias("word"))
        .where("word <> ''"))
    sym = _sym0(F.col("word"))
    for pair in merges:
        sym = _apply_merge(sym, pair)
    vocab = (words.select("word").distinct()
             .select("word",
                     F.size(F.split(F.trim(sym), " "))
                     .cast("bigint").alias("n_tok")))
    return (words.join(F.broadcast(vocab), "word")
            .groupBy("doc_id")
            .agg(F.sum("n_tok").cast("bigint").alias("n_bpe_tokens")))
