"""Batched BPE training at real-vocab depth (the round-3 verdict's
one weak scale shape): >=64 merges must agree bit-exactly with the
pure-python twin (kernel/bpe_ref.py), and lineage must stay bounded
via localCheckpoint — a 32k-merge vocab cannot carry 96k nested
replace expressions through the analyzer."""

import random

import pytest
from pyspark.sql import functions as F

from python_mecab_ner_spark.kernel.bpe_ref import (
    bpe_merge_table_ref, bpe_segment_ref)
from python_mecab_ner_spark.operators import bpe as bpe_mod
from python_mecab_ner_spark.operators.bpe import (
    apply_merges, bpe_merge_table, select_batch)


def _corpus(n_docs=120, seed=7):
    rng = random.Random(seed)
    words = ["alpha", "alphabet", "better", "bettering", "gamma",
             "gamble", "delta", "dealt", "epsilon", "silo", "zetazeta",
             "theta", "thetan", "iota", "kappa", "kappas", "lambda",
             "lambent", "stream", "streaming", "streamer", "token",
             "tokens", "tokenizer", "merge", "merges", "merged"]
    return [" ".join(rng.choices(words, k=rng.randint(5, 18)))
            for _ in range(n_docs)]


@pytest.mark.parametrize("batch,ckpt", [(1, 8), (8, 3)])
def test_engine_agrees_with_python_twin_64_merges(spark, batch, ckpt):
    texts = _corpus()
    d = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [(r.rank, r.pair, r.cnt) for r in
           bpe_merge_table(spark, d, "text", iters=64, batch=batch,
                           checkpoint_every=ckpt)
           .orderBy("rank").collect()]
    want = bpe_merge_table_ref(texts, iters=64, batch=batch)
    assert len(got) == 64
    assert got == want


def test_plan_depth_is_bounded_by_checkpointing(spark):
    texts = _corpus()
    d = spark.createDataFrame([(t,) for t in texts], "text string")
    bpe_merge_table(spark, d, "text", iters=64, batch=8,
                    checkpoint_every=3)
    info = bpe_mod.LAST_TRAIN_INFO
    # a round may accept < batch pairs (interaction rejections), so
    # derive expectations from the observed round count
    assert 8 <= info["rounds"] <= 12
    assert info["checkpoints"] == info["rounds"] // 3
    # at most (rounds since last checkpoint) x batch 8 x 3 passes
    assert info["plan_replaces"] <= (info["rounds"] % 3) * 8 * 3


def test_batch1_is_strict_greedy_prefix_semantics(spark):
    # batch=1 must reproduce the q73-oracled strict-greedy sequence
    texts = _corpus(n_docs=40, seed=3)
    d = spark.createDataFrame([(t,) for t in texts], "text string")
    a = [(r.rank, r.pair, r.cnt) for r in
         bpe_merge_table(spark, d, "text", iters=6)
         .orderBy("rank").collect()]
    b = bpe_merge_table_ref(texts, iters=6, batch=1)
    assert a == b


def test_select_batch_rejects_interacting_pairs():
    cands = [("a b", 10), ("b c", 9), ("c d", 8), ("ab x", 7),
             ("e f", 6)]
    # 'b c' shares b with 'a b'; 'ab x' left symbol equals the output
    # of the accepted 'a b' merge; both must be skipped this round
    assert select_batch(cands, 3) == [("a b", 10), ("c d", 8),
                                      ("e f", 6)]


def test_apply_merges_chunked_matches_single_word_twin(spark):
    texts = _corpus()
    merges = [p for _, p, _ in bpe_merge_table_ref(texts, 64, batch=8)]
    words = sorted({w for t in texts for w in t.split()})
    vocab = spark.createDataFrame(
        [(" " + " ".join(w) + " ", w) for w in words], "sym string,"
        " word string")
    out = apply_merges(vocab, merges, chunk=10)
    got = {r.word: r.sym.strip().split(" ") for r in out.collect()}
    for w in words:
        assert got[w] == bpe_segment_ref(w, merges), w
