"""Collocation statistics over token-context tables: integer-exact
PMI scoring of adjacent word pairs.

The KG vocabulary-mining primitive (which surface bigrams behave like
single lexical units — candidate gazetteer entries / new-entity
discovery) and the classic corpus-stats counterpart of the linking
module's neighbor evidence.  Everything is 64-bit integer arithmetic
(`div` = floor division) so the DuckDB oracle hash-matches exactly;
float log-PMI could never cross the engine boundary bit-stably, and
the integer ratio preserves the PMI ORDER (log is monotone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PMI_SCALE = 1_000_000


def bigram_pmi(ctx: DataFrame, min_count: int = 2,
               id_col: str = "url", idx_col: str = "idx",
               word_col: str = "word") -> DataFrame:
    """Adjacent-pair PMI over a (doc, idx, word) context table:

        score = (c_xy * n_tok * PMI_SCALE) div (c_x * c_y)

    i.e. the pointwise-mutual-information ratio p(x,y)/(p(x)p(y)) in
    fixed-point parts-per-million; > PMI_SCALE means the pair
    co-occurs more than independence predicts.  Returns
    (w1, w2, c_xy, score) for pairs with c_xy >= min_count.

    Scale shape: the bigram build is ONE window pass per doc
    partition (lead), both count aggregates are map-side combinable,
    and the unigram table (vocabulary-sized, heavy-tailed small) is
    BROADCAST twice — no corpus-scale shuffle beyond the two
    aggregates.  Overflow bound: c_xy * n_tok * PMI_SCALE must stay
    under 2^63 — at corpora beyond ~3e6 tokens drop PMI_SCALE or
    pre-divide n_tok (ordering is preserved under any common scale).
    """
    w = Window.partitionBy(id_col).orderBy(idx_col)
    pairs = (ctx.select(F.col(word_col).alias("w1"),
                        F.lead(word_col).over(w).alias("w2"))
             .where(F.col("w2").isNotNull()))
    big = (pairs.groupBy("w1", "w2")
           .agg(F.count("*").alias("c_xy"))
           .where(F.col("c_xy") >= min_count))
    uni = ctx.groupBy(word_col).agg(F.count("*").alias("c"))
    n_tok = ctx.select(F.count("*").alias("n_tok"))
    return (big
            .join(F.broadcast(uni.select(F.col(word_col).alias("w1"),
                                         F.col("c").alias("c_x"))), "w1")
            .join(F.broadcast(uni.select(F.col(word_col).alias("w2"),
                                         F.col("c").alias("c_y"))), "w2")
            .crossJoin(F.broadcast(n_tok))
            .select("w1", "w2", F.col("c_xy").cast("bigint").alias("c_xy"),
                    F.expr(f"(c_xy * n_tok * {PMI_SCALE}) div (c_x * c_y)")
                    .cast("bigint").alias("pmi_ppm")))


def kn_continuation_counts(ctx: DataFrame, min_unigram: int = 1,
                           id_col: str = "url", idx_col: str = "idx",
                           word_col: str = "word") -> DataFrame:
    """Kneser-Ney continuation counts over a (doc, idx, word) context
    table — the numerators/denominators of the KN lower-order
    distribution that n-gram LM training needs from a corpus pass:

        cont_left(w)  = |{v : c(v, w) > 0}|  (distinct predecessors;
                        KN's N1+(. w), the lower-order numerator)
        cont_right(w) = |{v : c(w, v) > 0}|  (distinct successors;
                        the normalizer of the discounted mass)

    Returns (word, n_uni, cont_left, cont_right), all BIGINT — pure
    counting, so the oracle hash-matches trivially, and the "Francisco
    problem" is visible in the output: a word frequent only after one
    predecessor has high n_uni but cont_left = 1.

    Scale shape: one lead-window pass per doc partition builds the
    bigram stream, ONE distinct over bigram TYPES (vocabulary^2-
    bounded, far below the token stream), then two combinable
    aggregates over that type table; the three per-word tables join
    on the vocabulary key.  No corpus-scale shuffle beyond the
    distinct."""
    w = Window.partitionBy(id_col).orderBy(idx_col)
    pairs = (ctx.select(F.col(word_col).alias("w1"),
                        F.lead(word_col).over(w).alias("w2"))
             .where(F.col("w2").isNotNull()))
    types = pairs.distinct()
    left = (types.groupBy(F.col("w2").alias("word"))
            .agg(F.count("*").alias("cont_left")))
    right = (types.groupBy(F.col("w1").alias("word"))
             .agg(F.count("*").alias("cont_right")))
    uni = (ctx.groupBy(word_col).agg(F.count("*").alias("n_uni"))
           .where(F.col("n_uni") >= min_unigram)
           .select(F.col(word_col).alias("word"), "n_uni"))
    return (uni.join(left, "word", "left").join(right, "word", "left")
            .select("word", F.col("n_uni").cast("bigint").alias("n_uni"),
                    F.coalesce("cont_left", F.lit(0))
                    .cast("bigint").alias("cont_left"),
                    F.coalesce("cont_right", F.lit(0))
                    .cast("bigint").alias("cont_right")))


def doc_surprisal(ctx: DataFrame, id_col: str = "url",
                  word_col: str = "word") -> DataFrame:
    """Unigram-LM rarity score per document — the integer-exact stand-in
    for a perplexity quality filter (boilerplate/common-word soup
    scores low, rare-vocabulary docs score high):

        idf(w)        = bitlength(n_tok div c_w)   (~ floor(log2 1/p))
        rarity_milli  = (sum_w idf(w)) * 1000 div n_doc_toks

    Returns (id, n_toks, sum_idf, rarity_milli), all BIGINT: the same
    bit-length log2 trick as the q38 TF-IDF keeps every step in 64-bit
    integers, so the oracle hash-matches and the ORDERING equals the
    float formulation's.

    Scale shape: one unigram aggregate (map-side combinable), the
    vocabulary broadcast back, one per-doc aggregate — no join on the
    corpus-scale token stream beyond the broadcast lookup."""
    uni = ctx.groupBy(word_col).agg(F.count("*").alias("c"))
    n_tok = ctx.select(F.count("*").alias("n_tok"))
    scored = (ctx.join(F.broadcast(uni), word_col)
              .crossJoin(F.broadcast(n_tok))
              .select(F.col(id_col),
                      F.length(F.bin(F.expr("n_tok div c")))
                      .cast("bigint").alias("idf")))
    return (scored.groupBy(id_col)
            .agg(F.count("*").cast("bigint").alias("n_toks"),
                 F.sum("idf").cast("bigint").alias("sum_idf"))
            .select(id_col,
                    "n_toks", "sum_idf",
                    F.expr("sum_idf * 1000 div n_toks")
                    .cast("bigint").alias("rarity_milli")))


def cooccurrence_counts(ctx: DataFrame, window: int = 5,
                        min_pairs: int = 2, scale: int = 60,
                        id_col: str = "url", idx_col: str = "idx",
                        word_col: str = "word") -> DataFrame:
    """Distance-weighted co-occurrence matrix build — the GloVe /
    SVD-embedding input statistic (Pennington et al. 2014 weight each
    pair 1/d): X[w1, w2] accumulates scale div d for every unordered
    pair at token distance d <= window.

    scale = 60 makes every 1/d weight for d <= 5 an EXACT integer
    (60, 30, 20, 15, 12) — the lcm trick that keeps the whole matrix
    build in 64-bit integers and lets the DuckDB oracle hash-match
    (GloVe's float 1/d sums would drift cross-engine).

    Scale shape: the window join is an EQUI-join, not a range join —
    each left token explodes its window offsets (1..window) and
    pre-adds them into the join key, so the pair stream comes out of
    one shuffle keyed by (doc, position) with per-row fan-out exactly
    `window`; the matrix is ONE combinable aggregate on the unordered
    word pair.  min_pairs prunes the hapax tail (the matrix is
    vocab^2-sparse; GloVe trains on exactly this thresholded form).

    Returns (w1, w2, n_pairs, w_sum) with w1 <= w2."""
    right = ctx.select(F.col(id_col).alias("_id"),
                       F.col(idx_col).alias("_pos"),
                       F.col(word_col).alias("_wb"))
    left = (ctx.select(F.col(id_col).alias("_id"),
                       F.col(idx_col).alias("_i"),
                       F.col(word_col).alias("_wa"))
            .withColumn("_d", F.explode(F.array(
                *[F.lit(d) for d in range(1, window + 1)])))
            .withColumn("_pos", F.col("_i") + F.col("_d")))
    j = left.join(right, ["_id", "_pos"])
    return (j.groupBy(F.least("_wa", "_wb").alias("w1"),
                      F.greatest("_wa", "_wb").alias("w2"))
            .agg(F.count("*").cast("bigint").alias("n_pairs"),
                 F.sum(F.floor(F.lit(scale) / F.col("_d")))
                 .cast("bigint").alias("w_sum"))
            .where(F.col("n_pairs") >= min_pairs))


def frequent_itemsets3(baskets: DataFrame, basket_col: str = "basket",
                       item_col: str = "item",
                       min_support: int = 2) -> DataFrame:
    """A-priori frequent 3-itemsets over (basket, item) rows — the
    market-basket pattern miner, here for co-mention sets ("entities
    that appear TOGETHER across many pages"), co-purchase motifs, and
    gazetteer-expansion candidates beyond pairwise PMI.

    Classic level-wise pruning, all exact:
      L1 = items with support >= min_support
      L2 = within-basket pairs (a < b), both L1, support >= min_support
      C3 = L2 pairs sharing their first item, (a,b)+(a,c), b < c,
           kept only if (b,c) is ALSO in L2 (the a-priori closure)
      L3 = C3 with counted support >= min_support
    Support = number of DISTINCT baskets containing the whole set.

    Scale shape: baskets dedup to distinct (basket, item); the pair
    step is a within-basket self-join (fan-out C(basket_size, 2) —
    cap basket sizes upstream if a pathological basket bites); L2 is
    support-pruned BEFORE the candidate join, and candidates verify
    against broadcast L2 (frequent-pair dimensions are small by
    construction — that is the a-priori insight).  Support is counted
    by WITHIN-BASKET enumeration gated by the broadcast L2/C3 sets
    (the AprioriTID flavor): pairs per basket semi-join L2, extend by
    one item, semi-join C3, one combinable count.  The alternative —
    joining candidates to the corpus on the ITEM key — fans out
    |C3|/|items| copies of every item row and was measured 10x
    slower on a small item universe (24 s vs 2.5 s at sf0.1).
    Returns (item_a, item_b, item_c, support),
    item_a < item_b < item_c."""
    bi = (baskets.select(F.col(basket_col).alias("b"),
                         F.col(item_col).alias("i"))
          .distinct().persist())
    l1 = (bi.groupBy("i").agg(F.count("*").alias("s"))
          .where(F.col("s") >= min_support).select("i"))
    bi1 = bi.join(F.broadcast(l1), "i").select("b", "i")
    x, y = bi1.alias("x"), bi1.alias("y")
    # the within-basket pair table feeds BOTH the L2 aggregation and
    # the gated triple extension — persist it once instead of running
    # the self-join twice; L2/C3 are tiny frequent-set DIMENSIONS
    # with multiple consumers, persisted for the same reason (the
    # domain_range lesson; q163 measured 24 s candidate-join shape ->
    # 15.2 s enumeration -> 8.5 s with these persists at sf0.1)
    pairs = (x.join(y, (F.col("x.b") == F.col("y.b"))
                    & (F.col("x.i") < F.col("y.i")))
             .select(F.col("x.b").alias("b"), F.col("x.i").alias("ia"),
                     F.col("y.i").alias("ib"))
             .persist())
    l2 = (pairs.groupBy(F.col("ia").alias("a"),
                        F.col("ib").alias("c"))
          .agg(F.count("*").alias("s"))
          .where(F.col("s") >= min_support)
          .select("a", "c").persist())
    p, q = l2.alias("p"), l2.alias("q")
    c3 = (p.join(q, (F.col("p.a") == F.col("q.a"))
                 & (F.col("p.c") < F.col("q.c")))
          .select(F.col("p.a").alias("ia"), F.col("p.c").alias("ib"),
                  F.col("q.c").alias("ic")))
    closure = l2.select(F.col("a").alias("ib"),
                        F.col("c").alias("ic"))
    c3 = (c3.join(F.broadcast(closure), ["ib", "ic"], "left_semi")
          .persist())
    # within-basket enumeration: bi1 rows are distinct per
    # (basket, item), so each basket contributes each triple at most
    # once and a plain count IS the distinct-basket support
    pr = pairs.join(F.broadcast(l2.select(F.col("a").alias("ia"),
                                          F.col("c").alias("ib"))),
                    ["ia", "ib"], "left_semi")
    ext = (pr.join(bi1.select(F.col("b"), F.col("i").alias("ic")), "b")
           .where(F.col("ic") > F.col("ib"))
           .join(F.broadcast(c3), ["ia", "ib", "ic"], "left_semi"))
    sup = (ext.groupBy("ia", "ib", "ic")
           .agg(F.count("*").cast("bigint").alias("support"))
           .where(F.col("support") >= min_support))
    out = sup.select(F.col("ia").alias("item_a"),
                     F.col("ib").alias("item_b"),
                     F.col("ic").alias("item_c"), "support")

    def _release():
        bi.unpersist()
        pairs.unpersist()
        l2.unpersist()
        c3.unpersist()
    out.unpersist_input = _release
    return out


def good_turing(counts: DataFrame, count_col: str = "n") -> DataFrame:
    """Good-Turing count-of-counts sheet: for every observed raw
    frequency r, the number of types N_r seen exactly r times and
    the adjusted (Turing) count r* = (r+1) * N_{r+1} / N_r as an
    integer-ppm ratio — the classical frequency re-estimator behind
    Katz backoff, and the companion of q80's Kneser-Ney continuation
    counts (KN smooths by CONTEXT diversity; GT by the
    count-of-count curve itself).  The r=0 convention: total unseen
    probability mass is N_1 / total tokens, which the caller reads
    off the r=1 row.

    Two combinable aggregations (type counts, then count-of-counts)
    plus a self-join of the TINY N_r table on r+1 — no windows, no
    sort; the N_r table is bounded by the max frequency, not the
    vocabulary.  gt_ppm is 0 (sentinel) where N_{r+1} is empty —
    the standard estimator is undefined there (smoothed variants
    regress the curve; out of scope).

    Input: one row per type with its raw count.  Returns
    (r, n_types, gt_ppm) sorted by the caller."""
    nr = (counts.groupBy(F.col(count_col).alias("r"))
          .agg(F.count("*").alias("n_types")))
    nxt = nr.select((F.col("r") - 1).alias("r"),
                    F.col("n_types").alias("n_next"))
    return (nr.join(nxt, "r", "left")
            .select("r", "n_types",
                    F.coalesce(
                        F.expr("((r + 1) * n_next * 1000000) "
                               "div n_types"),
                        F.lit(0)).cast("bigint").alias("gt_ppm")))
