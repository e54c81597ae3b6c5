"""Hashed linear text classification (fastText-style inference) at
corpus scale.

Model-based quality filtering is the step between heuristic gates
(functions.text.quality_score) and LLM-judge labels in every modern
training-data pipeline (CCNet's fastText LM filter, FineWeb-Edu's
classifier gate): a linear model over hashed word/bigram features is
cheap enough to score 100 TB and strong enough to rank sources.  This
module implements the INFERENCE side Spark-first: feature hashing and
the weighted sum are pure per-row JVM expressions (zero shuffle, zero
UDF); trained weights arrive as a broadcast (bucket -> weight) table.

Without a weights table the operator derives a deterministic md5
stand-in weight per bucket — an honest placeholder with the exact
same plan shape and an exact DuckDB oracle (q112), so the plumbing a
real model drops into is fully tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int

FEAT_SALT = "feat:"
WT_SALT = "wt:"


def _feature_array(text_col, n_buckets: int):
    """Per-row array of hashed feature bucket ids: word unigrams +
    word bigrams (joined with '_'), each pmod'd into n_buckets.
    Everything stays inside one projection — codegen, no explode yet."""
    toks = F.split(F.regexp_replace(F.lower(F.trim(text_col)),
                                    r"\s+", " "), " ")
    n = F.size(toks)
    lead = F.greatest(n - 1, F.lit(1))
    # zip_with pads the shorter slice with NULL; concat(null) -> NULL
    # drops the trailing partial bigram in the filter below
    bigrams = F.filter(
        F.zip_with(F.slice(toks, 1, lead), F.slice(toks, 2, lead),
                   lambda a, b: F.concat(a, F.lit("_"), b)),
        lambda x: x.isNotNull())
    feats = F.filter(F.concat(toks, bigrams), lambda x: x != "")
    return F.transform(
        feats,
        lambda s: F.pmod(
            F.conv(F.substring(F.md5(F.concat(F.lit(FEAT_SALT), s)),
                               1, 15), 16, 10).cast("bigint"),
            F.lit(n_buckets)).cast("bigint"))


def stand_in_weights(bucket_col):
    """Deterministic integer weight in [-8, 8] per bucket id — the
    md5 stand-in used when no trained weight table is supplied."""
    return (F.pmod(md5_int(bucket_col.cast("string"), salt=WT_SALT),
                   F.lit(17)) - F.lit(8)).cast("bigint")


def hashed_linear_score(df: DataFrame, text_col: str, id_col: str,
                        n_buckets: int = 4096,
                        weights: DataFrame | None = None) -> DataFrame:
    """Score every document with a hashed linear classifier:
    score(d) = sum over unigram+bigram features of weight[bucket(f)],
    label = 'keep' if score > 0 else 'drop'.

    Scale shape: feature hashing is a per-row array projection; the
    exploded feature stream joins the weight side ONLY via broadcast
    (the weight table is model-sized: n_buckets rows, KBs); the sole
    corpus-scale exchange is the per-doc sum (map-side combinable).
    With weights=None the weight is computed inline from the bucket id
    (zero joins) — identical plan shape minus the broadcast.

    Returns (doc_id, n_feats, score, label) — all integers/strings,
    exact DuckDB twin (q112)."""
    feats = (df.select(F.col(id_col).alias("doc_id"),
                       F.explode(_feature_array(F.col(text_col),
                                                n_buckets))
                       .alias("fb")))
    if weights is not None:
        wt = F.broadcast(weights.select(F.col("bucket").alias("fb"),
                                        F.col("weight").alias("_w")))
        scored = feats.join(wt, "fb", "left").withColumn(
            "_w", F.coalesce(F.col("_w"), F.lit(0)).cast("bigint"))
    else:
        scored = feats.withColumn("_w", stand_in_weights(F.col("fb")))
    return (scored.groupBy("doc_id")
            .agg(F.count("*").cast("bigint").alias("n_feats"),
                 F.sum("_w").cast("bigint").alias("score"))
            .withColumn("label",
                        F.when(F.col("score") > 0, F.lit("keep"))
                        .otherwise(F.lit("drop"))))


def nb_train_weights(df: DataFrame, text_col: str, label_col,
                     n_buckets: int = 4096,
                     scale: int = 1000, shrink: int = 200) -> DataFrame:
    """TRAIN the hashed linear classifier over the exact feature
    space hashed_linear_score scores with: centered-rate evidence per
    bucket,

        weight(b) = floor(scale * (c1*(n1+n0) + K*n1)
                      / ((c1+c0+K) * n1)) - scale   (K = shrink)

    i.e. the feature's label-1 rate DIVIDED BY the class prior —
    with K pseudo-occurrences of shrinkage toward the prior — in
    integer 1/scale units, centered so a prior-rate feature weighs
    EXACTLY 0 (the algebra cancels: c1/c = n1/n makes numerator =
    denominator).  Pure positive-integer floor division, bit-exact
    cross-engine.  Two earlier variants measured and rejected: a
    floor-log2 likelihood ratio (its +-1 quantization jitter across
    ~100 features/doc swamped the signal — held-out accuracy at the
    majority baseline) and add-one smoothing toward 1/2 (rare
    features all inherit rate 1/2 >> prior, flipping every doc
    positive).  K trades variance for bias: with typical per-feature
    document frequencies in the tens, K well above them (default 200)
    crushes the +-1-occurrence sampling noise that otherwise makes
    every no-signal document a coin flip, while a genuinely
    label-bound feature (rate >> prior) retains a weight an order of
    magnitude above the noise floor.  Measured held-out AUC on the
    q125 weak-label task across K in {10, 50, 100, 200, 500}:
    0.795 / 0.827 / 0.826 / 0.835 / 0.816 — K=200 is the knee.
    Positive score = evidence FOR label 1 ('keep' under
    hashed_linear_score's threshold).

    This closes the inference/training loop: CCNet/FineWeb-style
    pipelines train exactly such a linear model on weak labels and
    score the full corpus with it.

    Scale shape: one feature explode over the TRAINING set, one
    map-side-combinable bucket aggregate (model-sized output:
    n_buckets rows), one broadcast scalar total — the model table then
    broadcasts into the corpus-wide scoring pass.  label_col must be
    0/1."""
    feats = df.select(F.col(label_col).alias("_y"),
                      F.explode(_feature_array(F.col(text_col),
                                               n_buckets)).alias("bucket"))
    counts = (feats.groupBy("bucket")
              .agg(F.sum(F.when(F.col("_y") == 1, 1).otherwise(0))
                   .cast("bigint").alias("c1"),
                   F.sum(F.when(F.col("_y") == 0, 1).otherwise(0))
                   .cast("bigint").alias("c0")))
    totals = counts.agg(F.sum("c1").alias("n1"), F.sum("c0").alias("n0"))
    s, k = F.lit(scale), F.lit(shrink)
    num = (F.col("c1") * (F.col("n1") + F.col("n0"))
           + k * F.col("n1")) * s
    den = (F.col("c1") + F.col("c0") + k) * F.col("n1")
    # integer `div` (all operands positive), never float `/`+floor:
    # the double quotient can land an ulp under an integer boundary
    # and flip the floor cross-engine
    w = F.when(F.col("n1") > 0,
               F.expr("_num div _den") - s).otherwise(F.lit(0))
    return (counts.crossJoin(F.broadcast(totals))
            .withColumn("_num", num).withColumn("_den", den)
            .select("bucket", w.cast("bigint").alias("weight")))


def calibration_bins(scored: DataFrame, score_col: str = "score",
                     label_col: str = "y",
                     n_bins: int = 10) -> DataFrame:
    """Reliability table for a trained gate: bin documents into
    n_bins equal-WIDTH integer score bins between the observed
    min/max and report per-bin size and positive count — the
    calibration audit every model-based quality filter (CCNet,
    FineWeb-Edu) publishes next to its classifier: does a higher
    score bin actually contain a higher fraction of positives?

    Equal-width (not equal-mass ntile) bins on purpose: a global
    ntile is one single-reducer sort at 100 TB, while the width rule
    needs only a 1-row (min, max) aggregate broadcast back — the same
    histogram-not-sort discipline as q95's quality gate.  Bin ids are
    exact integers: bin = (score - lo) * n_bins div (hi - lo + 1),
    all operands non-negative after the lo offset, so truncating
    `div` (Spark) and floor `//` (DuckDB) agree, and
    (hi - lo) * n < n * (hi - lo + 1) caps the id at n_bins - 1 with
    no clamp.

    Returns (bin, n_docs, n_pos, lo_score, hi_score, pos_ppm) — all
    integers; pos_ppm = n_pos * 1e6 div n_docs is the observed
    positive rate in ppm.

    Scale shape: one 1-row min/max aggregate broadcast back, then a
    single map-side-combinable aggregate on the bin id.  No window,
    no sort, no second pass over the corpus."""
    s = scored.select(F.col(score_col).cast("bigint").alias("_s"),
                      F.col(label_col).cast("bigint").alias("_y"))
    rng = s.agg(F.min("_s").alias("_lo"), F.max("_s").alias("_hi"))
    binned = (s.crossJoin(F.broadcast(rng))
              .select(F.expr(f"((_s - _lo) * {n_bins}) "
                             "div (_hi - _lo + 1)")
                      .cast("int").alias("bin"), "_s", "_y"))
    return (binned.groupBy("bin")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.sum("_y").cast("bigint").alias("n_pos"),
                 F.min("_s").cast("bigint").alias("lo_score"),
                 F.max("_s").cast("bigint").alias("hi_score"))
            .withColumn("pos_ppm",
                        F.expr("(n_pos * 1000000) div n_docs")
                        .cast("bigint")))


def threshold_confusion(scored: DataFrame, thresholds: list[int],
                        score_col: str = "score",
                        label_col: str = "y") -> DataFrame:
    """Operating-point sheet for a trained gate: the full confusion
    matrix (tp/fp/fn/tn) plus precision/recall/F1 in ppm at EVERY
    candidate threshold in one pass — the table a pipeline owner
    reads to pick the keep/drop cut (q126's calibration bins say the
    score is monotone; this says what each cut costs in false drops).

    predicted positive at threshold t  iff  score > t.

    All ratios are exact integer ppm by cross-multiplied div
    (f1_ppm = 2*tp*1e6 div (2*tp + fp + fn) — the harmonic mean with
    denominators cleared), so the DuckDB twin hash-matches; empty
    denominators are guarded to 0 via greatest(_, 1).

    Scale shape: thresholds are a HANDFUL of literals — they ride in
    as a broadcast dimension, the corpus crossJoins against it
    (|corpus| x |thresholds| rows, still one narrow stage), and ONE
    map-side-combinable aggregate keyed by threshold produces the
    |thresholds|-row sheet.  No window, no per-threshold rescan."""
    thr = F.array(*[F.lit(int(t)) for t in thresholds])
    s = (scored.select(F.col(score_col).cast("bigint").alias("_s"),
                       F.col(label_col).cast("bigint").alias("_y"),
                       F.explode(thr).alias("thr")))
    pred = (F.col("_s") > F.col("thr")).cast("int")
    cell = (F.lit(2) * F.col("_y") + pred)  # 3=tp 2=fn 1=fp 0=tn
    agg = (s.select("thr", cell.alias("_c"))
           .groupBy("thr")
           .agg(*[F.sum((F.col("_c") == code).cast("int"))
                  .cast("bigint").alias(name)
                  for code, name in
                  ((3, "tp"), (1, "fp"), (2, "fn"), (0, "tn"))]))
    return agg.select(
        F.col("thr").cast("bigint").alias("thr"),
        "tp", "fp", "fn", "tn",
        F.expr("(tp * 1000000) div greatest(tp + fp, 1)")
        .cast("bigint").alias("precision_ppm"),
        F.expr("(tp * 1000000) div greatest(tp + fn, 1)")
        .cast("bigint").alias("recall_ppm"),
        F.expr("(2 * tp * 1000000) div greatest(2 * tp + fp + fn, 1)")
        .cast("bigint").alias("f1_ppm"))


def auc_ranksum(scored: DataFrame, score_col: str = "score",
                label_col: str = "y",
                group_col: str | None = None) -> DataFrame:
    """Exact ROC AUC of a trained gate via the tie-corrected
    Mann-Whitney rank-sum, in integer ppm — the RANKER metric q125's
    docstring quotes ("measured held-out AUC 0.835") promoted to an
    oracled first-class audit.  AUC = P(score_pos > score_neg) +
    P(tie)/2; with per-score positive/negative counts (p_s, q_s) and
    qb_s = negatives at strictly lower scores,

        2U = sum_s p_s * (2*qb_s + q_s),     AUC = 2U / (2 * P * N)

    2U is an exact integer (the tie term q_s/2 cleared by the factor
    2), so auc_ppm = 2U * 1e6 div (2*P*N) hash-matches the DuckDB
    twin with no float anywhere.  Grouping (e.g. by train/held-out
    split) yields the generalization-gap sheet in one pass.

    Scale shape: ONE map-side-combinable aggregate over the corpus
    keyed by (group, score) — the cumulative walk then runs over the
    per-group SCORE HISTOGRAM, a model-bounded dimension (integer
    scores of a linear gate span the weight-sum range, not the corpus
    size): the q95/q166 histogram-cumulative discipline, never a rank
    window over rows.  Overflow: 2U <= 2*P*N and the ppm numerator
    2U*1e6 must stay under 2^63, i.e. P*N <= ~4.6e12 per group
    (~4.3M balanced rows) — beyond that, audit on a hash sample per
    group or lift the two div operands to decimal(38,0), as
    gate_agreement documents for the same bound class.

    Returns one row per group: (group?, n_pos, n_neg, n_scores, u2,
    auc_ppm) — all integers."""
    gcols = [group_col] if group_col else []
    s = scored.select(*gcols,
                      F.col(score_col).cast("bigint").alias("_s"),
                      F.col(label_col).cast("bigint").alias("_y"))
    hist = (s.groupBy(*gcols, "_s")
            .agg(F.sum("_y").cast("bigint").alias("_p"),
                 F.sum(1 - F.col("_y")).cast("bigint").alias("_q")))
    from pyspark.sql import Window
    w = (Window.partitionBy(*gcols).orderBy("_s")
         .rowsBetween(Window.unboundedPreceding, -1))
    cum = hist.withColumn(
        "_qb", F.coalesce(F.sum("_q").over(w), F.lit(0)).cast("bigint"))
    ag = (cum.groupBy(*gcols)
          .agg(F.sum("_p").cast("bigint").alias("n_pos"),
               F.sum("_q").cast("bigint").alias("n_neg"),
               F.count("*").cast("bigint").alias("n_scores"),
               F.sum(F.col("_p") * (2 * F.col("_qb") + F.col("_q")))
               .cast("bigint").alias("u2")))
    return ag.withColumn(
        "auc_ppm",
        F.expr("(u2 * 1000000) div greatest(2 * n_pos * n_neg, 1)")
        .cast("bigint"))


def gate_agreement(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cohen's kappa between two keep/drop gates (e.g. the heuristic
    quality rule vs the trained classifier) — the standard
    chance-corrected agreement audit run before swapping one filter
    for another: raw agreement (po) flatters any pair of gates that
    both keep ~everything; kappa subtracts the agreement their
    marginal keep-rates would produce by chance.

    Inputs are 0/1 columns.  With the 2x2 cells a=both-keep,
    b=A-only, c=B-only, d=neither and n = a+b+c+d:

        po  = (a + d) / n
        pe  = ((a+b)(a+c) + (c+d)(b+d)) / n^2
        kappa = (po - pe) / (1 - pe)
              = (n(a+d) - pe_n2) / (n^2 - pe_n2),  pe_n2 = pe * n^2

    kappa_ppm is the exact floor of 1e6*kappa: kappa >= -1 always, so
    num + den >= 0 and the truncating integer div equals floor even
    when kappa is negative (Spark `div` truncates toward zero, DuckDB
    `//` floors — they agree only on non-negative operands, hence the
    +den offset).  den = 0 (both gates constant => pe = 1) reports
    kappa_ppm = 0 by convention (kappa undefined).  Overflow: terms
    reach n^2 * 1e6, exact in int64 to n ~ 2e6 — run the audit on a
    sample split (as q131 does) or lift the two div operands to
    decimal(38,0) beyond that; the comparison is the contract.

    Returns ONE row (n_docs, n_both, n_a_only, n_b_only, n_neither,
    po_ppm, kappa_ppm) — all integers, exact DuckDB twin.

    Scale shape: ONE map-side-combinable 1-row aggregate over the
    corpus; the kappa algebra is a scalar projection on top."""
    a, b = F.col(a_col).cast("bigint"), F.col(b_col).cast("bigint")
    cells = df.agg(
        F.sum(a * b).cast("bigint").alias("n_both"),
        F.sum(a * (1 - b)).cast("bigint").alias("n_a_only"),
        F.sum((1 - a) * b).cast("bigint").alias("n_b_only"),
        F.sum((1 - a) * (1 - b)).cast("bigint").alias("n_neither"))
    n = (F.col("n_both") + F.col("n_a_only") + F.col("n_b_only")
         + F.col("n_neither"))
    pe_n2 = ((F.col("n_both") + F.col("n_a_only"))
             * (F.col("n_both") + F.col("n_b_only"))
             + (F.col("n_b_only") + F.col("n_neither"))
             * (F.col("n_a_only") + F.col("n_neither")))
    num = n * (F.col("n_both") + F.col("n_neither")) - pe_n2
    den = n * n - pe_n2
    # ((num+den)*1e6) div den - 1e6: the +den offset keeps the sole
    # division's operands non-negative (kappa >= -1 => num+den >= 0)
    kappa = F.when(F.col("_den") == 0, F.lit(0)).otherwise(
        F.expr("((_num + _den) * 1000000) div _den - 1000000"))
    return (cells
            .withColumn("_num", num.cast("bigint"))
            .withColumn("_den", den.cast("bigint"))
            .withColumn("_n", n.cast("bigint"))
            .select(F.col("_n").alias("n_docs"),
                    "n_both", "n_a_only", "n_b_only", "n_neither",
                    F.expr("((n_both + n_neither) * 1000000) "
                           "div greatest(_n, 1)")
                    .cast("bigint").alias("po_ppm"),
                    kappa.cast("bigint").alias("kappa_ppm")))


def loo_source_valuation(df: DataFrame, text_col: str, id_col: str,
                         source_col: str, label_col: str,
                         train_col: str, n_buckets: int = 4096,
                         scale: int = 1000,
                         shrink: int = 200) -> DataFrame:
    """Leave-one-source-out data valuation for the hashed linear
    classifier: for every source, retrain nb_train_weights WITHOUT
    that source's training documents and measure held-out accuracy —
    delta_ppm = acc_loo - acc_full says what the source is WORTH to
    the model (negative delta = removing it hurts = valuable;
    positive = the source is noise the model is better off without).
    The LOO-influence sheet a 100 TB mixture curator reads next to
    the q143 temperature weights: q143 sizes sources by count, this
    prices them by held-out utility (Data-Shapley's first-order
    term, computed exactly instead of sampled).

    NO per-source retraining pass: NB evidence counts are ADDITIVE,
    so the ablated model for source s is (global per-bucket counts)
    minus (s's per-bucket counts) — one extra (source, bucket)
    aggregate, then the same integer weight formula (all floor
    division, bit-exact cross-engine, the nb_train_weights
    contract) on the subtracted counts.  The full eval fan-out is
    |eval features| x |sources| rows against a broadcast
    (sources x buckets) weight table — sources are dimension-sized
    by definition, eval sets sample-sized by design.

    Documents whose feature array is empty drop out of both
    accuracy denominators (no fb row — mirrored by the oracle).
    Prediction rule: score > 0 <=> label 1 (hashed_linear_score's
    'keep').  label_col/train_col must be 0/1 columns.

    Returns one row per source: (source, n_train_docs,
    acc_full_ppm, acc_loo_ppm, delta_ppm)."""
    feats = df.select(
        F.col(id_col).alias("i"), F.col(source_col).alias("s"),
        F.col(label_col).alias("y"), F.col(train_col).alias("tr"),
        F.explode(_feature_array(F.col(text_col), n_buckets))
        .alias("bucket")).persist()

    def _w(c1, c0, n1, n0):
        return F.when(
            F.col(n1) > 0,
            F.expr(f"(({c1} * ({n1} + {n0}) + {shrink} * {n1})"
                   f" * {scale})"
                   f" div (({c1} + {c0} + {shrink}) * {n1})")
            - scale).otherwise(F.lit(0)).cast("bigint")

    tr = feats.where(F.col("tr") == 1)
    pb = tr.groupBy("bucket").agg(
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0))
        .cast("bigint").alias("c1"),
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0))
        .cast("bigint").alias("c0"))
    sb = tr.groupBy("s", "bucket").agg(
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0))
        .cast("bigint").alias("s1"),
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0))
        .cast("bigint").alias("s0"))
    tot = pb.agg(F.sum("c1").alias("n1"), F.sum("c0").alias("n0"))
    st = tr.groupBy("s").agg(
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0))
        .cast("bigint").alias("t1"),
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0))
        .cast("bigint").alias("t0"))
    srcs = df.select(F.col(source_col).alias("s")).distinct()
    ab = (pb.crossJoin(F.broadcast(srcs))
          .join(sb, ["s", "bucket"], "left")
          .join(F.broadcast(st), "s")
          .crossJoin(F.broadcast(tot))
          .select("s", "bucket",
                  (F.col("c1") - F.coalesce("s1", F.lit(0)))
                  .alias("ac1"),
                  (F.col("c0") - F.coalesce("s0", F.lit(0)))
                  .alias("ac0"),
                  (F.col("n1") - F.col("t1")).alias("an1"),
                  (F.col("n0") - F.col("t0")).alias("an0")))
    abw = ab.select("s", "bucket",
                    _w("ac1", "ac0", "an1", "an0").alias("weight"))
    fw = (pb.crossJoin(F.broadcast(tot))
          .select("bucket", _w("c1", "c0", "n1", "n0").alias("weight")))
    ev = feats.where(F.col("tr") == 0).select("i", "y", "bucket")
    fullacc = (ev.join(F.broadcast(fw), "bucket", "left")
               .groupBy("i")
               .agg(F.sum(F.coalesce("weight", F.lit(0))).alias("score"),
                    F.max("y").alias("y"))
               .agg(F.expr("sum(CASE WHEN (score > 0) = (y = 1)"
                           " THEN 1 ELSE 0 END) * 1000000"
                           " div count(*)").alias("acc_full_ppm")))
    looacc = (ev.crossJoin(F.broadcast(srcs))
              .join(F.broadcast(abw), ["s", "bucket"], "left")
              .groupBy("s", "i")
              .agg(F.sum(F.coalesce("weight", F.lit(0))).alias("score"),
                   F.max("y").alias("y"))
              .groupBy("s")
              .agg(F.expr("sum(CASE WHEN (score > 0) = (y = 1)"
                          " THEN 1 ELSE 0 END) * 1000000"
                          " div count(*)").alias("acc_loo_ppm")))
    ntr = (df.where(F.col(train_col) == 1)
           .groupBy(F.col(source_col).alias("s"))
           .agg(F.count("*").cast("bigint").alias("n_train_docs")))
    out = (looacc.join(ntr, "s")
           .crossJoin(F.broadcast(fullacc))
           .select(F.col("s").alias(source_col), "n_train_docs",
                   F.col("acc_full_ppm").cast("bigint")
                   .alias("acc_full_ppm"),
                   F.col("acc_loo_ppm").cast("bigint")
                   .alias("acc_loo_ppm"),
                   (F.col("acc_loo_ppm") - F.col("acc_full_ppm"))
                   .cast("bigint").alias("delta_ppm")))
    out.unpersist_input = feats.unpersist
    return out


def weak_vote_fusion(df: DataFrame, id_col: str,
                     gate_cols: list[str]) -> DataFrame:
    """Snorkel-lite weak-supervision label fusion: k binary quality
    gates vote; each gate earns a CHANCE-CENTERED reliability
    weight = 2 * (its agreement with the MAJORITY label, ppm) - 1e6
    (the one-step EM-free approximation of a Snorkel label model),
    then the final label is the weighted vote sum(+-weight).  A
    gate that echoes the consensus keeps its say, a random gate's
    weight sits near 0, and a gate that agrees BELOW chance earns a
    NEGATIVE weight — the fusion inverts its vote, the Snorkel
    insight that an anti-correlated labeler is still informative
    (measured on the q219 corpus: an uncentered agreement weight
    never flips any 3-2 vote, because every assenting triple
    out-weighs every dissenting pair; centering is what lets a
    minority carry a close vote).  The data-programming step
    between raw heuristic gates (q56) and a trained gate (q125):
    fuse first, train on the fused label.

    Deterministic and integer end-to-end: weights are floor-ppm,
    the fused score is a +-weight sum, ties (score <= 0) label 0.
    gate_cols must be 0/1 columns.

    Scale shape: one corpus pass for the majority, ONE 1-row
    aggregate for all k weights (k CASE sums — gate count is
    query-sized), broadcast back as a cross join; no shuffle beyond
    the aggregate.  Returns (id, n_pos, majority, score, fused,
    flipped)."""
    k = len(gate_cols)
    n_pos = sum((F.col(g) for g in gate_cols), F.lit(0))
    base = (df.select(F.col(id_col).alias("id"),
                      *[F.col(g).cast("int").alias(g)
                        for g in gate_cols])
            .withColumn("n_pos", n_pos.cast("int"))
            .withColumn("maj", (F.col("n_pos") * 2 > k).cast("int")))
    w = base.agg(*[
        F.expr(f"2 * (sum(CASE WHEN {g} = maj THEN 1 ELSE 0 END)"
               f" * 1000000 div count(*)) - 1000000").alias(f"_w{i}")
        for i, g in enumerate(gate_cols)])
    score = sum(
        ((2 * F.col(g) - 1) * F.col(f"_w{i}")
         for i, g in enumerate(gate_cols)), F.lit(0))
    return (base.crossJoin(F.broadcast(w))
            .withColumn("score", score.cast("bigint"))
            .select(F.col("id").alias(id_col),
                    F.col("n_pos").cast("int").alias("n_pos"),
                    F.col("maj").cast("int").alias("majority"),
                    "score",
                    (F.col("score") > 0).cast("int").alias("fused"))
            .withColumn("flipped",
                        (F.col("fused") != F.col("majority"))
                        .cast("int")))


def calibration_summary(bins: DataFrame) -> DataFrame:
    """One-row summary of a calibration_bins table: the two numbers
    a gate owner actually tracks across retrains — RESOLUTION
    (Murphy-decomposition discrimination: bin-weighted mean
    |pos_ppm - pool rate|; 0 = the score separates nothing, higher =
    bins genuinely differ from the base rate) and MONOTONICITY
    (adjacent-bin inversions: count + worst magnitude; a calibrated
    score never gets LESS positive as it grows, and every inversion
    is a region where thresholding misorders documents).  Raw
    integer scores have no probability reading, so classic ECE
    against identity confidence is undefined here — resolution +
    inversions are the parts that survive without a calibration
    map, exact in integer ppm.

    Scale shape: the input is already the n_bins-row audit table —
    one 1-row fold + one <= n_bins lag window.  Returns (n_bins,
    n_docs, pool_ppm, resolution_ppm, n_inversions,
    max_inversion_ppm)."""
    from pyspark.sql import Window
    pool = bins.agg(
        F.count("*").cast("bigint").alias("nb"),
        F.sum("n_docs").cast("bigint").alias("nn"),
        F.expr("sum(n_pos) * 1000000 div sum(n_docs)")
        .cast("bigint").alias("pool_ppm"))
    j = bins.crossJoin(F.broadcast(pool))
    res = j.agg(
        F.expr("sum(n_docs * abs(pos_ppm - pool_ppm))"
               " div max(nn)").cast("bigint").alias("resolution_ppm"))
    w = Window.orderBy("bin")
    inv = (bins.withColumn("prev", F.lag("pos_ppm").over(w))
           .agg(F.expr("sum(CASE WHEN pos_ppm < prev THEN 1"
                       " ELSE 0 END)").cast("bigint")
                .alias("n_inversions"),
                F.expr("coalesce(max(CASE WHEN pos_ppm < prev"
                       " THEN prev - pos_ppm ELSE 0 END), 0)")
                .cast("bigint").alias("max_inversion_ppm")))
    return (pool.crossJoin(res).crossJoin(inv)
            .select(F.col("nb").alias("n_bins"),
                    F.col("nn").alias("n_docs"),
                    "pool_ppm", "resolution_ppm",
                    "n_inversions", "max_inversion_ppm"))
