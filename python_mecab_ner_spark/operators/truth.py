"""Truth finding / claim adjudication.

A web-scale KG ingests the SAME fact from many pages — and they
disagree (stale mirrors, scraped spam, vandalism).  Knowledge-Vault-
style construction therefore runs a conflict-resolution pass over the
claim table (source, subject, value) before materializing an edge:
majority vote, then re-weight each source by how often it agreed with
the consensus and vote again (the first fixed-point iteration of
TruthFinder / Sums-Hubs; one round captures most of the lift and keeps
the plan static).

Everything is exact integer arithmetic (trust in ppm, packed-integer
argmax for deterministic tie-breaks), so the whole operator has a
hash-exact SQL twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VAL_BASE = 1 << 20  # value-id pack base: vals must sit in [0, VAL_BASE)


def adjudicate_claims(claims: DataFrame, subj_col: str = "subj",
                      val_col: str = "val",
                      source_col: str = "source") -> DataFrame:
    """One trust-update round of weighted-vote truth finding over a
    claim table (source, subj, val) with integer vals in
    [0, VAL_BASE):

      1. naive vote: per subj, the val with most claims
         (tie -> smaller val; packed-integer argmax, the house
         deterministic-argmax pattern).
      2. source trust: Laplace-smoothed agreement with the naive
         consensus, trust_ppm = (n_agree + 1) * 1e6 div (n_claims + 2)
         — never 0 or 1e6, so a source is down- not zero-weighted and
         the round-1 vote always has signal.
      3. weighted vote: per (subj, val), score = sum of the claiming
         sources' trust_ppm (per claim); per subj the max-score val
         wins (same tie rule).

    Returns per subj: (subj, naive_val, val, n_claims, n_vals,
    support_ppm) where val is the adjudicated value and support_ppm =
    winning score * 1e6 div total score — the confidence the edge
    writer thresholds on.  naive_val != val marks the claims rescued
    from a noisy-majority.

    Overflow bound: packed score * VAL_BASE must fit int64 =>
    claims-per-subject * 1e6 * 2^20 < 2^63, i.e. ~8.8e6 claims per
    subject; beyond that lower VAL_BASE (vals are usually a small
    dictionary) or pre-aggregate per (subj, val, source).

    Scale shape: one (subj, val, source)-keyed combinable aggregate
    over the claim table (the only corpus-sized exchange), then
    subj-keyed aggregates; the source-trust table is dimension-sized
    and broadcast back.  No window anywhere — every argmax is a
    packed-integer max inside a combinable agg."""
    g = (claims.select(F.col(subj_col).alias("subj"),
                       F.col(val_col).cast("bigint").alias("val"),
                       F.col(source_col).alias("source"))
         .groupBy("subj", "val", "source")
         .agg(F.count("*").cast("bigint").alias("cnt"))
         .persist())

    def pack(score):
        return (score * F.lit(VAL_BASE)
                + (F.lit(VAL_BASE - 1) - F.col("val")))

    def unpack_val(pcol):
        return F.lit(VAL_BASE - 1) - (pcol % F.lit(VAL_BASE))

    sv = g.groupBy("subj", "val").agg(F.sum("cnt").alias("n"))
    c0 = (sv.groupBy("subj")
          .agg(F.max(pack(F.col("n"))).alias("_p0"))
          .select("subj", unpack_val(F.col("_p0")).alias("naive_val")))

    trust = (g.join(c0, "subj")
             .groupBy("source")
             .agg(F.sum(F.when(F.col("val") == F.col("naive_val"),
                               F.col("cnt")).otherwise(F.lit(0)))
                  .alias("n_agree"),
                  F.sum("cnt").alias("n_src")))
    trust = trust.select(
        "source",
        F.expr("((n_agree + 1) * 1000000) div (n_src + 2)")
        .cast("bigint").alias("trust_ppm"))

    w = (g.join(F.broadcast(trust), "source")
         .groupBy("subj", "val")
         .agg(F.sum(F.col("cnt") * F.col("trust_ppm")).alias("score"),
              F.sum("cnt").alias("n")))
    out = (w.groupBy("subj")
           .agg(F.max(pack(F.col("score"))).alias("_p1"),
                F.sum("score").alias("_total"),
                F.sum("n").cast("bigint").alias("n_claims"),
                F.count("*").cast("bigint").alias("n_vals"))
           .withColumn("val", unpack_val(F.col("_p1")).cast("bigint"))
           .withColumn("support_ppm",
                       F.expr("((_p1 div " + str(VAL_BASE)
                              + ") * 1000000) div _total")
                       .cast("bigint")))
    res = (out.join(c0, "subj")
           .select("subj",   # caller's subject type, passed through
                   F.col("naive_val").cast("bigint").alias("naive_val"),
                   "val", "n_claims", "n_vals", "support_ppm"))
    res.unpersist_input = g.unpersist
    return res
