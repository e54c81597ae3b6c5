"""Count-min sketch: sub-linear frequency summaries for heavy-hitter
queries over unbounded vocabularies.

At 100 TB an exact term-frequency table is corpus-vocabulary-sized
(billions of keys); a CM sketch is d x w integers REGARDLESS of
vocabulary — buildable in one map-side-combinable aggregate, mergeable
across partitions/days by cellwise addition, and broadcastable to
executors for constant-time frequency probes inside other operators
(quality gates, stopword detection, negative sampling).

Estimates are deterministic integers (md5-derived bucket hashes, min
over rows), so the whole path has an exact DuckDB oracle — the
overestimate bias of CM (est >= true, whp close) is visible in the
q71 output columns rather than hidden behind floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int


def _bucket(col, r: int, w: int):
    return F.pmod(md5_int(col, salt=f"cm{r}:"), F.lit(w))


def cm_sketch(tokens: DataFrame, term_col: str, d: int = 4,
              w: int = 256) -> DataFrame:
    """(r, b, cnt) sketch cells from a token stream: every token votes
    in d rows via independent salted hashes.  ONE scan (the d hashes
    ride in a per-row array, exploded), ONE combinable aggregate on
    the tiny (r, b) key space — no vocabulary-sized state anywhere."""
    cells = F.array(*[
        F.struct(F.lit(r).cast("int").alias("r"),
                 _bucket(F.col(term_col), r, w).cast("int").alias("b"))
        for r in range(d)])
    return (tokens.select(F.explode(cells).alias("c"))
            .groupBy(F.col("c.r").alias("r"), F.col("c.b").alias("b"))
            .agg(F.count("*").cast("bigint").alias("cnt")))


def cm_estimate(terms: DataFrame, sketch: DataFrame, term_col: str,
                d: int = 4, w: int = 256) -> DataFrame:
    """Point estimates: min over the d sketch cells a term hashes to.
    The sketch is d*w rows — broadcast, so probing any number of terms
    is a map-side join + one combinable min aggregate."""
    keys = F.array(*[
        F.struct(F.lit(r).cast("int").alias("r"),
                 _bucket(F.col(term_col), r, w).cast("int").alias("b"))
        for r in range(d)])
    probes = (terms.select(F.col(term_col).alias("term"),
                           F.explode(keys).alias("k"))
              .select("term", F.col("k.r").alias("r"),
                      F.col("k.b").alias("b")))
    return (probes.join(F.broadcast(sketch), ["r", "b"])
            .groupBy("term")
            .agg(F.min("cnt").cast("bigint").alias("cm_est")))


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CM sketches by cellwise addition — the algebraic property
    that makes the sketch maintainable incrementally: sketch(A ∪ B) ==
    merge(sketch(A), sketch(B)) exactly (proven by test).  A daily
    crawl keeps one sketch per partition/day and folds them without
    touching raw data; the merge is one combinable aggregate over
    d*w-row inputs."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return (u.groupBy("r", "b")
            .agg(F.sum("cnt").cast("bigint").alias("cnt")))
