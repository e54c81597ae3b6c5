"""Similarity search over an embedding column (array<float>).

- brute_force_topk: exact cosine top-k against a query vector, pure
  SQL (zip_with + aggregate stay in codegen; the top-k is a global
  TakeOrderedAndProject — no full sort materialization).
- sign_lsh_buckets / bucketed_topk: the scale path.  Bucket key =
  sign bits of the first b dimensions (a fixed random-hyperplane LSH
  with axis-aligned planes — deterministic and cross-engine
  reproducible).  Candidates come only from the query's bucket, so a
  1000-executor scan prunes ~2^-b of the corpus per probe; the
  brute-force operator doubles as the recall baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(emb_col, qvec: list[float]):
    q = F.array(*[F.lit(float(v)) for v in qvec])
    prods = F.zip_with(emb_col, q, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(emb_col):
    sq = F.aggregate(F.transform(emb_col, lambda x: x * x),
                     F.lit(0.0), lambda acc, x: acc + x)
    return F.sqrt(sq)


def cosine_to(emb_col, qvec: list[float]):
    import math
    qn = math.sqrt(sum(v * v for v in qvec)) or 1.0
    return _dot(emb_col, qvec) / (_norm(emb_col) * F.lit(qn))


def brute_force_topk(df: DataFrame, qvec: list[float], k: int = 10,
                     id_col: str = "vec_id", emb_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: (vec_id, rank).  Integer output columns so
    the correctness oracle hash-matches; ties broken by id."""
    from pyspark.sql import Window
    scored = df.select(F.col(id_col),
                       cosine_to(F.col(emb_col), qvec).alias("cos"))
    # distributed TakeOrderedAndProject first; the rank window then
    # only ever sees k rows (never a global single-partition sort)
    topk = scored.orderBy(F.col("cos").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (topk.withColumn("rank", F.row_number().over(w))
            .select(id_col, "rank"))


def sign_lsh_buckets(df: DataFrame, b: int = 8,
                     emb_col: str = "embedding") -> DataFrame:
    """Append an integer LSH bucket: bit i set iff dim i >= 0."""
    bucket = sum((F.when(F.element_at(F.col(emb_col), i + 1) >= 0,
                         F.lit(1 << i)).otherwise(F.lit(0)) for i in range(b)),
                 F.lit(0))
    return df.withColumn("bucket", bucket.cast("int"))


def _pair_cosine(a_col, b_col):
    """Cosine between two embedding columns (codegen-side: zip_with dot
    + aggregate norms, accumulated in double)."""
    dot = F.aggregate(F.zip_with(a_col, b_col, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    return dot / (_norm(a_col) * _norm(b_col))


def embedding_neardup_pairs(df: DataFrame, threshold: float = 0.4,
                            b: int = 8, id_col: str = "vec_id",
                            emb_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate candidate pairs (the dedup
    family's ANN member): sign-LSH bucket both sides, self-join on the
    bucket key only, keep pairs with cosine >= threshold.

    The bucket join is the 100 TB path — the shuffle key is the
    bucket, pair work is O(sum over buckets of n_b^2), never global
    O(n^2); recall is traded per LSH bits b, with the within-bucket
    cosine exact."""
    bucketed = sign_lsh_buckets(df.select(id_col, emb_col), b, emb_col)
    a = bucketed.alias("a")
    c = bucketed.alias("c")
    return (a.join(c, on="bucket")
            .where(F.col(f"a.{id_col}") < F.col(f"c.{id_col}"))
            .where(_pair_cosine(F.col(f"a.{emb_col}"),
                                F.col(f"c.{emb_col}")) >= threshold)
            .select(F.col(f"a.{id_col}").alias("vec_a"),
                    F.col(f"c.{id_col}").alias("vec_b")))


def bucketed_topk(df: DataFrame, qvec: list[float], k: int = 10, b: int = 8,
                  id_col: str = "vec_id", emb_col: str = "embedding") -> DataFrame:
    """ANN top-k restricted to the query's sign-LSH bucket.  The bucket
    predicate is a plain filter -> partition-prunable when the table is
    written partitioned/bucketed by `bucket`."""
    qbucket = 0
    for i in range(b):
        if qvec[i] >= 0:
            qbucket |= 1 << i
    cand = sign_lsh_buckets(df, b, emb_col).filter(F.col("bucket") == qbucket)
    scored = cand.select(F.col(id_col),
                         cosine_to(F.col(emb_col), qvec).alias("cos"))
    return (scored.orderBy(F.col("cos").desc(), F.col(id_col).asc())
            .limit(k).select(id_col))
