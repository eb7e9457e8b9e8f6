"""Approximate-nearest-neighbor search over embedding columns.

Two strategies:

- :func:`brute_force_topk` — exact: broadcast the (small) query set against
  the corpus, one pass, window top-k. This is the correctness baseline and
  is actually the right plan whenever |queries| is small: the corpus is
  scanned once, fully parallel, no index build.
- :func:`lsh_bucketed_topk` — random-hyperplane LSH: sign-bit signatures
  bucket the corpus; each query probes only its bucket(s). Sub-linear per
  query at the cost of recall; the standard 100 TB path when |queries| is
  large. Hyperplanes are derived deterministically from xxhash64 so the
  index is reproducible without storing plane vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from arc_spark.functions.vector import cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    digits: int = 4,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, score, rank).

    Plan: broadcast-join queries × corpus (no shuffle of the corpus), score
    in codegen, then a window top-k that shuffles only (query, score) pairs.
    Scores are rounded to `digits` and ties broken by neighbor id, so the
    result set is stable across engines and runs.
    """
    qid = query_id_col or id_col
    q = queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("qv"), F.col("cv"), digits).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _sign_signature(vec_col_name: str, planes: int, dim: int, seed: int = 7):
    """`planes` sign bits: sign(<v, h_p>) with pseudo-random ±1 hyperplanes.

    h_p[i] = +1 if xxhash64(seed, p, i) is even else -1 — deterministic,
    storage-free, and computable as a codegen'd expression. Built as one SQL
    expr (nested lambdas) to avoid PySpark's lambda-variable collisions.
    """
    return F.expr(
        f"""aggregate(sequence(0, {planes - 1}), CAST(0 AS BIGINT),
            (acc, p) -> acc * 2 + IF(
                aggregate(
                    zip_with(
                        CAST(`{vec_col_name}` AS ARRAY<DOUBLE>),
                        transform(sequence(0, {dim - 1}),
                                  i -> IF(pmod(xxhash64({seed}, p, i), 2) = 0,
                                          CAST(1.0 AS DOUBLE), CAST(-1.0 AS DOUBLE))),
                        (x, h) -> x * h),
                    CAST(0.0 AS DOUBLE), (a, x) -> a + x) >= 0,
                CAST(1 AS BIGINT), CAST(0 AS BIGINT)))"""
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = 8,
    digits: int = 4,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane bucketing.

    Corpus and queries get a `planes`-bit signature; candidates are corpus
    rows sharing the query's bucket (equi-join on signature — a shuffle on
    the bucket key instead of an all-pairs product). Recall rises with fewer
    planes / multi-probe; `planes=8` → 256 buckets.
    """
    sig = _sign_signature(vec_col, planes, dim)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
                      sig.alias("bucket"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
                       sig.alias("bucket"))
    scored = (
        c.join(q, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("qv"), F.col("cv"), digits).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
