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


def _dist2_expr(col: str, centroid: list[float]) -> F.Column:
    """Squared euclidean distance to an inlined centroid (pure Catalyst)."""
    arr = "array(" + ",".join(f"CAST({x!r} AS DOUBLE)" for x in centroid) + ")"
    return F.expr(
        f"""aggregate(zip_with(CAST(`{col}` AS ARRAY<DOUBLE>), {arr},
                               (x, c) -> (x - c) * (x - c)),
                      CAST(0.0 AS DOUBLE), (a, d) -> a + d)"""
    )


def _nearest_expr(col: str, centroids: list[list[float]]) -> F.Column:
    d = [_dist2_expr(col, c) for c in centroids]
    return (F.array_position(F.array(*d), F.array_min(F.array(*d))) - 1).cast("int")


def _fit_centroids_lloyd(
    sample: DataFrame, k: int, iters: int, seed: int
) -> list[list[float]]:
    """Lloyd's k-means over a (persisted) sample DataFrame[v: array<double>].

    Init: k deterministic pseudo-random rows (order by a hash). Each
    iteration: nearest-centroid assignment (codegen projection) → new
    centroid = per-dimension mean (posexplode + hash agg → k·dim rows to
    the driver). Empty clusters keep their previous centroid.
    """
    init = (
        sample.orderBy(F.xxhash64(F.lit(seed), F.col("v").cast("array<string>")))
        .limit(k)
        .collect()
    )
    centroids = [list(r["v"]) for r in init]
    if len(centroids) < k:
        centroids = centroids + centroids[: k - len(centroids)]
    for _ in range(iters):
        assigned = sample.select(
            _nearest_expr("v", centroids).alias("cluster"),
            F.posexplode(F.col("v")).alias("dim", "x"),
        )
        rows = (
            assigned.groupBy("cluster", "dim")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = [list(c) for c in centroids]
        for r in rows:
            new[r["cluster"]][r["dim"]] = r["m"]
        if new == centroids:
            break
        centroids = new
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_probe: int = 4,
    digits: int = 4,
    seed: int = 11,
    fit_sample: int = 100_000,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer + probed clusters.

    The 100 TB path when both corpus and query set are large:

    1. fit a k-means coarse quantizer on a bounded corpus SAMPLE (the
       centroid fit never scans the full corpus — `fit_sample` rows);
    2. assign every corpus vector to its nearest centroid (one broadcast
       of n_clusters×dim floats, one codegen'd projection — no shuffle);
    3. each query probes its `n_probe` nearest centroids; candidates are
       corpus rows in those clusters (equi-join on cluster id — shuffle
       is bounded by cluster sizes, and AQE skew-join splits hot
       clusters);
    4. exact cosine + window top-k within candidates.

    Recall is controlled by n_probe/n_clusters. Centroids come from a few
    Lloyd's iterations over the sample, expressed as DataFrame jobs (assign
    = codegen'd nearest-centroid projection, update = per-dimension mean
    via posexplode + hash agg); the scoring path never touches Python.
    """
    # --- 1. fit coarse quantizer on a sample -----------------------------
    n = corpus.count()
    frac = min(1.0, fit_sample / max(n, 1))
    sample = (
        corpus.sample(fraction=frac, seed=seed) if frac < 1.0 else corpus
    ).select(F.col(vec_col).cast("array<double>").alias("v")).persist()
    centroids = _fit_centroids_lloyd(sample, n_clusters, iters=8, seed=seed)
    sample.unpersist()

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _nearest_expr(vec_col, centroids).alias("cluster"),
    )

    # queries: rank all centroid distances, keep the n_probe nearest
    qd = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.array(*[_dist2_expr(vec_col, cc) for cc in centroids]).alias("dists"),
    )
    probed = qd.select(
        "query_id",
        "qv",
        F.explode(
            F.slice(
                F.expr(
                    "transform(array_sort(transform(sequence(0, size(dists)-1),"
                    " i -> struct(element_at(dists, i+1) AS d, i AS idx))), s -> s.idx)"
                ),
                1,
                n_probe,
            )
        ).alias("cluster"),
    )

    scored = (
        c.join(probed, "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("qv"), F.col("cv"), digits).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
