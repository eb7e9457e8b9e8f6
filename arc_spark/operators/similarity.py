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

from arc_spark.functions.vector import cosine_similarity, dot, l2_norm


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
    # norms are hoisted BELOW the join (r14, guide §2.3 "don't recompute
    # what you throw away"): l2_norm is an interpreted HOF fold over the
    # vector, and the pair-product re-ran it per (query, corpus) pair —
    # |Q| times per corpus row, |C| times per query row. Projected here it
    # runs once per row; the score keeps the exact expression shape
    # dot/(qnorm*cnorm), so results are IEEE-identical (A/B: rows equal,
    # p50 0.406 → 0.338 s on the q19 lane at sf0.1).
    q = queries.select(F.col(qid).alias("query_id"),
                       F.col(vec_col).alias("qv"),
                       l2_norm(F.col(vec_col)).alias("qnorm"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"),
                      l2_norm(F.col(vec_col)).alias("cnorm"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv"))
                    / (F.col("qnorm") * F.col("cnorm")), digits)
            .alias("score"),
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
    # per-row norms hoisted below the bucket join (same r14 rationale and
    # IEEE-identical score shape as brute_force_topk above)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
                      sig.alias("bucket"),
                      l2_norm(F.col(vec_col)).alias("cnorm"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
                       sig.alias("bucket"),
                       l2_norm(F.col(vec_col)).alias("qnorm"))
    scored = (
        c.join(q, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv"))
                    / (F.col("qnorm") * F.col("cnorm")), digits)
            .alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def kmeans_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str | None = None,
    max_centroids: int = 65_536,
) -> DataFrame:
    """Nearest-centroid assignment: (id, cid) for every corpus vector.

    The curation use: cluster a corpus's embeddings (topic balancing,
    diversity sampling, semantic dedup sharding) by assigning each vector
    to its nearest centroid under squared-L2. Ties break toward the
    smallest centroid id, so the mapping is deterministic across engines.

    Scale design: the centroid table is collected once (bounded —
    ``max_centroids``×dim doubles, the documented driver bound) and
    shipped in the UDF closure; assignment is an Arrow-batched numpy GEMM
    (|x|² − 2xCᵀ + |c|²) over ``mapInPandas`` — one scan of the corpus,
    no shuffle, no per-element interpreted lambdas. This is the same
    assignment kernel :func:`ivf_topk` uses for its coarse quantizer,
    exposed standalone so pipelines can cluster against externally
    trained centroids.
    """
    import numpy as np

    cid = centroid_id_col or id_col
    rows = (
        centroids.select(
            F.col(cid).cast("long").alias("cid"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        .orderBy("cid")
        .limit(max_centroids)
        .collect()
    )
    if not rows:
        raise ValueError("kmeans_assign: empty centroid table")
    cids = np.array([r["cid"] for r in rows], dtype=np.int64)
    C = np.array([list(r["cv"]) for r in rows], dtype=np.float64)
    c2 = (C * C).sum(axis=1)

    def assign(batches):
        from arc_spark.functions.threads import pin_math_threads

        pin_math_threads(budget)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            d2 = (V * V).sum(axis=1)[:, None] - 2.0 * (V @ C.T) + c2[None, :]
            out = pdf[["id"]].copy()
            # argmin is stable → first minimal index; cids sorted asc →
            # ties resolve to the smallest centroid id
            out["cid"] = cids[d2.argmin(axis=1)]
            yield out

    src = corpus.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    from arc_spark.functions.threads import task_thread_budget

    budget = task_thread_budget(src)
    return (
        src.mapInPandas(assign, "id long, cid long")
        .select(F.col("id").alias(id_col), "cid")
    )


def _fit_centroids_lloyd(sample: DataFrame, k: int, iters: int, seed: int):
    """Lloyd's k-means over a bounded sample, fit on the driver in numpy.

    The sample is ALREADY capped (`fit_sample` rows — the collect here is
    the documented driver bound, fit_sample×dim doubles), so the fit is a
    dense local problem: vectorized distance via |x|²−2xCᵀ+|c|², argmin,
    per-cluster means. A distributed fit over a bounded sample would pay
    2·iters Spark jobs to do what one GEMM loop does in milliseconds —
    at 100 TB the corpus-side work is the ASSIGNMENT pass, never the fit.

    Init: k rows chosen by xxhash64 of the vector bytes (deterministic and
    independent of partition/collect order). Empty clusters keep their
    previous centroid. Returns a k×dim numpy array.
    """
    import numpy as np

    X = np.array([list(r["v"]) for r in sample.collect()], dtype=np.float64)
    if X.size == 0:
        raise ValueError("cannot fit centroids on an empty sample")
    # deterministic order-independent init: sort rows by a bytes hash
    import hashlib

    digests = np.array([
        int.from_bytes(hashlib.blake2b(row.tobytes(), digest_size=8,
                                       key=str(seed).encode()).digest(), "big")
        for row in X
    ])
    C = X[np.argsort(digests)[:k]].copy()
    if len(C) < k:
        C = np.vstack([C, C[: k - len(C)]])
    for _ in range(iters):
        d2 = (
            (X * X).sum(axis=1)[:, None]
            - 2.0 * (X @ C.T)
            + (C * C).sum(axis=1)[None, :]
        )
        assign = d2.argmin(axis=1)
        new = C.copy()
        for c in range(k):
            members = X[assign == c]
            if len(members):
                new[c] = members.mean(axis=0)
        if np.array_equal(new, C):
            break
        C = new
    return C


#: sq8="auto" threshold: estimated candidate-join corpus payload (bytes)
#: above which scalar quantization is enabled. 4 GiB ≈ where the candidate
#: shuffle stops fitting the in-memory shuffle path on a 32-core/128 GiB
#: box at default partitioning and the job turns network/spill-bound —
#: past it, an 8× byte reduction beats the per-candidate dequant cost;
#: under it, the float path's zero-CPU-overhead scoring wins (measured r6:
#: sq8 was a wash-to-loss at dim=64 / 6k-row test corpora). At 100 TB (say
#: dim 768 float64 ≈ 6 KB/row, 16×10⁹ rows) any realistic n_probe puts the
#: estimate orders of magnitude past the gate, so auto ≡ on at the scale
#: the mode exists for, and auto ≡ off at pytest scale.
SQ8_AUTO_MIN_CANDIDATE_BYTES = 4 << 30

#: sq8="auto" probe floor: corpora at or under this row count replace the
#: FULL queries.count() with a bounded limit-count probe (at most the
#: query rows that would hit the byte gate) — a small corpus does not
#: bound the candidate payload when the query set is huge (r9 review), so
#: the spill protection stays by construction, while the common
#: small/small case pays one tiny bounded job instead of a full count.
SQ8_AUTO_PROBE_MIN_N = 100_000


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
    sq8: bool | str = "auto",
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer + probed clusters.

    ``sq8=True`` adds scalar quantization (IVF-SQ8, the FAISS
    ``IVF*,SQ8`` index family): corpus vectors travel through the
    candidate join as PACKED uint8 codes (one byte per dimension,
    per-dim min/max trained on the same bounded sample as the
    centroids), and candidates are scored on dequantized values in an
    Arrow-batched kernel. At 100 TB of float64 embeddings this shrinks
    the operator's dominant shuffle — corpus rows into probed clusters —
    by 8×, which is the difference between a corpus-sized shuffle and a
    manageable one; recall impact is small (pytest locks recall@k ≥ 0.9
    against the exact-scored float path on the test corpus).

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
    Lloyd's iterations over the driver-bounded sample (numpy); assignment
    and probing are Arrow-batched GEMMs in mapInPandas with the k×dim
    centroid matrix shipped in the closure; the candidate scoring path is
    pure Catalyst.

    ``sq8="auto"`` (the default) gates quantization on the operator's own
    cost model instead of asking the caller to know the crossover: SQ8
    pays a per-candidate dequantize (CPU) to shrink the candidate join's
    shuffled corpus payload 8× (network/spill). CPU loses at small
    payloads — measured r6: the float path wins when everything fits in
    the shuffle's memory path — and wins once the candidate traffic
    exceeds what executors can hold without spilling, where the job goes
    network/disk-bound and bytes ARE the bottleneck. The gate estimates
    candidate payload as ``n_queries × n_corpus × n_probe / n_clusters ×
    dim × 8`` bytes (expected equi-join fan-out under uniform cluster
    sizes) and enables SQ8 above ``SQ8_AUTO_MIN_CANDIDATE_BYTES``; the
    two counts and one first() it needs are metadata-cheap next to the
    scan the operator already does. When the corpus is small
    (``n <= SQ8_AUTO_PROBE_MIN_N``) the FULL ``queries.count()`` is
    replaced by a BOUNDED probe (scan at most the number of query rows
    that would hit the gate) — a small corpus alone does not bound the
    candidate payload, so huge query sets keep the spill protection, but
    the common small/small case pays only an O(gate/per-query-bytes)
    limit-count instead of a full query-side count.
    When auto flips SQ8 on, the decision and payload estimate are
    logged at INFO. Pass True/False to override.

    NOTE (r8 behavior change): the default moved False -> "auto", so
    past the gate existing large-scale callers get SQ8's quantized
    scores (slightly different top-k) where they previously got exact
    float scoring. Callers needing exact float scores must pass
    ``sq8=False``; small-corpus/huge-query-set workloads that want the
    byte reduction despite a tiny corpus, ``sq8=True``.
    """
    # --- 1. fit coarse quantizer on a sample -----------------------------
    n = corpus.count()
    if sq8 == "auto":
        # dim probe shared by both gate branches (hoisted; the branches
        # silently diverged when it was duplicated — r10 review)
        dim_row = corpus.select(
            F.size(F.col(vec_col)).alias("d")).first()
        dim = (dim_row["d"] or 0) if dim_row is not None else 0
        if n <= SQ8_AUTO_PROBE_MIN_N:
            # sample-fit regime: the centroid fit already covers the whole
            # corpus, so skip the FULL queries.count() — but a small corpus
            # does NOT bound the candidate payload (q queries still shuffle
            # q × n × n_probe/n_clusters × dim × 8 bytes; r9 review). Use a
            # BOUNDED probe instead: derive the query count that would hit
            # the gate and scan at most that many query rows — O(gate /
            # per-query-bytes) rows, never O(|queries|), so huge query sets
            # keep the spill protection without paying a full count.
            per_query = n * n_probe / max(n_clusters, 1) * dim * 8
            # clamp to a JVM int: per_query ≤ 1 (empty corpus, dim 0)
            # would put q_gate past 2^31-1 and limit() has no long
            # overload — a probe this large is an unconditional "gate
            # can't trip" anyway (r10 review)
            q_gate = min(int(SQ8_AUTO_MIN_CANDIDATE_BYTES
                             / max(per_query, 1.0)) + 1, (1 << 31) - 1)
            q_seen = queries.select(F.lit(1)).limit(q_gate).count()
            sq8 = q_seen >= q_gate
            if sq8:
                import logging

                logging.getLogger(__name__).info(
                    "ivf_topk sq8=auto enabled SQ8 on a small corpus "
                    "(n=%d): >= %d query rows put the candidate payload "
                    "over the %.1f GiB gate (pass sq8=False for exact "
                    "float scoring)", n, q_gate,
                    SQ8_AUTO_MIN_CANDIDATE_BYTES / (1 << 30))
        else:
            est = (queries.count() * n * n_probe
                   / max(n_clusters, 1) * dim * 8)
            sq8 = est >= SQ8_AUTO_MIN_CANDIDATE_BYTES
            if sq8:
                import logging

                logging.getLogger(__name__).info(
                    "ivf_topk sq8=auto enabled SQ8 quantization: estimated "
                    "candidate payload %.1f GiB >= %.1f GiB gate "
                    "(pass sq8=False for exact float scoring)",
                    est / (1 << 30),
                    SQ8_AUTO_MIN_CANDIDATE_BYTES / (1 << 30))
    frac = min(1.0, fit_sample / max(n, 1))
    sample = (
        corpus.sample(fraction=frac, seed=seed) if frac < 1.0 else corpus
    ).select(F.col(vec_col).cast("array<double>").alias("v"))
    C = _fit_centroids_lloyd(sample, n_clusters, iters=8, seed=seed)
    c2 = (C * C).sum(axis=1)  # |c|² precomputed once, shipped in closure

    vmin = vscale = None
    if sq8:
        # train the scalar quantizer on the same bounded sample (one tiny
        # posexplode aggregate — sample_rows × dim, never corpus-sized);
        # corpus values outside the sampled range clip, the standard
        # train-on-sample SQ behavior
        import numpy as np

        bounds = (sample.select(F.posexplode("v").alias("pos", "x"))
                  .groupBy("pos")
                  .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
                  .orderBy("pos").collect())
        vmin = np.array([r["lo"] for r in bounds], dtype=np.float64)
        vscale = np.array([r["hi"] for r in bounds]) - vmin
        vscale = np.maximum(vscale, 1e-12) / 255.0

    # --- 2./3. assignment + probing: one Arrow-batched GEMM per batch ----
    # Centroids travel in the UDF closure (k×dim floats — tiny); each batch
    # computes |x|²−2xCᵀ+|c|² vectorized. No inlined literal expression
    # trees (a k×dim literal per distance made Catalyst analysis itself
    # the bottleneck), no per-element interpreted lambdas.
    def assign_corpus(batches):
        import numpy as np
        import pandas as pd

        from arc_spark.functions.threads import pin_math_threads

        pin_math_threads(c_budget)

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf["cv"].to_numpy()).astype(np.float64)
            d2 = (V * V).sum(axis=1)[:, None] - 2.0 * (V @ C.T) + c2[None, :]
            cluster = d2.argmin(axis=1).astype(np.int32)
            if sq8:
                # pack each row to dim uint8 bytes — the candidate
                # shuffle carries 1 byte/dim instead of 8
                codes = np.clip(
                    np.rint((np.clip(V, vmin, vmin + vscale * 255.0)
                             - vmin) / vscale), 0, 255).astype(np.uint8)
                yield pd.DataFrame({
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "code": [r.tobytes() for r in codes],
                    "cluster": cluster,
                })
            else:
                out = pdf[["neighbor_id", "cv"]].copy()
                out["cluster"] = cluster
                yield out

    c_schema = (
        "neighbor_id long, code binary, cluster int" if sq8
        else "neighbor_id long, cv array<double>, cluster int"
    )
    c_src = corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    from arc_spark.functions.threads import task_thread_budget

    c_budget = task_thread_budget(c_src)
    c = c_src.mapInPandas(assign_corpus, c_schema)

    def probe_queries(batches):
        import numpy as np
        import pandas as pd

        from arc_spark.functions.threads import pin_math_threads

        pin_math_threads(q_budget)

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf["qv"].to_numpy()).astype(np.float64)
            d2 = (V * V).sum(axis=1)[:, None] - 2.0 * (V @ C.T) + c2[None, :]
            near = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
            reps = near.shape[1]
            yield pd.DataFrame({
                "query_id": pdf["query_id"].to_numpy().repeat(reps),
                "qv": pdf["qv"].to_numpy().repeat(reps),
                "cluster": near.reshape(-1).astype(np.int32),
            })

    q_src = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    q_budget = task_thread_budget(q_src)
    probed = q_src.mapInPandas(
        probe_queries, "query_id long, qv array<double>, cluster int")

    cand = (c.join(probed, "cluster")
            .filter(F.col("query_id") != F.col("neighbor_id")))
    if sq8:
        # dequantize + cosine in one Arrow-batched kernel: frombuffer
        # over the concatenated codes, vectorized row-dot — no per-pair
        # Python, no interpreted lambdas
        def score_sq8(batches):
            import numpy as np
            import pandas as pd

            from arc_spark.functions.threads import pin_math_threads

            pin_math_threads(s_budget)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = (np.frombuffer(b"".join(pdf["code"]), dtype=np.uint8)
                     .reshape(len(pdf), -1).astype(np.float64)
                     * vscale[None, :] + vmin[None, :])
                Q = np.vstack(pdf["qv"].to_numpy()).astype(np.float64)
                num = (Q * X).sum(axis=1)
                den = (np.linalg.norm(Q, axis=1)
                       * np.linalg.norm(X, axis=1))
                score = np.round(
                    np.divide(num, den, out=np.zeros_like(num),
                              where=den > 0), digits)
                yield pd.DataFrame({
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "score": score,
                })

        s_budget = task_thread_budget(cand)
        scored = cand.mapInPandas(
            score_sq8, "query_id long, neighbor_id long, score double")
    else:
        scored = cand.select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("qv"), F.col("cv"), digits).alias("score"),
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
