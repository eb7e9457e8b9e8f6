"""Deterministic sampling / split-assignment for training-data pipelines.

Dataset assembly needs reproducible, engine-portable selection: train/val/
test splits that never migrate between runs, per-source mixture rates
("100% of wiki, 25% of crawl"), and ablation subsets — all WITHOUT an RNG,
because a seed-based sample is not stable across engines, partitionings, or
retries. The standard trick is hash-bucketing: a content/id hash maps every
row to a bucket in [0, B); thresholds on the bucket express any rate.

Portability: bucket = conv(substr(md5(salt || id), 1, 8), 16, 10) % B.
md5 hex is identical everywhere; DuckDB spells the hex→int step
``('0x' || substr(md5(...), 1, 8))::BIGINT`` (see :func:`hash_bucket_sql`).
Pure codegen — no shuffle, no Python, prunes straight down to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


DEFAULT_BUCKETS = 10_000


def _spread_few_file_input(df):
    """Round-robin-repartition ``df`` to the cluster default parallelism
    when its file-backed input cannot reach it (r14, guide §2.5 input
    skew — the ``_shingled`` pattern, gated to stay scale-adaptive).

    DSIR's explode+md5 feature pipeline is a CPU-bound projection that
    otherwise runs at the INPUT's partition count: a one-file corpus at
    bench scale ran the whole thing on one core (measured q31 2.01 →
    1.37 s p50 at sf0.1). The gate estimates achievable scan parallelism
    as max(leaf files, estimated bytes / maxPartitionBytes) — both
    analysis-only (no job; the byte estimate is packing.py's bounded
    Hadoop-FS stat sample) — and skips the shuffle whenever the input
    can already fill the cluster (a 100 TB corpus must never pay a
    redistribution pass for this). Non-file-backed frames (in-memory
    test data, post-shuffle lineage) report no files and pass through.
    """
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    try:
        files = list(df.inputFiles())
    except Exception:
        return df
    if not files:
        return df
    if len(files) >= n:
        return df
    from arc_spark.operators.packing import _estimated_input_bytes

    est = _estimated_input_bytes(spark, files)
    if est:
        try:
            raw = spark.conf.get("spark.sql.files.maxPartitionBytes",
                                 str(128 << 20))
            mpb = int(raw)  # session.py sets a plain byte count
        except ValueError:
            mpb = 128 << 20
        if max(len(files), -(-est // mpb)) >= n:
            return df
    return df.repartition(n)


def hash_bucket(col: Column | str, buckets: int = DEFAULT_BUCKETS,
                salt: str = "split") -> Column:
    """Deterministic bucket in [0, buckets) from md5(salt || value).

    32 hash bits are kept (8 hex chars) — uniform enough for rate control
    while staying exactly representable in every engine's int64.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), _c(col).cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    return h % buckets


def hash_bucket_sql(expr: str, buckets: int = DEFAULT_BUCKETS,
                    salt: str = "split") -> str:
    """DuckDB-oracle form of :func:`hash_bucket` (same buckets, same salt)."""
    return (
        f"(('0x' || substr(md5('{salt}' || CAST({expr} AS STRING)), 1, 8))"
        f"::BIGINT % {buckets})"
    )


def hash_split(col: Column | str, fractions: dict[str, float] | None = None,
               buckets: int = DEFAULT_BUCKETS, salt: str = "split") -> Column:
    """Assign each row to a named split by cumulative bucket thresholds.

    ``fractions`` maps split name → fraction (must sum to ≤ 1; any
    remainder lands in the LAST split, matching the cumulative-threshold
    oracle form). Assignment is per-row deterministic: the same id lands
    in the same split in every run, engine, and subset of the corpus —
    the property training pipelines rely on to keep eval uncontaminated
    across dataset versions.
    """
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    b = hash_bucket(col, buckets, salt)
    names = list(fractions)
    expr: Column | None = None
    cum = 0.0
    branches = []
    for name in names[:-1]:
        cum += fractions[name]
        branches.append((int(round(cum * buckets)), name))
    expr = F.lit(names[-1])
    for threshold, name in reversed(branches):
        expr = F.when(b < threshold, F.lit(name)).otherwise(expr)
    return expr


def hash_split_sql(expr: str, fractions: dict[str, float] | None = None,
                   buckets: int = DEFAULT_BUCKETS, salt: str = "split") -> str:
    """DuckDB-oracle form of :func:`hash_split`."""
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    b = hash_bucket_sql(expr, buckets, salt)
    names = list(fractions)
    parts = ["CASE"]
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        parts.append(f"WHEN {b} < {int(round(cum * buckets))} THEN '{name}'")
    parts.append(f"ELSE '{names[-1]}' END")
    return " ".join(parts)


def mixture_filter(col: Column | str, rate: Column,
                   buckets: int = DEFAULT_BUCKETS,
                   salt: str = "mix") -> Column:
    """Boolean keep-predicate sampling each row at ``rate`` (a per-row
    Column, e.g. a per-source rate joined/mapped in). Deterministic:
    monotone in rate, so raising a source's rate only ADDS documents —
    downsampled corpora stay supersets/subsets across mixture tweaks."""
    return hash_bucket(col, buckets, salt) < (rate * buckets).cast("long")


def stratified_cap(df, per_group_k: int, group_col: str = "source",
                   id_col: str = "doc_id", salt: str = "cap"):
    """Deterministic per-group cap: at most ``per_group_k`` rows per
    ``group_col`` value, chosen by hash order — the "cap each source at
    N documents" curation step, reproducible across engines/runs/retries
    (no RNG; the same trick as :func:`hash_split`).

    Selection key is ``(md5(salt || id), id)``: the hash spreads
    uniformly (an id-ordered cap would bias toward old documents) and the
    id tiebreak keeps the pick total. One window shuffle on the group
    column; group cardinality is the skew knob — for a corpus with few
    huge sources this is the same shuffle shape any per-source operator
    has, and the window's TOP-K never materializes more than the
    partition it ranks."""
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit(salt), _c(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(key.asc(), _c(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= per_group_k)
        .drop("__rk")
    )


def stratified_cap_sql(per_group_k: int, group_col: str = "source",
                       id_col: str = "doc_id", salt: str = "cap",
                       table: str = "documents") -> str:
    """DuckDB-oracle form of :func:`stratified_cap` (same key, same
    tiebreak)."""
    return f"""
    SELECT * EXCLUDE (__rk) FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY {group_col}
            ORDER BY md5('{salt}' || CAST({id_col} AS VARCHAR)), {id_col}
        ) AS __rk FROM {table}
    ) WHERE __rk <= {per_group_k}
"""


def temperature_weights(df, alpha: float = 0.5,
                        source_col: str = "source",
                        tokens_col=None):
    """Temperature-scaled mixture weights per source (the multilingual /
    multi-corpus sampling rule from T5/mT5: w_i ∝ n_i^alpha, alpha<1
    upsamples small sources). Returns one row per source with its raw
    token count and normalized sampling weight — the artifact a training
    job consumes next to the packed shards.

    One map-side-combining aggregate + a broadcastable total; rounding
    pinned at 6 dp so the DuckDB oracle (q71) hashes identically.
    """
    from pyspark.sql import functions as F

    per = df.groupBy(_c(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(tokens_col) if tokens_col is not None
         else F.count(F.lit(1))).alias("n_units"),
    )
    scaled = per.withColumn(
        "scaled", F.pow(F.col("n_units").cast("double"), F.lit(alpha)))
    # r13: the total rides a broadcast single-row cross join instead of
    # an eager collect-into-literal — the operator was running a full
    # aggregation job at PLAN-CONSTRUCTION time, a driver barrier that
    # serializes composition at scale. Same IEEE division (double
    # column vs double literal), so the q71 oracle hash is unchanged.
    total = scaled.agg(F.sum("scaled").alias("__total"))
    return (scaled.crossJoin(F.broadcast(total))
        .withColumn("weight", F.round(F.col("scaled") / F.col("__total"), 6))
        .withColumn("scaled", F.round("scaled", 6))
        .select("source", "n_docs", "n_units", "scaled", "weight"))


def dsir_importance_weights(df, target, tokens_col="w",
                            id_cols: tuple[str, ...] = ("doc_id",),
                            buckets: int = DEFAULT_BUCKETS,
                            alpha: float = 1.0, salt: str = "dsir"):
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    the log-likelihood ratio of its hashed n-gram features under a
    TARGET distribution vs the RAW corpus distribution — the standard
    select-web-data-that-looks-like-my-target curation step. Selection
    itself is then a filter/top-k on the weight (or Gumbel-noised weight
    for sampled DSIR), composable with :func:`hash_split` /
    :func:`stratified_cap`.

    ``df`` must carry a tokenized ``tokens_col`` (array<string>) —
    tokenization policy stays with the caller. ``target`` is a boolean
    Column marking target-corpus membership. Features are unigrams +
    bigrams hashed into ``buckets`` via the engine-portable md5 bucket
    (:func:`hash_bucket`), add-``alpha`` smoothed.

    Scale shape: one explode → (doc, bucket) count aggregate (map-side
    combine; the persisted frame is doc×distinct-bucket sized, NOT
    feature-instance sized), bucket model is ≤ ``buckets`` rows →
    broadcast join back, one per-doc aggregate. Per-feature log-ratios
    are rounded to 6 dp and carried as BIGINT micro-units, so the
    per-doc sum is exact integer arithmetic and hashes identically on
    every engine (the q74 decimal-log pattern, simplified).

    Returns one row per document: ``*id_cols, n_feats,
    weight_micro`` (BIGINT, exact) ``, weight`` (double, rounded 6 dp).
    """
    from pyspark import StorageLevel

    from arc_spark.functions.text import bigram_list_expr

    ids = [_c(c) for c in id_cols]
    # spread few-file inputs across the cluster BEFORE the CPU-bound
    # explode+md5 pipeline (r14; no-op whenever the scan can already
    # fill the default parallelism — see _spread_few_file_input)
    df = _spread_few_file_input(df)
    feats = df.select(
        *ids, target.alias("__t"),
        F.explode_outer(F.expr(
            f"concat({tokens_col}, {bigram_list_expr(tokens_col)})"
        )).alias("__f"),
    ).filter(F.col("__f").isNotNull())
    # (doc, bucket) counts: the persisted relation feeds BOTH the bucket
    # model and the scoring join; aggregating BEFORE persisting keeps it
    # doc×bucket sized instead of feature-instance sized
    doc_feat = (feats
                .withColumn("__b", hash_bucket(F.col("__f"), buckets, salt))
                .groupBy(*[c for c in id_cols], "__t", "__b")
                .agg(F.count(F.lit(1)).alias("__c"))
                .persist(StorageLevel.MEMORY_AND_DISK))
    bcounts = doc_feat.groupBy("__b").agg(
        F.sum("__c").alias("__cr"),
        F.sum(F.when(F.col("__t"), F.col("__c")).otherwise(0)).alias("__ct"))
    # r13 made the corpus totals lazy (no .first() at plan-construction);
    # r15 removes the broadcast-build sub-job the lazy form still paid:
    # the totals derive from ``bcounts`` ITSELF, so a whole-frame window
    # sum computes them inline in the model subtree — no second subtree,
    # no BroadcastExchange job for the one-row totals (the model's own
    # broadcast for the scoring join remains). BIT-IDENTICAL by
    # construction, not just in practice: ``__ct``/``__cr`` are BIGINT
    # counts, so their sum is exact integer arithmetic in ANY
    # accumulation order — the int64→double cast + literal add then
    # yields the same IEEE doubles the broadcast form produced (and the
    # eager float(n + alpha*buckets) before it); q31/q32 oracle hashes
    # unchanged (verified at sf0.01 AND sf0.1). The empty-frame window
    # sum returns no rows at all (model is empty either way), matching
    # the old coalesce(0) contract. A/B: q31 full lane p50 1.83 → 1.61 s
    # (−12 %, 4/5 aligned passes better). The single-partition window
    # over ``buckets``-many rows (≤10k by contract) is a bounded-size
    # frame at ANY corpus scale, so this holds at 100 TB.
    from pyspark.sql import Window as _W

    _whole = _W.partitionBy()
    btot = bcounts.select(
        "__b", "__ct", "__cr",
        (F.sum("__ct").over(_whole).cast("double")
         + F.lit(float(alpha * buckets))).alias("__denom_t"),
        (F.sum("__cr").over(_whole).cast("double")
         + F.lit(float(alpha * buckets))).alias("__denom_r"))
    model = btot.select(
        "__b",
        F.round((F.log((F.col("__ct") + F.lit(alpha)) / F.col("__denom_t"))
                 - F.log((F.col("__cr") + F.lit(alpha)) / F.col("__denom_r")))
                * 1e6).cast("long").alias("__lru"))
    scored = doc_feat.join(F.broadcast(model), "__b")
    out = (scored.groupBy(*[c for c in id_cols])
           .agg(F.sum("__c").alias("n_feats"),
                F.sum(F.col("__c") * F.col("__lru")).alias("weight_micro"))
           .withColumn("weight", F.round(
               F.col("weight_micro") / F.lit(1e6), 6)))
    # bounded operator-cache registry (r8 advice, r9 design): doc_feat
    # stays hot for the returned lazy plan and its compositions; a
    # long-lived session evicts the oldest caches past the registry cap
    from arc_spark.cacheutil import register_cache

    register_cache(doc_feat)
    return out


def dsir_importance_weights_sql(target_expr: str, tokens_expr: str,
                                id_cols: tuple[str, ...] = ("doc_id",),
                                buckets: int = DEFAULT_BUCKETS,
                                alpha: float = 1.0, salt: str = "dsir",
                                table: str = "documents") -> str:
    """DuckDB-oracle form of :func:`dsir_importance_weights` — same
    features, same md5 bucket, same micro-unit integer sums. NULL
    features are filtered like the Spark side's explode_outer +
    isNotNull (a caller-supplied token array may carry NULL elements;
    counting them only here would shift every denominator)."""
    from arc_spark.functions.text import bigram_list_sql

    ids = ", ".join(id_cols)
    b = hash_bucket_sql("__f", buckets, salt)
    return f"""
    WITH toks AS (
        SELECT {ids}, ({target_expr}) AS __t, {tokens_expr} AS w
        FROM {table}
    ), feats AS (
        SELECT {ids}, __t, unnest(
            w || {bigram_list_sql('w')}
        ) AS __f
        FROM toks
    ), feats_nn AS (
        SELECT * FROM feats WHERE __f IS NOT NULL
    ), doc_feat AS (
        SELECT {ids}, __t, {b} AS __b, COUNT(*) AS __c
        FROM feats_nn GROUP BY {ids}, __t, {b}
    ), bcounts AS (
        SELECT __b, SUM(__c) AS __cr,
               SUM(CASE WHEN __t THEN __c ELSE 0 END) AS __ct
        FROM doc_feat GROUP BY __b
    ), tot AS (
        SELECT SUM(__cr) AS rn, SUM(__ct) AS tn FROM bcounts
    ), model AS (
        SELECT __b, CAST(ROUND(
            (ln((__ct + {alpha}) / (tn + {alpha} * {buckets}))
             - ln((__cr + {alpha}) / (rn + {alpha} * {buckets}))) * 1e6)
            AS BIGINT) AS __lru
        FROM bcounts CROSS JOIN tot
    )
    SELECT {ids},
           CAST(SUM(__c) AS BIGINT) AS n_feats,
           CAST(SUM(__c * __lru) AS BIGINT) AS weight_micro,
           ROUND(SUM(__c * __lru) / 1e6, 6) AS weight
    FROM doc_feat JOIN model USING (__b)
    GROUP BY {ids}
"""


def dsir_gumbel_topk(weights_df, k: int, weight_col: str = "weight_micro",
                     id_cols: tuple[str, ...] = ("doc_id",),
                     temperature: float = 1.0,
                     weight_unit: float = 1e-6,
                     salt: str = "dsir-sample"):
    """The resampling half of DSIR: select ``k`` documents WITHOUT
    replacement with probability ∝ softmax(weight / temperature), via
    the Gumbel-top-k trick (Kool et al. 2019) — rank by
    ``weight·weight_unit/T + Gumbel noise`` and keep the top k.

    ``weight_unit`` is the scale of ``weight_col`` in nats: the default
    1e-6 matches :func:`dsir_importance_weights`'s BIGINT
    ``weight_micro``; pass ``weight_unit=1.0`` for its double
    ``weight`` column — the Gumbel noise spans roughly [−2.7, +14.6],
    so a mis-scaled signal silently degrades to a pure hash draw.
    ``temperature`` must be > 0 (T→0 is plain top-k by weight — pass a
    tiny positive T; 0 itself would divide by zero here and NULL out
    every key in the SQL twin).

    The noise is DERANDOMIZED: u = (md5-bucket(ids) + 0.5) / 2^20,
    g = −ln(−ln(u)) — per-doc deterministic, so the same corpus selects
    the same k docs in every run, engine, and partitioning (the
    reproducibility property the split/cap operators already keep), at
    the cost of the noise being a fixed hash draw rather than fresh
    randomness. NULL id components are keyed via an explicit sentinel
    (Spark's concat_ws would silently DROP them, colliding ("a", NULL)
    with (NULL, "a") and diverging from the SQL twin).

    One global sort-limit (Spark's TakeOrderedAndProject — per-partition
    top-k then a k-row driver merge, no full sort shuffle at scale).
    Ties break on the id columns for full determinism.
    """
    if not temperature > 0:
        raise ValueError(f"temperature must be > 0, got {temperature!r}")
    noise_buckets = 1 << 20
    idc = [F.col(c) for c in id_cols]
    key = F.concat_ws("\x1f", *[
        F.coalesce(c.cast("string"), F.lit("\x00null")) for c in idc])
    u = (hash_bucket(key, noise_buckets, salt) + F.lit(0.5)) / noise_buckets
    g = -F.log(-F.log(u))
    scored = weights_df.withColumn(
        "gumbel_key",
        F.round(F.col(weight_col)
                * F.lit(float(weight_unit) / float(temperature)) + g, 6))
    return (scored.orderBy(F.col("gumbel_key").desc(), *idc)
            .limit(int(k)))


def dsir_gumbel_topk_sql(inner_sql: str, k: int,
                         weight_col: str = "weight_micro",
                         id_cols: tuple[str, ...] = ("doc_id",),
                         temperature: float = 1.0,
                         weight_unit: float = 1e-6,
                         salt: str = "dsir-sample") -> str:
    """DuckDB-oracle form of :func:`dsir_gumbel_topk` over an inner
    weights query (same hash draw, same null-sentinel id keying, same
    rounding, same tie-break). 6 dp matches the proven cross-engine
    ln tolerance (q74)."""
    if not temperature > 0:
        raise ValueError(f"temperature must be > 0, got {temperature!r}")
    noise_buckets = 1 << 20
    key = " || chr(31) || ".join(
        f"COALESCE(CAST({c} AS VARCHAR), chr(0) || 'null')"
        for c in id_cols)
    b = hash_bucket_sql(f"({key})", noise_buckets, salt)
    ids = ", ".join(id_cols)
    return f"""
    SELECT * FROM (
        SELECT *, ROUND({weight_col}
                  * {float(weight_unit) / float(temperature)!r}
                  - ln(-ln(({b} + 0.5) / {noise_buckets})), 6)
               AS gumbel_key
        FROM ({inner_sql})
    ) ORDER BY gumbel_key DESC, {ids} LIMIT {int(k)}
"""
