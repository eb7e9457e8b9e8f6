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
    total = scaled.agg(F.sum("scaled")).collect()[0][0]
    return (scaled.withColumn(
        "weight", F.round(F.col("scaled") / F.lit(float(total)), 6))
        .withColumn("scaled", F.round("scaled", 6))
        .select("source", "n_docs", "n_units", "scaled", "weight"))
