"""Time functions.

The reference string-rewrites ``time_bucket(INTERVAL, col)`` into integer
epoch arithmetic before handing SQL to DuckDB
(/root/reference/internal/api/query.go:369-526). Here the same bucketing is a
Catalyst expression — whole-stage-codegen'd, no rewrite pass needed.
``date_trunc`` needs nothing at all (Spark built-in, same as DuckDB's).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_INTERVAL_RE = re.compile(
    r"^\s*(\d+)\s*(microsecond|millisecond|second|minute|hour|day|week)s?\s*$",
    re.IGNORECASE,
)

_UNIT_MICROS = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 7 * 86_400_000_000,
}


def interval_micros(interval: str) -> int:
    """'15 minutes' → 900000000 µs. Calendar units (month/year) are not
    fixed-width; use date_trunc for those (the reference does the same —
    months are left to DuckDB natively, query.go:400-412)."""
    m = _INTERVAL_RE.match(interval)
    if not m:
        raise ValueError(
            f"unsupported time_bucket interval {interval!r}; "
            "use date_trunc for calendar units (month/quarter/year)"
        )
    return int(m.group(1)) * _UNIT_MICROS[m.group(2).lower()]


def time_bucket(interval: str, col: Column | str, origin_micros: int = 0) -> Column:
    """Fixed-width tumbling bucket start, as a timestamp column.

    Equivalent DuckDB SQL (for oracles):
    ``make_timestamp(((epoch_us(col) - origin) // N) * N + origin)``.
    Uses integer `div` so the arithmetic is exact for any epoch value.
    """
    n = interval_micros(interval)
    c = F.col(col) if isinstance(col, str) else col
    micros = F.unix_micros(c) - F.lit(origin_micros)
    bucket = (micros - ((micros % n) + n) % n)  # floor-div for negatives too
    return F.timestamp_micros(bucket + F.lit(origin_micros))


def normalize_epoch_to_timestamp(col: Column | str) -> Column:
    """Auto-detect epoch unit (s/ms/µs/ns) by magnitude → timestamp(µs).

    Mirrors the reference's ingest-time normalization
    (/root/reference/internal/ingest/msgpack.go:435-505): values are
    classified by decimal magnitude, valid for dates 2001-01-01..2286.
    """
    c = F.col(col) if isinstance(col, str) else col
    v = c.cast("long")
    return F.timestamp_micros(
        F.when(v >= F.lit(10**17), (v / F.lit(1000)).cast("long"))  # ns → µs
        .when(v >= F.lit(10**14), v)  # already µs
        .when(v >= F.lit(10**11), v * F.lit(1000))  # ms → µs
        .otherwise(v * F.lit(1_000_000))  # s → µs
    )


def register_sql_functions(spark) -> None:
    """Expose the time functions to the SQL surface (QueryService users).

    Spark 4 SQL scalar functions (CREATE TEMPORARY FUNCTION ... RETURN) —
    the body is inlined into the calling plan by Catalyst, so these cost
    the same as the DataFrame expressions (no Python UDF involved).
    Reference: time_bucket rewrite A5 (query.go:369-443) exposed as a real
    function instead of a string rewrite.
    """
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION time_bucket_us(
               width_us BIGINT, t TIMESTAMP) RETURNS TIMESTAMP
           RETURN timestamp_micros((unix_micros(t) div width_us) * width_us)"""
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION interval_us(width STRING)
           RETURNS BIGINT
           RETURN CAST(split_part(trim(width), ' ', 1) AS BIGINT) *
               CASE
                   WHEN split_part(trim(width), ' ', 2) IN ('us', 'microsecond', 'microseconds') THEN 1
                   WHEN split_part(trim(width), ' ', 2) IN ('ms', 'millisecond', 'milliseconds') THEN 1000
                   WHEN split_part(trim(width), ' ', 2) IN ('s', 'sec', 'second', 'seconds') THEN 1000000
                   WHEN split_part(trim(width), ' ', 2) IN ('m', 'min', 'minute', 'minutes') THEN 60000000
                   WHEN split_part(trim(width), ' ', 2) IN ('h', 'hour', 'hours') THEN 3600000000
                   WHEN split_part(trim(width), ' ', 2) IN ('d', 'day', 'days') THEN 86400000000
                   WHEN split_part(trim(width), ' ', 2) IN ('w', 'week', 'weeks') THEN 604800000000
               END"""
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION time_bucket(
               width STRING, t TIMESTAMP) RETURNS TIMESTAMP
           RETURN timestamp_micros(
               (unix_micros(t) div interval_us(width)) * interval_us(width))"""
    )


def gapfill(
    df,
    bucket_col: str,
    step: str,
    group_cols: tuple[str, ...] = (),
    value_cols: tuple[str, ...] = ("value",),
    method: str = "null",
):
    """Fill missing time buckets in an aggregated frame — the
    TimescaleDB ``time_bucket_gapfill`` family, Spark-first. ``df`` is
    already one row per (group, bucket); missing buckets inside each
    group's [min, max] span come back with:

    - ``method="null"`` — NULL values (the grid alone),
    - ``method="locf"`` — last observation carried forward,
    - ``method="linear"`` — linear interpolation between the
      surrounding observations (edges without both neighbors stay
      NULL, Timescale semantics).

    Scale shape: one tiny per-group (min, max) aggregate → the dense
    bucket grid generates PLAN-SIDE via ``sequence()`` + explode (rows
    proportional to the OUTPUT, never a driver loop), one left join
    back (both sides hash-partitioned on the group — the join and
    every fill window reuse one exchange), and the fills are window
    functions ordered by bucket. No corpus-sized shuffle beyond the
    aggregate the caller already did.

    The bucket column must be a timestamp; ``step`` is an interval
    string (``'1 hour'``). Grids are bounded per group by observed
    min/max — callers wanting a fixed horizon filter or union the span
    row themselves.
    """
    from pyspark.sql import Window, functions as F

    if method not in ("null", "locf", "linear"):
        raise ValueError(f"unknown gapfill method {method!r}")
    # step is spliced into an F.expr interval literal — whitelist it so a
    # malformed/attacker-influenced string can't inject expression text
    # into the plan (r9 advice). The unit set is the module's own
    # _INTERVAL_RE (micro/millisecond included — a ns-precision store
    # legitimately gapfills at '500 milliseconds'; the first whitelist
    # draft dropped them, r10 review)
    if not _INTERVAL_RE.fullmatch(step):
        raise ValueError(
            f"gapfill step must look like '5 minutes' (N "
            f"microsecond|millisecond|second|minute|hour|day|week[s]); "
            f"got {step!r}")
    step = step.strip()
    g = [F.col(c) for c in group_cols]
    span = df.groupBy(*g).agg(
        F.min(bucket_col).alias("__mn"), F.max(bucket_col).alias("__mx"))
    grid = span.select(
        *[F.col(c) for c in group_cols],
        F.explode(F.expr(
            f"sequence(__mn, __mx, interval '{step}')")).alias(bucket_col))
    full = grid.join(df, [*group_cols, bucket_col], "left")
    if method == "null":
        return full
    w = Window.partitionBy(*g).orderBy(bucket_col)
    back = w.rowsBetween(Window.unboundedPreceding, 0)
    fwd = w.rowsBetween(0, Window.unboundedFollowing)
    t_us = F.unix_micros(F.col(bucket_col))
    out = full
    for v in value_cols:
        if method == "locf":
            out = out.withColumn(
                v, F.last(v, ignorenulls=True).over(back))
        else:
            prev_v = F.last(v, ignorenulls=True).over(back)
            next_v = F.first(v, ignorenulls=True).over(fwd)
            prev_t = F.last(
                F.when(F.col(v).isNotNull(), t_us), ignorenulls=True
            ).over(back)
            next_t = F.first(
                F.when(F.col(v).isNotNull(), t_us), ignorenulls=True
            ).over(fwd)
            interp = prev_v + (next_v - prev_v) * (
                (t_us - prev_t).cast("double")
                / (next_t - prev_t).cast("double"))
            out = out.withColumn(
                v,
                F.when(F.col(v).isNotNull(), F.col(v))
                .when(prev_v.isNotNull() & next_v.isNotNull()
                      & (next_t != prev_t), interp))
    return out


def counter_rate(
    df,
    time_col: str = "time",
    value_col: str = "value",
    group_cols: tuple[str, ...] = (),
    reset_as_value: bool = True,
    order_cols: tuple[str, ...] = (),
):
    """Per-second rate of a monotonically-increasing counter, with
    monitoring-standard reset handling (InfluxDB ``non_negative_
    derivative`` / PromQL ``rate`` semantics for raw samples): a
    negative delta means the counter restarted, so the post-reset VALUE
    is the increase (``reset_as_value=True``) or the sample is dropped
    from the rate (False → NULL).

    One window per group ordered by time (a single hash-partition
    shuffle on the group; at 100 TB series are the natural partition
    key and skew maps to hot series — the same profile every windowed
    operator here has). The first sample of each group has no
    predecessor and returns NULL. Output keeps the input row plus
    ``delta`` (counter increase) and ``rate_per_s``.

    ``order_cols`` break timestamp TIES deterministically (pass the
    event id when timestamps can repeat — lag over a tied order pairs
    rows in shuffle-dependent order otherwise, making delta/rate
    nondeterministic across runs).
    """
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy(*[F.col(c) for c in group_cols]) \
        .orderBy(time_col, *[F.col(c) for c in order_cols])
    prev_v = F.lag(value_col).over(w)
    prev_t = F.lag(time_col).over(w)
    raw = F.col(value_col) - prev_v
    inc = (F.when(raw >= 0, raw)
           .otherwise(F.col(value_col) if reset_as_value
                      else F.lit(None)))
    dt_s = (F.unix_micros(F.col(time_col))
            - F.unix_micros(prev_t)).cast("double") / F.lit(1e6)
    return (df
            .withColumn("delta", F.when(prev_v.isNotNull(), inc))
            .withColumn("rate_per_s", F.when(
                prev_t.isNotNull() & (dt_s > 0),
                F.col("delta") / dt_s)))


def m4_downsample(
    df,
    n_buckets: int = 200,
    time_col: str = "time",
    value_col: str = "value",
    group_cols: tuple[str, ...] = (),
):
    """M4 visualization downsampling (Jugel et al., VLDB 2014): per
    pixel-column bucket keep the rows attaining min(time), max(time),
    min(value), max(value) — the four points that make a width-
    ``n_buckets`` line chart of the reduced series PIXEL-IDENTICAL to
    the full series. The dashboard-serving reducer (a 100M-point series
    → ≤4·n_buckets points) that, unlike sequential LTTB, is pure
    aggregation: per-group span (tiny relation, broadcast back), bucket
    index arithmetic, one groupBy for the per-bucket extremes, one
    broadcastable join + filter. No window over the raw series, no
    sequential dependency — fully parallel at any corpus size.

    Ties keep EVERY attaining row (deterministic, engine-portable; a
    renderer drawing duplicate points is unaffected). Output adds
    ``bucket`` and keeps input columns. NULL values are ignored for the
    value extremes but still hold their time-extreme slots.
    """
    from pyspark.sql import functions as F

    g = list(group_cols)
    t_us = F.unix_micros(F.col(time_col))
    span = df.groupBy(*[F.col(c) for c in g]).agg(
        F.min(t_us).alias("__t0"), F.max(t_us).alias("__t1"))
    j = df.join(F.broadcast(span), g) if g else df.crossJoin(
        F.broadcast(span))
    # last point lands in the last bucket (not a one-point overflow)
    b = F.when(
        F.col("__t1") == F.col("__t0"), F.lit(0)
    ).otherwise(F.least(
        F.floor(((t_us - F.col("__t0")).cast("double")
                 / (F.col("__t1") - F.col("__t0")).cast("double"))
                * n_buckets).cast("long"),
        F.lit(n_buckets - 1)))
    bucketed = j.withColumn("bucket", b)
    ext = bucketed.groupBy(*[F.col(c) for c in g], "bucket").agg(
        F.min(t_us).alias("__mnt"), F.max(t_us).alias("__mxt"),
        F.min(value_col).alias("__mnv"), F.max(value_col).alias("__mxv"))
    keep = (
        bucketed.join(F.broadcast(ext), [*g, "bucket"])
        .filter((t_us == F.col("__mnt")) | (t_us == F.col("__mxt"))
                | (F.col(value_col) == F.col("__mnv"))
                | (F.col(value_col) == F.col("__mxv")))
        .drop("__t0", "__t1", "__mnt", "__mxt", "__mnv", "__mxv")
    )
    return keep
