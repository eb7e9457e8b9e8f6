"""As-of join (time-series point-in-time join).

Spark has no built-in ASOF JOIN (DuckDB does — the oracle uses it). The
naive implementation (inequality join + row_number) degenerates to a
per-key cartesian product. This one uses the *merge* formulation:

    union(left tagged, right tagged)
      → window: last right-row value ≤ current ts, per key
      → keep left rows

which is a single shuffle on the key column and a linear sorted pass within
each partition — the same plan a hand-written merge-asof would produce, and
it survives 100× scale because no pair blow-up exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    inclusive: bool = True,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_ts <= left_ts (or < when inclusive=False), matching on `on`.

    Returns all left columns plus the selected right columns renamed with
    `suffix`. Right rows with equal timestamps: latest-sorted wins (ties are
    broken by the right's natural column order — pass pre-deduped rights for
    strict semantics).
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    # tag: right rows sort BEFORE left rows at equal ts when inclusive
    l_tag, r_tag = (1, 0) if inclusive else (0, 1)
    rsel = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(r_tag).alias("__side"),
        F.struct(*[F.col(c) for c in [right_ts] + right_cols]).alias("__rv"),
    )
    lsel = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(l_tag).alias("__side"),
        F.lit(None).cast(rsel.schema["__rv"].dataType).alias("__rv"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lv"),
    )
    merged = lsel.unionByName(rsel.withColumn("__lv", F.lit(None).cast(lsel.schema["__lv"].dataType)))

    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn("__match", F.last("__rv", ignorenulls=True).over(w))
    out = carried.filter(F.col("__lv").isNotNull()).select(
        *[F.col(f"__lv.{c}").alias(c) for c in left.columns],
        F.col(f"__match.{right_ts}").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out
