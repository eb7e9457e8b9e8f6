"""Derived partition filters from time predicates.

Reference: A2 partition pruner (/root/reference/internal/pruning/
partition_pruner.go:448-676) — 1205 lines of regex time-range extraction and
path-list generation. The Spark translation is one derived predicate:
measurements are stored hive-partitioned as ``year=/month=/day=/hour=``
(sources/writer.py), so a ``time`` range maps to an arithmetic predicate
over the partition columns, which Catalyst evaluates against partition
values at file-listing time — no data files outside the range are opened,
exactly like the reference's path generation but without any path math.

The partition tuple is encoded as ``((year*100+month)*100+day)*100+hour``,
a single monotonic long; range bounds floor/ceil to the containing hour.
The original row-level ``time`` predicate stays in place — partition
pruning is a coarse file skip, the row filter is exact.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PARTITION_COLS = ("year", "month", "day", "hour")


def _encode(t: dt.datetime) -> int:
    return ((t.year * 100 + t.month) * 100 + t.day) * 100 + t.hour


def _encoded_col() -> Column:
    y, m, d, h = (F.col(c) for c in PARTITION_COLS)
    return ((y * 100 + m) * 100 + d) * 100 + h


def derived_partition_predicate(
    lo: dt.datetime | None = None, hi: dt.datetime | None = None
) -> Column | None:
    """Partition-column predicate equivalent to ``lo <= time <= hi``
    (hour-granular: bounds widen to the containing hour)."""
    enc = _encoded_col()
    pred: Column | None = None
    if lo is not None:
        pred = enc >= _encode(lo)
    if hi is not None:
        p2 = enc <= _encode(hi)
        pred = p2 if pred is None else (pred & p2)
    return pred


def time_range(
    df: DataFrame,
    lo: dt.datetime | None = None,
    hi: dt.datetime | None = None,
    time_col: str = "time",
) -> DataFrame:
    """Exact time-range filter + derived partition skip.

    Use on any DataFrame read from a measurement path (which carries the
    year/month/day/hour partition columns). Rows are filtered exactly on
    ``time_col``; files are skipped coarsely via the partition predicate.
    A DataFrame without the partition columns just gets the row filter.
    """
    out = df
    if lo is not None:
        out = out.filter(F.col(time_col) >= F.lit(lo))
    if hi is not None:
        out = out.filter(F.col(time_col) <= F.lit(hi))
    if all(c in df.columns for c in PARTITION_COLS):
        pred = derived_partition_predicate(lo, hi)
        if pred is not None:
            out = out.filter(pred)
    return out
