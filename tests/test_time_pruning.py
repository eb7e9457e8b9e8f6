"""Derived partition filters (reference A2 replacement): a time predicate
must actually skip partition directories, not just filter rows."""

from __future__ import annotations

import datetime as dt

from arc_spark.plans.time_pruning import time_range
from arc_spark.sources.ingest import columnar_to_dataframe, rows_to_columnar
from arc_spark.sources.writer import write_measurement


def _write_three_days(spark, root):
    rows = []
    for day in (1, 2, 3):
        for h in (0, 6, 12, 18):
            rows.append({
                "m": "cpu",
                "t": int(dt.datetime(2024, 3, day, h).timestamp() * 1e6),
                "tags": {"host": "a"},
                "fields": {"value": float(day * 100 + h)},
            })
    df = columnar_to_dataframe(spark, rows_to_columnar(rows))
    return write_measurement(df, root, "metrics", "cpu", tag_columns=["host"])


def _scanned_files(df) -> int:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    # walk to the scan leaf and read its metrics
    import re

    s = plan.toString()
    m = re.findall(r"numFiles[^0-9]*(\d+)", s)
    if m:
        return int(m[0])
    # v2 BatchScan: count partitions via selected file partitions metric
    return -1


class TestTimePruning:
    def test_files_skipped(self, spark, tmp_path):
        out = _write_three_days(spark, str(tmp_path))
        base = spark.read.parquet(out)

        full = base.select("value")
        narrowed = time_range(
            base,
            lo=dt.datetime(2024, 3, 2, 0),
            hi=dt.datetime(2024, 3, 2, 23),
        )
        assert narrowed.count() == 4  # day 2 only

        plan = narrowed._jdf.queryExecution().executedPlan().toString()
        assert "year" in plan  # derived predicate present
        # every returned row is day 2
        assert {r["day"] for r in narrowed.select("day").distinct().collect()} == {2}

    def test_rows_exact_within_hour(self, spark, tmp_path):
        out = _write_three_days(spark, str(tmp_path))
        base = spark.read.parquet(out)
        # half-open range inside one day: partition skip is hour-coarse,
        # row filter is exact
        narrowed = time_range(
            base,
            lo=dt.datetime(2024, 3, 2, 6),
            hi=dt.datetime(2024, 3, 2, 12),
        )
        vals = sorted(r["value"] for r in narrowed.collect())
        assert vals == [206.0, 212.0]

    def test_no_partition_columns_is_row_filter_only(self, spark):
        df = spark.createDataFrame(
            [(dt.datetime(2024, 3, 1), 1.0), (dt.datetime(2024, 3, 5), 2.0)],
            "time timestamp, value double",
        )
        out = time_range(df, lo=dt.datetime(2024, 3, 4))
        assert [r["value"] for r in out.collect()] == [2.0]

    def test_partition_filter_in_plan(self, spark, tmp_path):
        out = _write_three_days(spark, str(tmp_path))
        base = spark.read.parquet(out)
        narrowed = time_range(base, lo=dt.datetime(2024, 3, 3))
        narrowed.collect()
        plan = narrowed._jdf.queryExecution().executedPlan().toString()
        # the derived predicate is consumed by the scan as a partition filter
        # (it disappears from the logical plan — fully pushed), so assert on
        # the physical scan's partition-filter list (display truncates the
        # encoded literal, so match the predicate head)
        assert "PartitionFilters: [isnotnull(year" in plan
        assert narrowed.count() == 4  # day 3 only
