"""CSV / Parquet bulk import (reference A30,
/root/reference/internal/api/import_inprocess.go:35-1166).

Spark-first: ``spark.read.csv(inferSchema)`` / ``read.parquet`` replace the
reference's hand-rolled per-column type inference, and the time-column
coercion is a pure Catalyst expression — magnitude-based epoch unit
auto-detection (s/ms/µs/ns → µs, thresholds identical to
import_inprocess.go:770-784 autoEpochToMicros and
internal/ingest/msgpack.go:435-505) plus string-timestamp parsing, all
JVM-side and vectorized. No driver loop: a 10 TB CSV import is just a
distributed scan + projection + partitioned write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class ImportError_(ValueError):
    pass


_EPOCH_DIV = {"epoch_s": 1e-6, "epoch_ms": 1e-3, "epoch_us": 1.0, "epoch_ns": 1e3}


def _auto_numeric_to_us(c: Column) -> Column:
    """Magnitude-detected epoch → µs (abs thresholds 1e10 / 1e13 / 1e16)."""
    a = F.abs(c)
    return (
        F.when(a < 1e10, (c * 1_000_000).cast("long"))
        .when(a < 1e13, (c * 1_000).cast("long"))
        .when(a < 1e16, c.cast("long"))
        .otherwise((c / 1_000).cast("long"))
    )


def time_to_micros(c: Column, time_format: str = "") -> Column:
    """Any supported time representation → epoch-µs long.

    - explicit ``epoch_s|epoch_ms|epoch_us|epoch_ns``: exact integer math for
      integral values (no float precision loss on large ns epochs), float
      math for fractional;
    - ``""`` (auto): numeric → magnitude detection; strings → numeric if they
      parse, else timestamp-string layouts (ISO 8601 / 'YYYY-MM-DD HH:MM:SS'
      / date-only), assumed UTC when zone-less.
    """
    if time_format:
        if time_format not in _EPOCH_DIV:
            raise ImportError_(
                f"unsupported time_format {time_format!r} "
                "(want epoch_s|epoch_ms|epoch_us|epoch_ns or empty for auto)"
            )
        s = F.trim(c.cast("string"))
        as_long = s.try_cast("long")
        as_double = s.try_cast("double")
        mul = {"epoch_s": 1_000_000, "epoch_ms": 1_000, "epoch_us": 1, "epoch_ns": 1}[time_format]
        int_path = (
            (as_long * mul).cast("long") if time_format != "epoch_ns"
            else (as_long / 1_000).cast("long")
        )
        f = 1.0 / _EPOCH_DIV[time_format]
        float_path = (as_double * f).cast("long")
        return F.when(~s.contains(".") & as_long.isNotNull(), int_path).otherwise(float_path)

    s = F.trim(c.cast("string"))
    as_long = s.try_cast("long")
    as_double = s.try_cast("double")
    as_ts = F.coalesce(
        F.try_to_timestamp(s),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd")),
    )
    return (
        F.when(~s.contains(".") & as_long.isNotNull(), _auto_numeric_to_us(as_long))
        .when(as_double.isNotNull(), _auto_numeric_to_us(as_double))
        .otherwise(F.unix_micros(as_ts))
    )


def _coerce_time(df: DataFrame, time_column: str, time_format: str) -> DataFrame:
    """Rename + coerce the time column to a µs TimestampType 'time' column
    (Arc's only accepted at-rest representation, SURVEY §1.2)."""
    if time_column not in df.columns:
        raise ImportError_(
            f"time column {time_column!r} not found; available: {', '.join(df.columns)}"
        )
    if time_column != "time" and "time" in df.columns:
        raise ImportError_(
            f'cannot rename time column {time_column!r} to "time": '
            'a column named "time" already exists'
        )
    dtype = dict(df.dtypes)[time_column]
    src = F.col(time_column)
    if dtype.startswith("timestamp"):
        us = F.unix_micros(src.cast("timestamp"))
    elif dtype in ("date",):
        us = F.unix_micros(src.cast("timestamp"))
    else:
        us = time_to_micros(src, time_format)
    out = df.withColumn("__time_us", us)
    if time_column != "time":
        out = out.drop(time_column)
    else:
        out = out.drop("time")
    return out.withColumn("time", F.timestamp_micros(F.col("__time_us"))).drop("__time_us")


def import_result(df: DataFrame) -> dict:
    """Import summary (reference buildImportResult,
    import_inprocess.go:499-533): row count, columns, time range."""
    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.unix_micros(F.min("time")).alias("tmin"),
        F.unix_micros(F.max("time")).alias("tmax"),
    ).collect()[0]
    return {
        "rows_imported": stats["n"],
        "columns": df.columns,
        "time_range_min_us": stats["tmin"],
        "time_range_max_us": stats["tmax"],
    }


def import_csv(
    spark: SparkSession,
    path: str,
    time_column: str = "time",
    time_format: str = "",
    delimiter: str = ",",
    header: bool = True,
) -> DataFrame:
    """CSV import: schema inference + time coercion. The returned DataFrame
    is the ingest shape — hand it to sources.writer.write_measurement."""
    df = (
        spark.read.option("header", header)
        .option("inferSchema", True)
        .option("sep", delimiter)
        .csv(path)
    )
    return _coerce_time(df, time_column, time_format)


def import_parquet(
    spark: SparkSession,
    path: str,
    time_column: str = "time",
    time_format: str = "",
) -> DataFrame:
    """Parquet import with the same time normalization."""
    from arc_spark.catalog import read_parquet_normalized

    df = read_parquet_normalized(spark, path)
    return _coerce_time(df, time_column, time_format)
