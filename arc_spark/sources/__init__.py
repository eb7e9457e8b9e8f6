"""Ingestion sources and the partitioned-Parquet measurement writer."""

from arc_spark.sources.line_protocol import parse_line, parse_batch, lines_to_dataframe  # noqa: F401
from arc_spark.sources.ingest import (  # noqa: F401
    normalize_epoch_us,
    columnar_to_dataframe,
    rows_to_columnar,
)
from arc_spark.sources.writer import write_measurement, read_manifest  # noqa: F401
