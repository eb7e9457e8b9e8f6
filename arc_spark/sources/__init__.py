"""Ingestion sources and the partitioned-Parquet measurement writer."""

from arc_spark.sources.line_protocol import parse_line, parse_batch, lines_to_dataframe  # noqa: F401
from arc_spark.sources.ingest import (  # noqa: F401
    normalize_epoch_us,
    columnar_to_dataframe,
    rows_to_columnar,
)
from arc_spark.sources.writer import write_measurement, read_manifest  # noqa: F401
from arc_spark.sources.tle import parse_tle, tle_to_df, tle_files_to_df  # noqa: F401
from arc_spark.sources.bulk_import import import_csv, import_parquet, import_result  # noqa: F401
from arc_spark.sources.wal import Wal  # noqa: F401
from arc_spark.sources.mqtt import MqttSubscription, MqttIngestBridge  # noqa: F401
