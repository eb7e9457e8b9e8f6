"""arc_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Basekick-Labs/arc.

Arc (the reference, /root/reference) is a single-binary time-series /
analytical database: DuckDB SQL over hour-partitioned Parquet with a custom
ingest, compaction, retention, and continuous-query layer. This package
re-expresses that capability set Spark-first:

- measurements = Spark tables over hive-partitioned Parquet
  (``year=/month=/day=/hour=``) — Catalyst partition pruning replaces arc's
  regex path pruner (reference internal/pruning/partition_pruner.go).
- the SQL surface is Spark SQL (joins, windows, CTEs, set ops, …) —
  arc delegates the same surface to DuckDB (reference internal/api/query.go).
- ingest / compaction / retention / CQ are Spark jobs
  (reference internal/ingest, internal/compaction, internal/api/retention.go,
  internal/api/continuous_query.go).
- beyond the reference: large-scale training-data pipeline operators
  (dedup, similarity search, text analysis, multimodal plumbing).
"""

__version__ = "0.1.0"

from arc_spark.session import get_spark  # noqa: F401
from arc_spark.api import QueryService, IngestService  # noqa: F401
from arc_spark.audit import AuditLogger  # noqa: F401
from arc_spark.resilience import CircuitBreaker, Debouncer  # noqa: F401
from arc_spark.scheduler import MaintenanceScheduler  # noqa: F401
