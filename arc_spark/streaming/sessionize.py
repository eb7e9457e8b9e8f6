"""Gap-based sessionization — batch and stateful-streaming forms.

The reference has no streaming engine (SURVEY §2.B "streaming-only ops:
absent"); its nearest construct is scheduled CQs. This operator is part of
the Structured Streaming superset this engine adds: assign events to
sessions that close after `gap` of user inactivity.

- :func:`sessionize` (batch): two window passes over one shuffle on the
  user key — lag() marks session starts, a running sum numbers them, then
  a hash agg per (user, session) produces the summary. The shuffle key
  matches the natural event partitioning, and the plan is fully
  SQL-expressible (the DuckDB oracle runs the identical window program).
- :func:`sessionize_stream` (streaming): ``applyInPandasWithState`` with a
  processing-time timeout — the open session lives in the state store; an
  event beyond the gap (or a timeout) emits the closed session. This is
  Spark's custom-stateful-operator surface (GroupState), the upgrade path
  the reference cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Batch sessionization: one row per (user, session).

    Output: user, session_idx (1-based per user), session_start_us,
    session_end_us, n_events, duration_us.
    """
    from arc_spark.functions.time import interval_micros

    gap_micros = interval_micros(gap)
    w = Window.partitionBy(user_col).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col))
    prev_us = F.lag(us).over(w)
    new_session = F.when(
        prev_us.isNull() | ((us - prev_us) > gap_micros), 1
    ).otherwise(0)
    numbered = df.withColumn("__new", new_session).withColumn(
        "__sess",
        F.sum("__new").over(
            Window.partitionBy(user_col)
            .orderBy(ts_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        numbered.groupBy(F.col(user_col).alias("user"), F.col("__sess").alias("session_idx"))
        .agg(
            F.unix_micros(F.min(ts_col)).alias("session_start_us"),
            F.unix_micros(F.max(ts_col)).alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn(
            "duration_us", F.col("session_end_us") - F.col("session_start_us")
        )
    )


SESSION_OUT_SCHEMA = (
    "user bigint, session_start_us bigint, session_end_us bigint, "
    "n_events bigint, duration_us bigint"
)
_STATE_SCHEMA = "start_us bigint, end_us bigint, n bigint"


def sessionize_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    timeout_ms: int = 60_000,
):
    """Streaming sessionization via applyInPandasWithState.

    State per user = the open session (start, end, count). Each micro-batch
    folds its events in event-time order; a gap larger than `gap` closes
    the current session and emits it. A processing-time timeout flushes
    sessions for users that stopped sending events entirely.

    Emitted rows are CLOSED sessions only (append semantics downstream).

    Trigger note: with ``trigger(availableNow=True)`` this query does NOT
    self-terminate — ProcessingTimeTimeout makes Spark spin no-data
    "cleaning up state" micro-batches while any group's timeout is
    pending (i.e., until `timeout_ms` has elapsed for every open
    session). Continuous triggers (the intended deployment) are
    unaffected. For drain-and-stop batch usage, use
    :func:`arc_spark.streaming.util.drain_available` (stops the query
    once a committed progress report shows ``numInputRows == 0`` with no
    data pending; open sessions stay in the checkpointed state store for
    the next run), or disable
    ``spark.sql.streaming.noDataMicroBatches.enabled`` to skip the
    timeout sweep entirely.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from arc_spark.functions.time import interval_micros

    gap_micros = interval_micros(gap)

    def fold(key, pdf_iter, state: GroupState):
        import pandas as pd

        (user,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                start, end, n = state.get
                closed.append((user, start, end, n, end - start))
                state.remove()
        else:
            rows = pd.concat(list(pdf_iter))
            rows = rows.sort_values("__ts_us")
            start, end, n = state.get if state.exists else (None, None, 0)
            for ts_us in rows["__ts_us"]:
                ts_us = int(ts_us)
                if start is None:
                    start, end, n = ts_us, ts_us, 1
                elif ts_us - end > gap_micros:
                    closed.append((user, start, end, n, end - start))
                    start, end, n = ts_us, ts_us, 1
                else:
                    end, n = max(end, ts_us), n + 1
            if start is not None:
                state.update((start, end, n))
                state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            closed,
            columns=["user", "session_start_us", "session_end_us", "n_events", "duration_us"],
        )

    prepped = events.select(
        F.col(user_col).alias("user"), F.unix_micros(F.col(ts_col)).alias("__ts_us")
    )
    return prepped.groupBy("user").applyInPandasWithState(
        fold,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
