from arc_spark.streaming.cq import ContinuousQuery, CQScheduler  # noqa: F401
