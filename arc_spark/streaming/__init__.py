from arc_spark.streaming.cq import ContinuousQuery, CQScheduler  # noqa: F401
from arc_spark.streaming.sessionize import sessionize, sessionize_stream  # noqa: F401
