"""Dataset profiling: one-pass per-column statistics in long format.

The first step of any large-scale training-data pipeline is knowing
what's in the corpus — null rates, cardinalities, value ranges, text
length distribution — before any dedup/filter/mixture decision. The
reference exposes this ad hoc through SQL; this operator packages the
one-pass shape so 100 TB profiling stays a SINGLE aggregation:

- every statistic for every column computes in ONE ``df.agg`` (map-side
  partial aggregation, one shuffle of one row per partition);
- the wide 1-row result pivots to long format PLAN-SIDE (array of
  structs + explode over a single row — no driver round trip, no second
  job);
- exact ``COUNT(DISTINCT)`` expands the input once per distinct-agg
  (Spark's Expand), which is fine at profile-query scale; at 100 TB pass
  ``exact_distinct=False`` for HyperLogLog ``approx_count_distinct`` —
  no Expand, same single pass (the oracle lane pins the exact variant,
  whose semantics DuckDB can mirror).

Float stats are rounded to ``digits`` on BOTH the Spark and oracle
sides (the repo-wide float-hash discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def profile_dataset(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
    digits: int = 6,
) -> DataFrame:
    """Per-column profile of ``df`` → long-format DataFrame with one row
    per column: ``col_name, n_rows, n_nulls, n_distinct, min_num,
    max_num, mean_num, avg_len`` (numeric stats NULL for non-numeric
    columns; ``avg_len`` NULL for non-strings)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns if columns is not None else list(fields)
    missing = [c for c in cols if c not in fields]
    if missing:
        raise ValueError(f"unknown columns: {missing}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        if exact_distinct:
            aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
        else:
            aggs.append(
                F.approx_count_distinct(F.col(c)).alias(f"__nd_{c}"))
        if isinstance(fields[c], _NUMERIC):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__mn_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__mx_{c}"))
            # explicit double: avg over DecimalType yields decimal(p,6),
            # and an all-decimal column list would then type the output
            # column decimal instead of the documented double
            aggs.append(F.round(F.avg(F.col(c)), digits).cast("double")
                        .alias(f"__av_{c}"))
        if isinstance(fields[c], T.StringType):
            aggs.append(F.round(F.avg(F.length(F.col(c))), digits)
                        .cast("double").alias(f"__al_{c}"))
    wide = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    structs = []
    for c in cols:
        structs.append(F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
            F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
            (F.col(f"__mn_{c}") if isinstance(fields[c], _NUMERIC)
             else null_d).alias("min_num"),
            (F.col(f"__mx_{c}") if isinstance(fields[c], _NUMERIC)
             else null_d).alias("max_num"),
            (F.col(f"__av_{c}") if isinstance(fields[c], _NUMERIC)
             else null_d).alias("mean_num"),
            (F.col(f"__al_{c}") if isinstance(fields[c], T.StringType)
             else null_d).alias("avg_len"),
        ))
    return (wide
            .select(F.explode(F.array(*structs)).alias("p"))
            .select("p.*"))
