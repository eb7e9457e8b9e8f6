"""Vector math over `array<float|double>` embedding columns.

All pure Catalyst higher-order functions (`zip_with` + `aggregate`): the dot
product folds left-to-right over the array, so the floating-point result is
deterministic for a given row — a requirement for oracle comparison and for
reproducible top-k at scale. No Python UDFs: these run inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    v = _d(a)
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column | str, b: Column | str, digits: int | None = None) -> Column:
    """Cosine similarity in double precision; optionally rounded.

    Rounding (digits=4 in the workload queries) absorbs the ~1e-13
    accumulation-order noise between engines so ranking comparisons are
    stable.
    """
    sim = dot(a, b) / (l2_norm(a) * l2_norm(b))
    return F.round(sim, digits) if digits is not None else sim
