"""DuckDB-as-oracle differential harness (SURVEY.md §5 test strategy).

Runs a Spark DataFrame and a DuckDB SQL string over the same parquet tables
and compares results order-insensitively — mirroring the driver's t2 gate:
row count, column names, and values (floats exact after the workload's own
determinism rules; a tiny epsilon tolerated for diagnostics).
"""

from __future__ import annotations

import math

import duckdb

from arc_spark.catalog import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    return v


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in data:
        out.append(tuple(_normalize_cell(row[i]) for i in order))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare(spark_df, oracle_sql: str, sf_dir: str, float_rel_tol: float = 1e-9):
    """Return (ok, message). Exact match expected; floats compared with a
    small relative tolerance so a failure message distinguishes 'fp noise'
    from 'wrong answer'."""
    con = duck_connection(sf_dir)
    cur = con.execute(oracle_sql)
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()

    spark_rows_raw = spark_df.collect()
    spark_cols = spark_df.columns

    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows_raw) != len(duck_rows):
        return False, f"row count mismatch: spark={len(spark_rows_raw)} duck={len(duck_rows)}"

    s = _rows(spark_cols, [tuple(r) for r in spark_rows_raw])
    d = _rows(duck_cols, duck_rows)
    for i, (sr, dr) in enumerate(zip(s, d)):
        for a, b in zip(sr, dr):
            if a == b:
                continue
            if (
                isinstance(a, float)
                and isinstance(b, float)
                and math.isclose(a, b, rel_tol=float_rel_tol, abs_tol=1e-12)
            ):
                continue
            return False, f"value mismatch at sorted-row {i}: spark={sr} duck={dr}"
    return True, "ok"
