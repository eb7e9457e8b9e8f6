"""Full driver-board emulation: run the 50-lane board the way the driver
does (vanilla SparkSession, queries() vs oracle_sql() via DuckDB at sf0.01)
and print a per-lane JSON verdict.

Usage: python scripts/emulate_driver.py [sf_dir] [lane ...]
  (no lanes given = the whole DRIVER_BOARD)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as e
    from arc_spark.workload import DRIVER_BOARD
    from tests._oracle import compare

    lanes = sys.argv[2:] or list(DRIVER_BOARD)

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    qs, oracles = e.queries(), e.oracle_sql()

    # driver smoke: entry() runs and returns rows
    n = len(e.entry(spark).collect())
    print(f"entry(): {n} rows", file=sys.stderr)

    results: dict[str, dict] = {}
    failures = 0
    for name in lanes:
        t0 = time.monotonic()
        try:
            df = qs[name](spark, sf_dir)
            ok, msg = compare(df, oracles[name], sf_dir)
        except Exception as exc:  # noqa: BLE001 — emulation must report, not die
            ok, msg = False, f"{type(exc).__name__}: {exc}"
        dt = time.monotonic() - t0
        results[name] = {"ok": ok, "msg": msg, "sec": round(dt, 2)}
        if not ok:
            failures += 1
        print(f"{'PASS' if ok else 'FAIL'} {name} ({dt:.2f}s) {'' if ok else msg}",
              file=sys.stderr)

    print(json.dumps({"failures": failures, "lanes": results}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
