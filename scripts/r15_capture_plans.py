#!/usr/bin/env python
"""Capture .explain("formatted") for every bench-lane query into
plans/r15/<query>_<tag>.txt (tag = before/after, argv[1]).

Usage: python scripts/r15_capture_plans.py [before|after] [lane ...]
Lanes default to bench.BENCH_QUERIES. Plans are captured on the tuned
session (the one bench.py uses) at $SPARK_GRAFT_SF_DIR (default sf0.1) —
the plan the bench actually executes.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

tag = sys.argv[1] if len(sys.argv) > 1 else "before"
lanes = sys.argv[2:]

from bench import BENCH_QUERIES  # noqa: E402
from arc_spark.session import get_spark  # noqa: E402
from arc_spark.workload import QUERIES  # noqa: E402
from arc_spark import cacheutil  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "plans", "r15")
os.makedirs(out_dir, exist_ok=True)

spark = get_spark(app_name="r15-capture-plans")
for name in (lanes or BENCH_QUERIES):
    cacheutil.clear_registry()
    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(out_dir, f"{name}_{tag}.txt")
    with open(path, "w") as fh:
        fh.write(buf.getvalue())
    print(f"wrote {path} ({len(buf.getvalue())} chars)")
spark.stop()
