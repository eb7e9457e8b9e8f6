"""Worker-side native thread-pool pinning.

Python workers are forked per task but REUSED across jobs, and each one
that imports numpy/pyarrow gets a native pool sized to the whole box.
With N concurrent workers that is N×N threads — measured 2.3× slower on
32 concurrent GEMM processes (per-proc p50 5.0 s vs 2.2 s pinned) and a
7× parse regression in the bulk-LP lane from pyarrow's pool.

:func:`pin_math_threads` is called at the top of every math-heavy UDF
closure. It is belt-and-braces on top of the env vars set before JVM
launch (``arc_spark.session.pin_worker_blas_threads``): env vars only
act at library load, and a reused worker may have loaded numpy under an
unpinned environment (e.g. a driver-contract run where the session was
built before our code ran), so the already-loaded OpenBLAS is re-limited
through its runtime entry point.
"""

from __future__ import annotations

import os

_PINNED_AT: int | None = None


def task_thread_budget(df) -> int:
    """Driver-side: how many native threads each task of a mapInPandas
    stage over ``df`` may use without oversubscribing.

    ``cores // tasks``: a single-split small-SF corpus gets the whole
    box for its one GEMM task; a at-scale corpus with ≥cores partitions
    gets 1 thread per task. Called on the driver (needs the SparkContext)
    and shipped as a closure constant — workers can't see their sibling
    count. ``df.rdd.getNumPartitions()`` plans but does not launch a job."""
    par = df.sparkSession.sparkContext.defaultParallelism
    n_tasks = max(1, min(df.rdd.getNumPartitions(), par))
    return max(1, par // n_tasks)


def pin_math_threads(threads: int = 1) -> None:
    """Worker-side: cap native pools at ``threads``. Best-effort,
    idempotent per value, never raises. Re-applies when a later task
    asks for a different budget (workers are reused across jobs)."""
    global _PINNED_AT
    if _PINNED_AT == threads:
        return
    _PINNED_AT = threads
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ[var] = str(threads)
    try:
        import pyarrow as pa

        pa.set_cpu_count(threads)
        pa.set_io_thread_count(threads)
    except Exception:
        pass
    # (re-)limit an ALREADY-LOADED OpenBLAS through its runtime setter —
    # env vars only act at library load time. Import numpy first so the
    # library is loaded and the runtime value sticks.
    try:
        import ctypes

        import numpy  # noqa: F401

        with open("/proc/self/maps") as f:
            maps = f.read()
        seen: set[str] = set()
        for line in maps.splitlines():
            path = line.split()[-1] if line.split() else ""
            if "openblas" in os.path.basename(path).lower() and path not in seen:
                seen.add(path)
                try:
                    lib = ctypes.CDLL(path)  # same handle: already loaded
                    for sym in ("openblas_set_num_threads",
                                "openblas_set_num_threads64_"):
                        fn = getattr(lib, sym, None)
                        if fn is not None:
                            fn(threads)
                except OSError:
                    pass
    except Exception:
        pass
