"""Process entrypoint: ``python -m arc_spark serve [-c arc.toml]``.

Reference: cmd/arc/main.go (config → wired server → signal-driven
graceful shutdown, internal/shutdown/). The serve loop blocks until
SIGTERM/SIGINT, then tears down in order: HTTP listener → scheduler →
ingest drain (flush + WAL seal) → audit writer.

Other subcommands:
- ``check-config [-c arc.toml]`` — load + validate, print the effective
  config as JSON (the reference's config validation path).
"""

from __future__ import annotations

import argparse
import json
import signal
import sys
import threading


def _serve(args) -> int:
    from arc_spark.config import build_engine, load_config, shutdown

    # handlers FIRST: a SIGTERM during (or right after) boot must take the
    # graceful path, not the default kill
    done = threading.Event()

    def _on_signal(signum, frame):
        print(f"signal {signum}: shutting down", flush=True)
        done.set()

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)

    cfg = load_config(args.config)
    mt = cfg["maintenance"]
    if mt["cleanup_spark_temp_on_boot"]:
        # crashed-run temp sweep BEFORE the session boots (the reference
        # sweeps DuckDB spill files before opening the database)
        from arc_spark.session import cleanup_orphaned_spark_temp

        swept = cleanup_orphaned_spark_temp(
            min_age_s=mt["spark_temp_max_age_hours"] * 3600)
        if swept:
            print(f"swept {swept} orphaned Spark temp dirs", flush=True)
    engine = build_engine(cfg)
    server = engine["server"]

    # WAL crash recovery before traffic is expected (reference boots
    # recovery before marking ready)
    ingest = engine["ingest"]
    if ingest is not None and ingest.wal is not None:
        recovered = ingest.recover()
        if recovered:
            print(f"recovered {recovered} rows from WAL", flush=True)
    engine["scheduler"].start()
    server.start()
    scheme = "https" if server.tls else "http"
    print(f"arc_spark serving on {scheme}://{cfg['server']['host']}:"
          f"{server.port} (root={cfg['storage']['local_path']})", flush=True)
    done.wait()
    shutdown(engine)
    print("shutdown complete", flush=True)
    return 0


def _check_config(args) -> int:
    from arc_spark.config import load_config, parse_decimal_columns, parse_sort_keys

    cfg = load_config(args.config)
    parse_decimal_columns(cfg["ingest"]["decimal_columns"])  # validate
    parse_sort_keys(cfg["ingest"]["sort_keys"])
    # never print credentials (the reference redacts secrets from config
    # dumps for the same reason)
    redacted = json.loads(json.dumps(cfg, default=str))
    for section in redacted.values():
        if isinstance(section, dict):
            for k in section:
                if ("secret" in k or "token" in k) and section[k]:
                    section[k] = "***"
    json.dump(redacted, sys.stdout, indent=2)
    print()
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m arc_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, fn in (("serve", _serve), ("check-config", _check_config)):
        p = sub.add_parser(name)
        p.add_argument("-c", "--config", default=None,
                       help="path to arc.toml-equivalent config file")
        p.set_defaults(fn=fn)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
