"""CLI driver — the reference's operational scripts/DAG triggers
(`scripts/run_*.sh`, Airflow manual runs) as one command surface:

    python -m etl_warehouse_agnostic_ray bootstrap --lake /data/lake --pages pages.parquet
    python -m etl_warehouse_agnostic_ray apply     --lake /data/lake --stream change_events/
    python -m etl_warehouse_agnostic_ray drain     --lake /data/lake --stream change_events/
    python -m etl_warehouse_agnostic_ray drain     --lake /data/lake --stream change_events/ --mode delta
    python -m etl_warehouse_agnostic_ray lookup    --lake /data/lake --url https://a.example/x
    python -m etl_warehouse_agnostic_ray compact   --lake /data/lake
    python -m etl_warehouse_agnostic_ray validate  --lake /data/lake
    python -m etl_warehouse_agnostic_ray stats     --lake /data/lake
    python -m etl_warehouse_agnostic_ray vacuum    --lake /data/lake --keep 2

Each command prints ONE JSON line (machine-parsable, like bench.py).
This owns a Ray session (scripts do; library code never does).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="etl_warehouse_agnostic_ray")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init num_cpus (default: let Ray decide)")
    sub = p.add_subparsers(dest="cmd", required=True)

    def lake_cmd(name, help_):
        c = sub.add_parser(name, help=help_)
        c.add_argument("--lake", required=True, help="lake root directory")
        c.add_argument("--partitions", type=int, default=32)
        return c

    c = lake_cmd("bootstrap", "load the initial snapshot as version 0")
    c.add_argument("--pages", required=True, help="snapshot parquet path")
    c.add_argument("--batch-id", default="bootstrap")

    c = lake_cmd("apply", "apply one change-event batch")
    c.add_argument("--stream", required=True, help="events parquet file/dir")
    c.add_argument("--batch-id", default=None)
    c.add_argument("--mode", choices=("cow", "delta", "auto"), default="cow",
                   help="delta = merge-on-read side files (O(delta) writes); "
                        "auto = delta when the batch is small vs the table")

    c = lake_cmd("drain", "consume a WAL dir in LSN-ordered micro-batches")
    c.add_argument("--stream", required=True)
    c.add_argument("--max-files", type=int, default=8)
    c.add_argument("--mode", choices=("cow", "delta", "auto"), default="cow")

    c = lake_cmd("lookup", "point-read the live row for one url")
    c.add_argument("--url", required=True)

    lake_cmd("compact", "rewrite stale-schema-epoch partitions")
    c = lake_cmd("validate", "post-load integrity report")
    c.add_argument("--fresh-after-us", type=int, default=None)
    lake_cmd("stats", "manifest partition-health rollup")
    c = lake_cmd("history", "per-version commit log (lineage + metrics)")
    c.add_argument("--limit", type=int, default=20)
    c = lake_cmd("vacuum", "GC unreferenced data files")
    c.add_argument("--keep", type=int, default=2)
    return p


def run(args) -> dict:
    from .pipelines.cdc import CDCEngine

    eng = CDCEngine(args.lake, num_partitions=args.partitions)
    if args.cmd == "bootstrap":
        m = eng.bootstrap(args.pages, batch_id=args.batch_id)
        return {"cmd": "bootstrap", "version": m["version"],
                "rows": m["stats"].get("rows")}
    if args.cmd == "apply":
        return {"cmd": "apply",
                **eng.apply(args.stream, batch_id=args.batch_id, mode=args.mode)}
    if args.cmd == "lookup":
        t = eng.lake.lookup(args.url)
        row = t.to_pylist()[0] if t.num_rows else None
        if row is not None:
            row.pop("html", None)  # binary payload stays out of the JSON line
        return {"cmd": "lookup", "url": args.url, "found": t.num_rows > 0, "row": row}
    if args.cmd == "drain":
        reports = eng.apply_stream(
            args.stream, max_files_per_batch=args.max_files, mode=args.mode
        )
        applied = sum(r.get("events_applied", 0) for r in reports)
        return {"cmd": "drain", "batches": len(reports), "events_applied": applied,
                "applied_lsn": eng.lake.load_manifest()["applied_lsn"]}
    if args.cmd == "compact":
        return {"cmd": "compact", **eng.compact()}
    if args.cmd == "validate":
        return {"cmd": "validate",
                **eng.validate(fresh_after_us=args.fresh_after_us)}
    if args.cmd == "stats":
        return {"cmd": "stats", **eng.lake.stats()}
    if args.cmd == "history":
        return {"cmd": "history", "versions": eng.history(limit=args.limit)}
    if args.cmd == "vacuum":
        removed = eng.lake.vacuum(keep_versions=args.keep)
        return {"cmd": "vacuum", "removed": len(removed)}
    raise SystemExit(f"unknown command {args.cmd}")


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    import ray

    started = False
    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)
        started = True
    try:
        report = run(args)
        print(json.dumps(report, default=str))
    except RuntimeError as e:
        # operational failures (commit conflict, routing-hash mismatch,
        # un-bootstrapped lake) must be scriptable: JSON on stdout,
        # non-zero exit
        print(json.dumps({"cmd": args.cmd, "error": str(e)}))
        return 2
    finally:
        if started:  # only shut down a session this process owns
            ray.shutdown()
    # health gates script on the exit status: validate failure -> rc 1
    if args.cmd == "validate" and not report.get("passed", True):
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
