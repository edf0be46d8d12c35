"""Command-line interface: ``python -m table_versions_spark <cmd> ...``.

The reference ships only a stub CLI that prints "TO DO!"
(``cli/src/main/scala/com/gu/tableversions/cli/TableVersions.scala:9-12``);
this one actually works. Metadata-only commands (tables/history/current/
checkout/vacuum) never start Spark — they read the transaction log directly,
so they are instant even when a JVM spin-up would take seconds. ``show`` and
``compact`` need Spark and create a local session on demand.

    python -m table_versions_spark tables    --warehouse /wh
    python -m table_versions_spark history   --warehouse /wh db.events
    python -m table_versions_spark current   --warehouse /wh db.events
    python -m table_versions_spark checkout  --warehouse /wh db.events <commit>
    python -m table_versions_spark clone     --warehouse /wh db.events db.events_branch
    python -m table_versions_spark rename-column --warehouse /wh db.events value amount
    python -m table_versions_spark drop-column   --warehouse /wh db.events scratch_col
    python -m table_versions_spark vacuum    --warehouse /wh db.events --keep 3
    python -m table_versions_spark show      --warehouse /wh db.events -n 10
    python -m table_versions_spark compact   --warehouse /wh db.events
"""

from __future__ import annotations

import argparse
import os
import sys


def _tables(warehouse: str) -> list[str]:
    out = []
    if not os.path.isdir(warehouse):
        return out
    for schema in sorted(os.listdir(warehouse)):
        sdir = os.path.join(warehouse, schema)
        if not os.path.isdir(sdir):
            continue
        for name in sorted(os.listdir(sdir)):
            if os.path.exists(os.path.join(sdir, name, "_meta.json")):
                out.append(f"{schema}.{name}")
    return out


def _log_for(warehouse: str, table: str):
    from .core.log import FileTableVersions, read_table_meta
    from .core.model import TableName

    tn = TableName.parse(table)
    location = os.path.join(warehouse, tn.schema, tn.name)
    return read_table_meta(location), FileTableVersions(location)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="table_versions_spark")
    p.add_argument("--warehouse", "-w", required=True,
                   help="warehouse root directory")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("tables", help="list versioned tables")
    for cmd, extra in [("history", []), ("current", []),
                       ("checkout", ["commit_id"]), ("clone", ["dest"]),
                       ("restore", ["commit_id"]),
                       ("rename-column", ["old", "new"]),
                       ("drop-column", ["column"]),
                       ("vacuum", []), ("show", []), ("compact", []),
                       ("stats", [])]:
        sp = sub.add_parser(cmd)
        sp.add_argument("table", help="schema.table")
        for a in extra:
            sp.add_argument(a)
        if cmd == "vacuum":
            sp.add_argument("--keep", type=int, default=3,
                            help="commits whose versions to retain")
            sp.add_argument("--grace-hours", type=float, default=1.0,
                            help="never delete version dirs younger than "
                                 "this (in-flight write protection)")
        if cmd == "show":
            sp.add_argument("-n", type=int, default=20, help="rows to print")
    args = p.parse_args(argv)

    if args.cmd == "tables":
        for t in _tables(args.warehouse):
            print(t)
        return 0

    if args.cmd == "history":
        defn, log = _log_for(args.warehouse, args.table)
        for m in log.updates(defn.name):
            print(f"{m.commit_id}  {m.timestamp}  {m.user_id:12s}  {m.message}")
        return 0

    if args.cmd == "current":
        from .core.model import SnapshotTableVersion

        defn, log = _log_for(args.warehouse, args.table)
        state = log.current_version(defn.name)
        ptr, _ = log._read_pointer()
        print(f"commit: {ptr}")
        if isinstance(state, SnapshotTableVersion):
            print(f"snapshot version: {state.version.label}")
        else:
            for part, v in sorted(state.partition_versions.items()):
                print(f"{part.render()}  ->  {v.label}")
        return 0

    if args.cmd == "checkout":
        defn, log = _log_for(args.warehouse, args.table)
        log.set_current_version(defn.name, args.commit_id)
        print(f"checked out {args.commit_id}")
        return 0

    if args.cmd == "restore":
        from .engine import VersionedEngine

        # restore is a metadata-only forward commit; no Spark session needed
        eng = VersionedEngine(None, args.warehouse)
        res = eng.restore(args.table, args.commit_id,
                          user_id=os.environ.get("USER", "cli"))
        print(f"restored {args.table} to {args.commit_id} "
              f"as commit {res.commit_id}")
        return 0

    if args.cmd == "clone":
        from .engine import VersionedEngine

        # shallow clone is metadata + hardlinks only; no Spark session needed
        eng = VersionedEngine(None, args.warehouse)
        res = eng.clone_table(args.table, args.dest,
                              user_id=os.environ.get("USER", "cli"))
        print(f"cloned {args.table} -> {args.dest} as commit {res.commit_id}")
        return 0

    if args.cmd == "rename-column":
        from .engine import VersionedEngine

        # metadata-only column mapping; no Spark session needed
        VersionedEngine(None, args.warehouse).rename_column(
            args.table, args.old, args.new)
        print(f"renamed {args.table}.{args.old} -> {args.new}")
        return 0

    if args.cmd == "drop-column":
        from .engine import VersionedEngine

        VersionedEngine(None, args.warehouse).drop_column(
            args.table, args.column)
        print(f"dropped {args.table}.{args.column}")
        return 0

    if args.cmd == "vacuum":
        from .engine import VersionedEngine

        # vacuum is metadata+filesystem only; no Spark session needed
        eng = VersionedEngine(None, args.warehouse)
        removed = eng.vacuum(args.table, keep_commits=args.keep,
                             grace_hours=args.grace_hours)
        for r in removed:
            print(f"removed {r}")
        print(f"{len(removed)} version dir(s) removed")
        return 0

    if args.cmd == "stats":
        import json

        from .engine import VersionedEngine

        # ANALYZE from the commit log's per-version stats payloads —
        # zero data I/O, no Spark session needed
        stats = VersionedEngine(None, args.warehouse).table_stats(args.table)
        print(json.dumps(stats, indent=1, default=str, sort_keys=True))
        return 0

    if args.cmd in ("show", "compact"):
        from .engine import VersionedEngine
        from .session import get_spark

        eng = VersionedEngine(get_spark(app_name=f"tvx-{args.cmd}"),
                              args.warehouse)
        if args.cmd == "show":
            eng.read(args.table).show(args.n, truncate=False)
        else:
            res = eng.compact(args.table)
            print(f"compacted as commit {res.commit_id}")
        return 0

    return 2  # pragma: no cover


if __name__ == "__main__":
    raise SystemExit(main())
