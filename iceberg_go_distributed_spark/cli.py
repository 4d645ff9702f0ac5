"""`python -m iceberg_go_distributed_spark` — the reference CLI's
command set (cmd/iceberg/main.go:39-93): list / describe / schema /
spec / uuid / location / create / drop / files / rename /
properties get|set|remove, against an fs, sql, rest, or glue catalog
(the reference's --catalog switch, main.go:169-199; rest takes --uri
and --credential, glue reads region/credentials from glue.* env-style
properties passed as --prop k=v)."""

from __future__ import annotations

import argparse
import json
import sys


def _catalog(args):
    from .iceberg.catalog import load_catalog

    if args.catalog == "sql":
        return load_catalog("sql", db_path=args.db, warehouse=args.warehouse)
    if args.catalog == "rest":
        if not args.uri:
            raise SystemExit("--catalog rest requires --uri")
        kwargs = {"uri": args.uri}
        if args.credential:
            kwargs["credential"] = args.credential
        return load_catalog("rest", **kwargs)
    if args.catalog == "glue":
        props = dict(kv.split("=", 1) for kv in (args.prop or []))
        return load_catalog(
            "glue", warehouse=args.warehouse, properties=props
        )
    return load_catalog("fs", warehouse=args.warehouse)


def _print(obj) -> None:
    print(json.dumps(obj, indent=2, default=str))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="iceberg", description=__doc__)
    p.add_argument("--warehouse", default="./warehouse")
    p.add_argument("--catalog", choices=("fs", "sql", "rest", "glue"), default="fs")
    p.add_argument("--db", default="./catalog.db", help="sqlite path for --catalog sql")
    p.add_argument("--uri", help="REST catalog endpoint for --catalog rest")
    p.add_argument("--credential", help="client_id:client_secret for --catalog rest")
    p.add_argument(
        "--prop",
        action="append",
        metavar="K=V",
        help="catalog property (repeatable); glue.* keys configure --catalog glue",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("list", help="list namespaces or tables")
    sp.add_argument("namespace", nargs="?")

    for name in ("describe", "schema", "spec", "uuid", "location", "files", "history", "snapshots"):
        sp = sub.add_parser(name)
        sp.add_argument("table")

    sp = sub.add_parser("create")
    sp.add_argument("table")
    sp.add_argument("--schema-json", required=True, help="Iceberg schema JSON")
    sp.add_argument("--partition-spec", default=None, help='e.g. "col:day,col2:bucket[8]"')

    sp = sub.add_parser("drop")
    sp.add_argument("table")

    sp = sub.add_parser("rename")
    sp.add_argument("src")
    sp.add_argument("dst")

    sp = sub.add_parser("properties")
    sp.add_argument("action", choices=("get", "set", "remove"))
    sp.add_argument("table")
    sp.add_argument("key", nargs="?")
    sp.add_argument("value", nargs="?")

    sp = sub.add_parser("upgrade", help="upgrade the table's format version")
    sp.add_argument("table")
    sp.add_argument("--format-version", type=int, default=3)

    sp = sub.add_parser(
        "register", help="register an existing table from its metadata file"
    )
    sp.add_argument("table")
    sp.add_argument("metadata_location")

    sp = sub.add_parser("expire", help="expire old snapshots (metadata-only)")
    sp.add_argument("table")
    sp.add_argument("--retain-last", type=int, default=1)
    sp.add_argument(
        "--older-than-ms", type=int, default=None,
        help="absolute timestamp cutoff; snapshots newer than it survive",
    )

    sp = sub.add_parser(
        "rollback", help="move main back to an ancestor snapshot"
    )
    sp.add_argument("table")
    sp.add_argument("snapshot_id", type=int)

    sp = sub.add_parser(
        "cherry-pick",
        help="reapply a staged append snapshot onto the current main head",
    )
    sp.add_argument("table")
    sp.add_argument("snapshot_id", type=int)

    sp = sub.add_parser(
        "orphans", help="list/delete files unreachable from any snapshot"
    )
    sp.add_argument("table")
    sp.add_argument("--delete", action="store_true", help="actually delete")
    sp.add_argument(
        "--older-than-ms", type=int, default=None,
        help="absolute mtime cutoff (default: now - 3 days)",
    )

    args = p.parse_args(argv)
    cat = _catalog(args)

    if args.cmd == "list":
        if args.namespace:
            for ns, t in cat.list_tables(args.namespace):
                print(f"{ns}.{t}")
        else:
            for ns in cat.list_namespaces():
                print(ns)
        return 0

    if args.cmd == "create":
        from .iceberg.partitioning import spec_from
        from .iceberg.types import Schema

        schema = Schema.from_json(json.loads(args.schema_json))
        spec = None
        if args.partition_spec:
            defs = []
            for part in args.partition_spec.split(","):
                col, transform = part.split(":", 1)
                defs.append((col.strip(), transform.strip()))
            spec = spec_from(schema, *defs)
        t = cat.create_table(args.table, schema, spec=spec)
        print(f"created {args.table} at {t.location}")
        return 0

    if args.cmd == "drop":
        cat.drop_table(args.table)
        print(f"dropped {args.table}")
        return 0

    if args.cmd == "rename":
        cat.rename_table(args.src, args.dst)
        print(f"renamed {args.src} -> {args.dst}")
        return 0

    if args.cmd == "register":
        t = cat.register_table(args.table, args.metadata_location)
        print(f"registered {args.table} from {args.metadata_location} (location {t.location})")
        return 0

    t = cat.load_table(args.table)

    if args.cmd == "describe":
        md = t.metadata
        _print(
            {
                "identifier": str(args.table),
                "uuid": md.table_uuid,
                "location": md.location,
                "format-version": md.format_version,
                "current-snapshot-id": md.current_snapshot_id,
                **(
                    {"next-row-id": md.next_row_id}
                    if md.format_version >= 3
                    else {}
                ),
                "schema": md.current_schema().to_json(),
                "partition-spec": md.default_spec().to_json(),
                "properties": md.properties,
            }
        )
    elif args.cmd == "schema":
        _print(t.schema().to_json())
    elif args.cmd == "spec":
        _print(t.spec().to_json())
    elif args.cmd == "uuid":
        print(t.metadata.table_uuid)
    elif args.cmd == "location":
        print(t.location)
    elif args.cmd == "files":
        from .iceberg.manifest import read_manifest

        snap = t.current_snapshot()
        if snap:
            for m in snap.manifests():
                for e in read_manifest(m.manifest_path):
                    print(
                        f"{e.data_file.file_path}\t{e.data_file.record_count}\t"
                        f"{e.data_file.file_size_in_bytes}"
                    )
    elif args.cmd == "history":
        for e in t.history():
            print(f"{e.timestamp_ms}\t{e.snapshot_id}")
    elif args.cmd == "snapshots":
        for s in t.metadata.snapshots:
            print(f"{s.snapshot_id}\t{s.sequence_number}\t{s.summary.operation}")
    elif args.cmd == "upgrade":
        t.upgrade_format_version(args.format_version)
        print(f"upgraded {args.table} to format-version {args.format_version}")
    elif args.cmd == "rollback":
        t.rollback_to(args.snapshot_id)
        print(f"main is now at snapshot {args.snapshot_id}")
    elif args.cmd == "cherry-pick":
        if t.cherry_pick(args.snapshot_id):
            t.refresh()
            print(
                f"applied {args.snapshot_id} as snapshot "
                f"{t.current_snapshot().snapshot_id}"
            )
        else:
            print(f"snapshot {args.snapshot_id} already on main; nothing to do")
    elif args.cmd == "expire":
        before = len(t.metadata.snapshots)
        tx = t.transaction()
        tx.expire_snapshots(
            older_than_ms=args.older_than_ms, retain_last=args.retain_last
        )
        tx.commit()
        t.refresh()
        print(f"expired {before - len(t.metadata.snapshots)} snapshots")
    elif args.cmd == "orphans":
        from .iceberg.maintenance import delete_orphan_files

        removed = delete_orphan_files(
            t, older_than_ms=args.older_than_ms, dry_run=not args.delete
        )
        for pth in removed:
            print(pth)
        print(
            f"{'deleted' if args.delete else 'found'} {len(removed)} orphan files"
        )
    elif args.cmd == "properties":
        if args.action == "get":
            if args.key:
                print(t.properties.get(args.key, ""))
            else:
                _print(t.properties)
        elif args.action == "set":
            tx = t.transaction()
            tx.set_properties({args.key: args.value})
            tx.commit()
            print(f"set {args.key}={args.value}")
        else:
            tx = t.transaction()
            tx.remove_properties(args.key)
            tx.commit()
            print(f"removed {args.key}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
