"""icelite table maintenance CLI — the ops companion to extract_job.

    python jobs/table_tool.py <table_dir> info
    python jobs/table_tool.py <table_dir> history
    python jobs/table_tool.py <table_dir> compact
    python jobs/table_tool.py <table_dir> evolve \
        [--add name:type ...] [--rename old:new ...]

``info``/``history``/``evolve`` are metadata-only (no Spark session —
they run instantly against the manifests); ``compact`` builds a local
session to rewrite the data files.  Every command prints one JSON
line, mirroring extract_job's report contract.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("table")
    p.add_argument("command", choices=["info", "history", "compact", "evolve"])
    p.add_argument("--add", action="append", default=[],
                   metavar="NAME:TYPE",
                   help="evolve: add a column (Spark type string, e.g. "
                        "lang:string, score:double)")
    p.add_argument("--rename", action="append", default=[],
                   metavar="OLD:NEW", help="evolve: rename a column")
    args = p.parse_args(argv)

    from mini_html_parser_spark.plans.icelite import IceliteTable

    t = IceliteTable(args.table)

    if args.command == "info":
        snaps = t.snapshots()
        schema = t.current_schema()
        print(json.dumps({
            "table": args.table,
            "snapshots": len(snaps),
            "current_snapshot": snaps[-1]["snapshot_id"] if snaps else None,
            "total_rows": sum(s["total_rows"] for s in snaps),
            "committed_buckets": len(t.committed_buckets()),
            "partitioning": t.partitioning(),
            "schema_id": schema["schema_id"] if schema else None,
            "columns": (
                [f"{f['name']}:{f['type']}" for f in schema["fields"]]
                if schema else None
            ),
        }))
        return 0

    if args.command == "history":
        print(json.dumps({
            "table": args.table,
            "snapshots": [
                {
                    "sequence": s["sequence"],
                    "snapshot_id": s["snapshot_id"],
                    "parent_id": s.get("parent_id"),
                    "rows": s["total_rows"],
                    "schema_id": s.get("schema_id"),
                    "compacted": bool(s.get("compacted")),
                    "metrics": s.get("metrics") or {},
                }
                for s in t.snapshots()
            ],
        }))
        return 0

    if args.command == "evolve":
        def pair(opt, spec):
            k, sep, v = spec.partition(":")
            if not sep or not k or not v:
                p.error(f"{opt} expects NAME:VALUE, got {spec!r}")
            return k, v

        add = dict(pair("--add", a) for a in args.add)
        rename = dict(pair("--rename", r) for r in args.rename)
        if not add and not rename:
            p.error("evolve needs at least one --add or --rename")
        schema = t.evolve(add_columns=add or None, rename_columns=rename or None)
        print(json.dumps({
            "table": args.table,
            "schema_id": schema["schema_id"],
            "columns": [f"{f['name']}:{f['type']}" for f in schema["fields"]],
        }))
        return 0

    # compact: needs a session to rewrite data files
    from mini_html_parser_spark.pipeline import build_session

    # getOrCreate: reuses an existing in-process session (tests) or
    # builds one (CLI).  Deliberately NOT stopped here — a borrowed
    # session must survive the call; a CLI-owned one dies with the
    # process.
    spark = build_session(app_name="icelite-compact")
    spark.sparkContext.setLogLevel("ERROR")
    manifest = t.compact(spark)
    print(json.dumps({
        "table": args.table,
        "compacted": manifest is not None,
        "snapshot_id": manifest["snapshot_id"] if manifest else None,
        "rows": manifest["total_rows"] if manifest else None,
        "folded": (manifest or {}).get("metrics", {}).get("compacted_snapshots"),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
