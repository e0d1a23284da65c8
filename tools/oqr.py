"""Command-line entry points — the analogue of the reference's binaries
(calcqts / sortblocks / makegeometries / update / filter flows).

Usage:
    python tools/oqr.py tile      --pages DIR --out DIR [--target N --minimum N]
    python tools/oqr.py geometry  --fixtures DIR --out DIR
    python tools/oqr.py update    --out DIR --changes FILE --seq N
    python tools/oqr.py compact   --out DIR
    python tools/oqr.py geojson   --features FILE --out FILE
    python tools/oqr.py filter    --out DIR --bbox minx,miny,maxx,maxy --dest DIR
    python tools/oqr.py qts       --out DIR --dest DIR
    python tools/oqr.py sql       --query "SELECT ..." [--sf DIR]
                                  [--table name=path ...] [--dest FILE]

Owns its Ray session (scripts must, per the driver contract the library
itself never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _init_ray():
    import logging

    import ray

    if not ray.is_initialized():
        logging.getLogger("ray.data").setLevel(logging.ERROR)
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        import ray.data

        ray.data.DataContext.get_current().enable_progress_bars = False


def main(argv=None):
    p = argparse.ArgumentParser(prog="oqr")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("tile", help="pages parquet -> tiled entities")
    t.add_argument("--pages", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--target", type=int, default=8000)
    t.add_argument("--minimum", type=int, default=500)
    t.add_argument("--no-resume", action="store_true")

    g = sub.add_parser("geometry", help="fixture tables -> features parquet")
    g.add_argument("--fixtures", required=True)
    g.add_argument("--out", required=True)

    u = sub.add_parser("update", help="apply one change batch")
    u.add_argument("--out", required=True)
    u.add_argument("--changes", required=True)
    u.add_argument("--seq", type=int, required=True)

    c = sub.add_parser("compact", help="merge change batches into tiles")
    c.add_argument("--out", required=True)

    gj = sub.add_parser("geojson", help="features parquet -> geojsonl")
    gj.add_argument("--features", help="features parquet file or dir")
    gj.add_argument("--out", help="single output geojsonl path")
    gj.add_argument("--store", help="tiled features store (manifest dir); "
                                    "streams one .geojsonl.gz per tile")
    gj.add_argument("--dest", help="destination dir for --store mode")
    gj.add_argument("--no-gzip", action="store_true")

    f = sub.add_parser("filter", help="bbox-filtered extract of a tiled dir")
    f.add_argument("--out", required=True)
    f.add_argument("--bbox", required=True, help="minx,miny,maxx,maxy (1e-7 deg)")
    f.add_argument("--dest", required=True)

    q = sub.add_parser("qts", help="write the qts-only artifact")
    q.add_argument("--out", required=True)
    q.add_argument("--dest", required=True)

    sq = sub.add_parser(
        "sql", help="run a SQL query (pipelines/sqlparse front-end) "
        "over parquet tables")
    sq.add_argument("--query", required=True)
    sq.add_argument("--table", action="append", default=[],
                    help="name=path (parquet file or directory); repeatable")
    sq.add_argument("--sf", help="directory of <name>.parquet tables to "
                    "register by stem (e.g. a testdata sf dir)")
    sq.add_argument("--dest", help="write result parquet here")
    sq.add_argument("--show", type=int, default=10,
                    help="print up to N result rows (default 10)")

    qr = sub.add_parser(
        "query", help="run a registry query (__ray_entry__.queries()) "
        "over an sf-style table directory")
    qr.add_argument("--name", help="query name (omit with --list)")
    qr.add_argument("--sf", default="/root/testdata/sf0.001",
                    help="directory of <table>.parquet inputs")
    qr.add_argument("--dest", help="write result parquet here")
    qr.add_argument("--show", type=int, default=10,
                    help="print up to N result rows (default 10)")
    qr.add_argument("--list", action="store_true",
                    help="print the available query names and exit")

    sv = sub.add_parser(
        "serve", help="T6 per-tile serving store query (PackedDataStore.Filter)")
    sv.add_argument("--out", required=True)
    sv.add_argument("--bbox", help="minx,miny,maxx,maxy (1e-7 deg)")
    sv.add_argument("--columns", help="comma-separated projection")
    sv.add_argument("--sort-by", dest="sort_by")
    sv.add_argument("--limit", type=int)
    sv.add_argument("--dest", help="write result parquet here (else count only)")

    args = p.parse_args(argv)

    _init_ray()
    import ray

    try:
        if args.cmd == "tile":
            from osmquadtree_depreceated_ray.pipelines.tile import tile_pages

            res = tile_pages(args.pages, args.out, args.target, args.minimum,
                             resume=not args.no_resume)
            res.pop("entities_ds", None)
            print(json.dumps(res))
        elif args.cmd == "geometry":
            from osmquadtree_depreceated_ray.pipelines.geometry import build_geometries

            res = build_geometries(args.fixtures, args.out)
            res.pop("rel_qt", None)
            print(json.dumps(res))
        elif args.cmd == "update":
            import pyarrow.parquet as pq

            from osmquadtree_depreceated_ray.pipelines.update import apply_change_batch

            res = apply_change_batch(args.out, pq.read_table(args.changes), args.seq)
            print(json.dumps(res))
        elif args.cmd == "compact":
            from osmquadtree_depreceated_ray.pipelines.update import compact

            print(json.dumps(compact(args.out)))
        elif args.cmd == "geojson":
            if args.store:
                from osmquadtree_depreceated_ray.pipelines.geometry import (
                    write_geojson_tiled,
                )

                print(json.dumps(write_geojson_tiled(
                    args.store, args.dest, gzip_out=not args.no_gzip)))
            else:
                from osmquadtree_depreceated_ray.pipelines.geometry import (
                    write_geojson,
                )

                print(json.dumps(
                    {"features": write_geojson(args.features, args.out)}))
        elif args.cmd == "filter":
            from osmquadtree_depreceated_ray.pipelines.spatial_filter import (
                BboxTest,
                read_tiles_pruned,
            )

            minx, miny, maxx, maxy = (int(v) for v in args.bbox.split(","))
            ds, pruned = read_tiles_pruned(args.out, BboxTest(minx, miny, maxx, maxy))
            n = 0
            if ds is not None:
                ds.write_parquet(args.dest)
                n = sum(1 for _ in os.listdir(args.dest))
            print(json.dumps({"files": n, **pruned}))
        elif args.cmd == "qts":
            import ray.data

            from osmquadtree_depreceated_ray.pipelines.tile import write_qts

            ents = ray.data.read_parquet(os.path.join(args.out, "entities"))
            write_qts(ents, args.dest)
            print(json.dumps({"dest": args.dest}))
        elif args.cmd == "sql":
            import glob

            import pyarrow.parquet as pq
            import ray.data

            from osmquadtree_depreceated_ray.pipelines.sqlparse import parse_sql

            tabs = {}
            if args.sf:
                for path in sorted(glob.glob(os.path.join(args.sf, "*.parquet"))):
                    name = os.path.splitext(os.path.basename(path))[0]
                    tabs[name] = ray.data.read_parquet(path)
            for spec in args.table:
                name, _, path = spec.partition("=")
                if not path:
                    raise SystemExit(f"--table expects name=path, got {spec!r}")
                tabs[name] = ray.data.read_parquet(path)
            res = parse_sql(args.query, tabs)
            import ray as _ray

            # keep empty blocks: a zero-row result must still carry the
            # projected schema into --dest and the JSON summary
            parts = _ray.get(res.to_arrow_refs())
            import pyarrow as pa

            out = (pa.concat_tables(parts, promote_options="default")
                   if parts else pa.table({}))
            if args.dest:
                pq.write_table(out, args.dest)
            head = out.slice(0, args.show).to_pylist()
            print(json.dumps({"rows": out.num_rows,
                              "columns": out.column_names,
                              "head": head}, default=str))
        elif args.cmd == "query":
            import pyarrow as pa
            import pyarrow.parquet as pq

            from osmquadtree_depreceated_ray.pipelines.queries import QUERIES

            if args.list or not args.name:
                print(json.dumps({"queries": sorted(QUERIES)}))
            else:
                if args.name not in QUERIES:
                    raise SystemExit(f"unknown query {args.name!r} "
                                     "(use --list)")
                res = QUERIES[args.name](args.sf)
                if isinstance(res, pa.Table):
                    out = res
                elif hasattr(res, "to_arrow_refs"):
                    parts = ray.get(res.to_arrow_refs())
                    out = (pa.concat_tables(parts,
                                            promote_options="default")
                           if parts else pa.table({}))
                else:  # pandas
                    out = pa.Table.from_pandas(res, preserve_index=False)
                if args.dest:
                    pq.write_table(out, args.dest)
                head = out.slice(0, args.show).to_pylist()
                print(json.dumps({"query": args.name,
                                  "rows": out.num_rows,
                                  "columns": out.column_names,
                                  "head": head}, default=str))
        elif args.cmd == "serve":
            import pyarrow.parquet as pq

            from osmquadtree_depreceated_ray.stages.serve import TileServer

            srv = TileServer(args.out)
            bbox = ([int(v) for v in args.bbox.split(",")]
                    if args.bbox else None)
            cols = args.columns.split(",") if args.columns else None
            res = srv.filter(bbox=bbox, columns=cols,
                             sort_by=args.sort_by, limit=args.limit)
            if args.dest:
                pq.write_table(res, args.dest)
            print(json.dumps({"rows": res.num_rows,
                              "columns": res.column_names,
                              **srv.stats()}))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
