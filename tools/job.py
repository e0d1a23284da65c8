"""Cluster job entrypoint — the ``ray job submit`` driver the north
rule runs on fixed N / 4N-node clusters:

    ray job submit --working-dir /root/repo -- \
        python tools/job.py --pages <parquet dir> --out <tiled out dir> \
            [--target 8000] [--minimum 500] [--resume/--no-resume]

Connects to the submitting cluster (``ray.init(address="auto")``) when
launched by the job manager; falls back to a local session when run
standalone (sandbox smoke).  Prints ONE JSON line: tiles, rows,
skipped (resume), per-stage timings — the per-partition metrics the
lineage manifest also records.  Rerunning after a failure skips
completed tiles (per-tile atomic writes + manifest commit point).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="input pages parquet dir")
    ap.add_argument("--out", required=True, help="tiled output dir")
    ap.add_argument("--target", type=int, default=8000)
    ap.add_argument("--minimum", type=int, default=500)
    ap.add_argument("--resume", action=argparse.BooleanOptionalAction,
                    default=True)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` the job manager preset RAY_ADDRESS points
        # at the cluster; standalone (no cluster found) falls back to a
        # local session — address="auto" raises ConnectionError then
        try:
            ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                     ignore_reinit_error=True, logging_level="ERROR")
        except ConnectionError:
            ray.init(address="local", ignore_reinit_error=True,
                     logging_level="ERROR")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from osmquadtree_depreceated_ray.pipelines.tile import tile_pages

    t0 = time.time()
    res = tile_pages(args.pages, args.out, target=args.target,
                     minimum=args.minimum, resume=args.resume,
                     checkpoint_entities=False)
    res.pop("entities_ds", None)
    out = {
        "job": "tile_pages",
        "wall_sec": round(time.time() - t0, 2),
        "cluster_cpus": int(ray.cluster_resources().get("CPU", 0)),
        **{k: v for k, v in res.items()},
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
