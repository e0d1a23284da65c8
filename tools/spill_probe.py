"""64M-page spill probe: flagship under a deliberately tiny (2 GB)
object store so the streaming executor must spill — evidence that the
backpressure/spill path survives a corpus ~40x the store.

Usage: GRAFT_BENCH_PAGES=64000000 python tools/spill_probe.py
Prints one JSON line (same shape as bench.py's flagship record).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("GRAFT_BENCH_PAGES", "64000000")


def main():
    import ray

    ray.init(
        address="local",
        num_cpus=32,
        object_store_memory=2_000_000_000,
        include_dashboard=False,
        logging_level="ERROR",
    )
    import bench

    pages_path = bench.ensure_pages()
    import shutil

    from osmquadtree_depreceated_ray.pipelines import tile as tp

    # the spill probe's tiled output goes to DISK (not bench.OUT_BASE's
    # /dev/shm): at 64M pages the output is ~10 GB and must not eat the
    # tmpfs
    out = "/tmp/oqr_bench/out_spill"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    res = tp.tile_pages(pages_path, out, target=8000, minimum=500,
                        checkpoint_entities=False)
    t = time.time() - t0
    print(json.dumps({
        "metric": "spill_probe_64m_sec",
        "sec": round(t, 1),
        "pages": bench.BENCH_PAGES,
        "tiles": res["tiles"],
        "entities": res["total"],
        "timings": res.get("timings", {}),
        "object_store_bytes": 2_000_000_000,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
