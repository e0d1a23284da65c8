"""Scale probe for the spatial-statistics and pack/hygiene families
(round-5 directive #6): run morans_i / local_g / ripley_k over a 16M-doc
synthetic documents table and chunk_dedup / decontaminate over an 8M-doc
table with text, at 32 cpus, and print one JSON line per query.

The tables are generated deterministically in /tmp (doc_id-keyed, the
same derive scheme the queries use; the text corpus carries planted
exact duplicates so the dedup path has real work).  Usage:

    python tools/family_probe.py [n_spatial] [n_text]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SPATIAL = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
N_TEXT = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000

SP_DIR = f"/tmp/oqr_probe/spatial_{N_SPATIAL}"
TX_DIR = f"/tmp/oqr_probe/text_{N_TEXT}"

_WORDS = [f"w{i:03d}" for i in range(1000)]


def _gen_spatial():
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(SP_DIR, exist_ok=True)
    p = f"{SP_DIR}/documents.parquet"
    if os.path.exists(p):
        return
    ids = pa.array(np.arange(N_SPATIAL, dtype=np.int64))
    nch = pa.array((np.arange(N_SPATIAL, dtype=np.int64) * 37) % 5000 + 40)
    pq.write_table(pa.table({"doc_id": ids, "n_chars": nch}), p,
                   row_group_size=1_000_000)


def _gen_text():
    """8M short docs; every doc_id % 10 == 5 repeats doc_id-5's text
    (planted exact chunk dups); vocabulary overlap feeds the gram
    probes.  Generated via Ray tasks (vectorized numpy join)."""
    import numpy as np
    import ray

    if os.path.exists(f"{TX_DIR}/documents.parquet"):
        return
    words = np.asarray(_WORDS, dtype=object)

    def make(block):
        import pandas as pd
        import pyarrow as pa

        ids = np.asarray(block["doc_id"], np.int64)
        base = np.where(ids % 10 == 5, ids - 5, ids)
        cols = [words[(base * 7 + k * 13) % 1000] for k in range(24)]
        txt = cols[0]
        for c in cols[1:]:
            txt = np.char.add(np.char.add(txt.astype(str), " "), c.astype(str))
        return pa.table({
            "doc_id": pa.array(ids),
            "text": pa.array(txt.astype(object), pa.string()),
            "source": pa.array((ids % 7).astype(str)),
        })

    ds = ray.data.range(N_TEXT).map_batches(
        lambda b: {"doc_id": b["id"]}, batch_format="numpy")
    ds = ds.map_batches(make, batch_format="numpy")
    ds.write_parquet(f"{TX_DIR}/documents.parquet", min_rows_per_file=500_000)


def main():
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    _gen_spatial()
    t0 = time.time()
    _gen_text()
    gen_t = round(time.time() - t0, 1)

    from osmquadtree_depreceated_ray.pipelines.queries import QUERIES

    from osmquadtree_depreceated_ray.pipelines.queries_spatial import (
        q_ripley_k,
    )

    # density-appropriate Ripley radii: a fixed-radius pair count is
    # O(n^2 r^2 / A), so the sf radii (15 deg) would be ~3e12 pairs at
    # 16M points — probe at ~0.05-0.15 deg (~25 pairs/point)
    probe_rs = (500_000, 1_000_000, 1_500_000)
    plan = [
        ("morans_i", SP_DIR, None), ("local_g", SP_DIR, None),
        ("ripley_k", SP_DIR, lambda d: q_ripley_k(d, rs=probe_rs)),
        ("chunk_dedup", TX_DIR, None), ("decontaminate", TX_DIR, None),
    ]
    out = {"n_spatial": N_SPATIAL, "n_text": N_TEXT, "gen_text_s": gen_t}
    for name, d, fn in plan:
        t0 = time.time()
        r = (fn or QUERIES[name])(d)
        df = r.to_pandas() if hasattr(r, "to_pandas") else r
        out[name] = {"sec": round(time.time() - t0, 1), "rows": len(df)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
