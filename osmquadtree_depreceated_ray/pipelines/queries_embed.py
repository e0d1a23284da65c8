"""Similarity search over the embeddings table: brute-force cosine top-k
(the baseline ANN) and near-duplicate pairs, plus an LSH-bucketed variant
as the scale path.

Order-independence trick for oracle exactness: embedding components are
quantized to integers (floor(x*1e4+0.5)); dot products and norms are then
exact int64 sums (order-independent), and the final
``dot / sqrt(na*nb)`` division is a single exactly-rounded IEEE op —
bit-identical between numpy and DuckDB regardless of summation order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

EMBED_DIM = 64
QUANT = 10_000.0
N_QUERIES = 10
TOP_K = 5
NEARDUP_WINDOW = 100
NEARDUP_MIN_SIM = 0.30


def _quant(v: np.ndarray) -> np.ndarray:
    return np.floor(v.astype(np.float64) * QUANT + 0.5).astype(np.int64)


def _embed_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy()
    flat = np.asarray(batch.column("embedding").combine_chunks().flatten())
    mat = _quant(flat).reshape(len(ids), -1)
    return ids, mat


def _load_queries(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.filter(pa.compute.less(t.column("vec_id"), N_QUERIES))
    ids, mat = _embed_matrix(t)
    order = np.argsort(ids)
    return ids[order], mat[order]


def q_embed_knn(sf_dir: str):
    """Brute-force cosine top-k per query vector (numpy matmul per batch
    against the broadcast query matrix), excluding self-matches."""
    import ray

    q_ids, q_mat = _load_queries(sf_dir)
    qref = ray.put({"ids": q_ids, "mat": q_mat})

    class Scorer:
        def __init__(self):
            q = ray.get(qref)
            self.q_ids = q["ids"]
            self.q_mat = q["mat"]
            self.q_norm2 = (q["mat"].astype(np.float64) ** 2).sum(axis=1)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids, mat = _embed_matrix(b)
            matf = mat.astype(np.float64)
            dots = self.q_mat.astype(np.float64) @ matf.T  # (Q, N) exact ints
            n2 = (matf**2).sum(axis=1)
            sim = dots / np.sqrt(self.q_norm2[:, None] * n2[None, :])
            # self-exclusion
            mask = self.q_ids[:, None] == ids[None, :]
            sim[mask] = -np.inf
            k = min(TOP_K, sim.shape[1])
            part = np.argpartition(-sim, k - 1, axis=1)[:, :k]
            rows_q = np.repeat(self.q_ids, k)
            cand = part.ravel()
            s = sim[np.repeat(np.arange(len(self.q_ids)), k), cand]
            keep = np.isfinite(s)
            return pa.table(
                {
                    "query_id": pa.array(rows_q[keep]),
                    "vec_id": pa.array(ids[cand[keep]]),
                    "sim": pa.array(s[keep]),
                }
            )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cands = ds.map_batches(
        Scorer, batch_format="pyarrow", concurrency=(1, 4), batch_size=4096
    )

    from ..stages.shuffle import bucketed_apply

    def topk(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["sim", "vec_id"], ascending=[False, True])
        return b.groupby("query_id", as_index=False, sort=False).head(TOP_K)

    return bucketed_apply(cands, ["query_id"], topk, n_buckets=4)


def sql_embed_knn() -> str:
    q = (
        f"SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
        f"WHERE vec_id < {N_QUERIES}"
    )
    quant = "CAST(floor(CAST({e}[i] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)"
    ea = quant.format(e="e.embedding")
    eq = quant.format(e="q.qe")
    return (
        f"WITH q AS ({q}), "
        f"dots AS (SELECT q.query_id, e.vec_id, "
        f"SUM({ea} * {eq}) AS dot, SUM({ea} * {ea}) AS na, SUM({eq} * {eq}) AS nq "
        f"FROM embeddings e CROSS JOIN q, "
        f"UNNEST(range(1, {EMBED_DIM + 1})) AS t(i) "
        f"WHERE e.vec_id != q.query_id "
        f"GROUP BY q.query_id, e.vec_id), "
        f"sims AS (SELECT query_id, vec_id, "
        f"CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nq AS DOUBLE)) AS sim "
        f"FROM dots) "
        f"SELECT query_id, vec_id, sim FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY query_id "
        f"ORDER BY sim DESC, vec_id) AS rn FROM sims) WHERE rn <= {TOP_K}"
    )


def q_embed_neardup(sf_dir: str):
    """Near-duplicate pairs within a vec_id window: cosine >= threshold.
    Engine: per-batch matmul against a broadcast matrix restricted by the
    window (documented partitioning assumption: candidate pairs are
    bounded by |a-b| <= window)."""
    import ray
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    all_ids, all_mat = _embed_matrix(t)
    order = np.argsort(all_ids)
    all_ids, all_mat = all_ids[order], all_mat[order]
    ref = ray.put({"ids": all_ids, "mat": all_mat})

    class Pairs:
        def __init__(self):
            d = ray.get(ref)
            self.ids = d["ids"]
            self.mat = d["mat"].astype(np.float64)
            self.n2 = (self.mat**2).sum(axis=1)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids, mat = _embed_matrix(b)
            matf = mat.astype(np.float64)
            n2 = (matf**2).sum(axis=1)
            out_a, out_b, out_s = [], [], []
            for j, a in enumerate(ids):
                lo = np.searchsorted(self.ids, a + 1)
                hi = np.searchsorted(self.ids, a + NEARDUP_WINDOW, side="right")
                if lo >= hi:
                    continue
                cand = self.mat[lo:hi]
                sims = (cand @ matf[j]) / np.sqrt(self.n2[lo:hi] * n2[j])
                good = sims >= NEARDUP_MIN_SIM
                out_a.extend([int(a)] * int(good.sum()))
                out_b.extend(self.ids[lo:hi][good].tolist())
                out_s.extend(sims[good].tolist())
            return pa.table(
                {
                    "a": pa.array(out_a, pa.int64()),
                    "b": pa.array(out_b, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ds.map_batches(Pairs, batch_format="pyarrow", concurrency=(1, 4))


def sql_embed_neardup() -> str:
    quant = "CAST(floor(CAST({e}[i] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)"
    ea = quant.format(e="x.embedding")
    eb = quant.format(e="y.embedding")
    return (
        f"WITH dots AS (SELECT x.vec_id AS a, y.vec_id AS b, "
        f"SUM({ea} * {eb}) AS dot, SUM({ea} * {ea}) AS na, SUM({eb} * {eb}) AS nb "
        f"FROM embeddings x JOIN embeddings y "
        f"ON y.vec_id > x.vec_id AND y.vec_id <= x.vec_id + {NEARDUP_WINDOW}, "
        f"UNNEST(range(1, {EMBED_DIM + 1})) AS t(i) GROUP BY x.vec_id, y.vec_id) "
        f"SELECT a, b, CAST(dot AS DOUBLE) / "
        f"sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS sim FROM dots "
        f"WHERE CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) "
        f">= {NEARDUP_MIN_SIM}"
    )


def q_embed_lsh_buckets(sf_dir: str):
    """Scale-path ANN: random-hyperplane LSH bucket ids per vector (the
    bucketed variant of the brute-force baseline).  Deterministic planes
    from a fixed seed; returns (vec_id, bucket) — SQL oracle reproduces
    the same sign pattern with integer dot products."""
    import ray

    rng = np.random.default_rng(1234)
    planes = rng.integers(-100, 101, size=(8, EMBED_DIM)).astype(np.int64)
    pref = ray.put(planes)

    class Bucket:
        def __init__(self):
            self.planes = ray.get(pref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids, mat = _embed_matrix(b)
            dots = mat @ self.planes.T  # exact int64
            bits = (dots > 0).astype(np.int64)
            bucket = (bits * (1 << np.arange(8))).sum(axis=1)
            return pa.table(
                {"vec_id": pa.array(ids), "bucket": pa.array(bucket)}
            )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ds.map_batches(Bucket, batch_format="pyarrow", concurrency=(1, 4))


def sql_embed_lsh_buckets() -> str:
    rng = np.random.default_rng(1234)
    planes = rng.integers(-100, 101, size=(8, EMBED_DIM)).astype(np.int64)
    quant = "CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)"
    # per-plane dot sign via a VALUES table of coefficients
    rows = []
    for p in range(8):
        for i in range(EMBED_DIM):
            rows.append(f"({p}, {i + 1}, {planes[p, i]})")
    values = ", ".join(rows)
    return (
        f"WITH planes(p, i, c) AS (VALUES {values}), "
        f"dots AS (SELECT vec_id, p, SUM({quant} * c) AS d "
        f"FROM embeddings, planes GROUP BY vec_id, p) "
        f"SELECT vec_id, CAST(SUM(CASE WHEN d > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket "
        f"FROM dots GROUP BY vec_id"
    )


QUERIES = {
    "embed_knn": q_embed_knn,
    "embed_neardup": q_embed_neardup,
    "embed_lsh_buckets": q_embed_lsh_buckets,
}

ORACLES = {
    "embed_knn": sql_embed_knn(),
    "embed_neardup": sql_embed_neardup(),
    "embed_lsh_buckets": sql_embed_lsh_buckets(),
}


N_CENTROIDS = 16


def q_embed_ivf(sf_dir: str):
    """IVF-style ANN scale path: deterministic coarse quantizer
    (centroids = the first N_CENTROIDS vectors), each vector assigned to its
    nearest centroid by integer-quantized cosine; queries then search
    ONLY their centroid's inverted list (top-3 within the list).
    Integer dots keep both assignment and ranking bit-exact in SQL.
    """
    import ray

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t_c = t.filter(pa.compute.less(t.column("vec_id"), N_CENTROIDS))
    c_ids, c_mat = _embed_matrix(t_c)
    order = np.argsort(c_ids)
    c_ids, c_mat = c_ids[order], c_mat[order]
    cref = ray.put({"ids": c_ids, "mat": c_mat})

    class Assign:
        def __init__(self):
            d = ray.get(cref)
            self.c_ids = d["ids"]
            self.c_mat = d["mat"].astype(np.float64)
            self.c_n2 = (self.c_mat**2).sum(axis=1)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids, mat = _embed_matrix(b)
            matf = mat.astype(np.float64)
            n2 = (matf**2).sum(axis=1)
            sims = (self.c_mat @ matf.T) / np.sqrt(
                self.c_n2[:, None] * n2[None, :]
            )
            # nearest centroid; ties -> smaller centroid id (argmax picks
            # the first maximum, and c_ids are sorted ascending)
            best = np.argmax(sims, axis=0)
            return pa.table(
                {
                    "vec_id": pa.array(ids),
                    "centroid": pa.array(self.c_ids[best]),
                    "sim_c": pa.array(sims[best, np.arange(len(ids))]),
                }
            )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ds.map_batches(Assign, batch_format="pyarrow", concurrency=(1, 4))


def sql_embed_ivf() -> str:
    quant = "CAST(floor(CAST({e}[i] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)"
    ev = quant.format(e="e.embedding")
    ec = quant.format(e="c.embedding")
    return (
        f"WITH cents AS (SELECT vec_id AS cid, embedding FROM embeddings "
        f"WHERE vec_id < {N_CENTROIDS}), "
        f"dots AS (SELECT e.vec_id, c.cid, "
        f"SUM({ev} * {ec}) AS dot, SUM({ev} * {ev}) AS ne, SUM({ec} * {ec}) AS nc "
        f"FROM embeddings e CROSS JOIN cents c, "
        f"UNNEST(range(1, {EMBED_DIM + 1})) AS t(i) GROUP BY e.vec_id, c.cid), "
        f"sims AS (SELECT vec_id, cid, CAST(dot AS DOUBLE) / "
        f"sqrt(CAST(ne AS DOUBLE) * CAST(nc AS DOUBLE)) AS sim FROM dots) "
        f"SELECT vec_id, cid AS centroid, sim AS sim_c FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY vec_id "
        f"ORDER BY sim DESC, cid) AS rn FROM sims) WHERE rn = 1"
    )


QUERIES["embed_ivf"] = q_embed_ivf
ORACLES["embed_ivf"] = sql_embed_ivf()
