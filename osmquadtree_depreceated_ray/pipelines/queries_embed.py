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


def _load_small_side(sf_dir: str, max_vec_id: int):
    """Row-group-pruned read of the broadcast small side: the predicate
    is pushed into the parquet scan, so only row groups containing
    vec_id < max_vec_id are read — never the full table."""
    import pyarrow.parquet as pq
    import pyarrow.dataset as pds

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=pds.field("vec_id") < max_vec_id,
    )
    ids, mat = _embed_matrix(t)
    order = np.argsort(ids)
    return ids[order], mat[order]


def _load_queries(sf_dir: str):
    return _load_small_side(sf_dir, N_QUERIES)


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
    from ..stages.spatial import worker_cached

    cands = ds.map_batches(
        worker_cached(("embed_knn", qref.hex()), Scorer),
        batch_format="pyarrow", batch_size=4096,
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


NEARDUP_PART = 4096


def q_embed_neardup(sf_dir: str):
    """Near-duplicate pairs within a vec_id window: cosine >= threshold.

    Scale path: a bucketed overlapping-range join, NOT a whole-matrix
    broadcast.  Vectors are range-partitioned by ``vec_id // PART``;
    each vector whose id falls within ``window`` of its partition's
    lower edge is ALSO copied to the previous partition as context, so
    every candidate pair (a < b <= a+window) co-locates in partition
    ``a // PART``.  Pair similarity inside a partition is a banded
    position-offset sweep (one einsum per diagonal), never all-pairs.
    Duplication factor is window/PART (~2.5%), independent of corpus
    size — at 10^12 vectors each partition holds PART+window rows."""
    import ray

    def route(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy()
        part = ids // NEARDUP_PART
        primary = b.append_column("part", pa.array(part)).append_column(
            "is_ctx", pa.array(np.zeros(len(ids), np.int64)))
        edge = ((ids % NEARDUP_PART) < NEARDUP_WINDOW) & (part > 0)
        ctx = b.filter(pa.array(edge))
        ctx = ctx.append_column(
            "part", pa.array(part[edge] - 1)).append_column(
            "is_ctx", pa.array(np.ones(int(edge.sum()), np.int64)))
        return pa.concat_tables([primary, ctx])

    def pairs_group(g: pa.Table) -> pa.Table:
        ids, mat = _embed_matrix(g)
        is_ctx = g.column("is_ctx").to_numpy()
        order = np.argsort(ids, kind="stable")
        ids, mat, is_ctx = ids[order], mat[order], is_ctx[order]
        # context copies duplicate ids already present? no — context rows
        # come from the NEXT partition's range, primaries from this one
        matf = mat.astype(np.float64)
        n2 = (matf**2).sum(axis=1)
        out_a, out_b, out_s = [], [], []
        n = len(ids)
        j = 1
        while j < n:
            va, vb = ids[:-j], ids[j:]
            diff = vb - va
            m = (diff >= 1) & (diff <= NEARDUP_WINDOW) & (is_ctx[:-j] == 0)
            if not (diff <= NEARDUP_WINDOW).any():
                break
            if m.any():
                ii = np.flatnonzero(m)
                dots = np.einsum("ij,ij->i", matf[ii], matf[ii + j])
                sims = dots / np.sqrt(n2[ii] * n2[ii + j])
                good = sims >= NEARDUP_MIN_SIM
                out_a.append(va[ii[good]])
                out_b.append(vb[ii[good]])
                out_s.append(sims[good])
            j += 1
        if not out_a:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.table({
            "a": pa.array(np.concatenate(out_a)),
            "b": pa.array(np.concatenate(out_b)),
            "sim": pa.array(np.concatenate(out_s)),
        })

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_group, batch_format="pyarrow")
    )


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
    from ..stages.spatial import worker_cached

    return ds.map_batches(
        worker_cached(("embed_lsh", pref.hex()), Bucket),
        batch_format="pyarrow")


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

    c_ids, c_mat = _load_small_side(sf_dir, N_CENTROIDS)
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
    from ..stages.spatial import worker_cached

    return ds.map_batches(
        worker_cached(("embed_ivf", cref.hex()), Assign),
        batch_format="pyarrow")


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


# --- IVF search: probe-limited ANN top-k ------------------------------------

IVF_NQ = 4        # query vectors (vec_id < IVF_NQ)
IVF_PROBE = 2     # inverted lists probed per query
IVF_TOPK = 3


def q_ivf_search(sf_dir: str):
    """The ANN SCALE PATH the brief names: each query searches only its
    ``IVF_PROBE`` nearest centroids' inverted lists instead of the full
    corpus.  Driver computes the tiny Q x C probe table; each batch
    assigns its vectors to centroids (same integer-quantized rule as
    ``embed_ivf``), takes the UNION of probed lists, and runs the
    cosine matmul over that union only — compute is proportional to
    the probed fraction, not the corpus.  Per-batch per-query top-k
    partials bound the exchange at O(Q x k x blocks); the finish is
    one bucketed top-k (identical to ``embed_knn``).  Self-matches
    excluded.  All ranking arithmetic is single-rounded IEEE over
    exact integer dots, so DuckDB reproduces the scores bit-exactly."""
    import ray

    c_ids, c_mat = _load_small_side(sf_dir, N_CENTROIDS)
    q_ids, q_mat = _load_small_side(sf_dir, IVF_NQ)
    cf = c_mat.astype(np.float64)
    qf = q_mat.astype(np.float64)
    c_n2 = (cf**2).sum(axis=1)
    q_n2 = (qf**2).sum(axis=1)
    sims_qc = (qf @ cf.T) / np.sqrt(q_n2[:, None] * c_n2[None, :])
    probes = np.stack([
        c_ids[np.lexsort((c_ids, -sims_qc[i]))[:IVF_PROBE]]
        for i in range(len(q_ids))
    ])  # (Q, PROBE) — driver state is O(Q x C), tiny
    bref = ray.put({"c_ids": c_ids, "cf": cf, "c_n2": c_n2,
                    "q_ids": q_ids, "qf": qf, "q_n2": q_n2,
                    "probes": probes})

    class Search:
        def __init__(self):
            d = ray.get(bref)
            self.__dict__.update(d)
            self.probe_union = np.unique(d["probes"])

        def __call__(self, b: pa.Table) -> pa.Table:
            ids, mat = _embed_matrix(b)
            matf = mat.astype(np.float64)
            n2 = (matf**2).sum(axis=1)
            # centroid assignment (argmax == sim DESC, cid ASC on ties)
            a_sims = (self.cf @ matf.T) / np.sqrt(
                self.c_n2[:, None] * n2[None, :])
            cent = self.c_ids[np.argmax(a_sims, axis=0)]
            # prune to the union of probed lists BEFORE the matmul
            in_union = np.isin(cent, self.probe_union)
            idx = np.flatnonzero(in_union)
            if len(idx) == 0:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            sub, sub_ids, sub_cent = matf[idx], ids[idx], cent[idx]
            sim = (self.qf @ sub.T) / np.sqrt(
                self.q_n2[:, None] * n2[idx][None, :])
            # per query: only ITS probed lists, never itself
            allowed = (self.probes[:, :, None]
                       == sub_cent[None, None, :]).any(axis=1)
            allowed &= self.q_ids[:, None] != sub_ids[None, :]
            sim[~allowed] = -np.inf
            k = min(IVF_TOPK, sim.shape[1])
            part = np.argpartition(-sim, k - 1, axis=1)[:, :k]
            rows_q = np.repeat(self.q_ids, k)
            cand = part.ravel()
            s = sim[np.repeat(np.arange(len(self.q_ids)), k), cand]
            keep = np.isfinite(s)
            return pa.table({"query_id": pa.array(rows_q[keep]),
                             "vec_id": pa.array(sub_ids[cand[keep]]),
                             "sim": pa.array(s[keep])})

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    from ..stages.shuffle import bucketed_apply
    from ..stages.spatial import worker_cached

    cands = ds.map_batches(
        worker_cached(("ivf_search", bref.hex()), Search),
        batch_format="pyarrow", batch_size=4096)

    def topk(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["sim", "vec_id"], ascending=[False, True])
        return b.groupby("query_id", as_index=False, sort=False
                         ).head(IVF_TOPK)

    return bucketed_apply(cands, ["query_id"], topk, n_buckets=4)


def sql_ivf_search() -> str:
    quant = "CAST(floor(CAST({e}[i] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)"
    ev = quant.format(e="e.embedding")
    ec = quant.format(e="c.embedding")
    eq = quant.format(e="q.qe")
    ev2 = quant.format(e="e2.embedding")
    return (
        f"WITH cents AS (SELECT vec_id AS cid, embedding FROM embeddings "
        f"WHERE vec_id < {N_CENTROIDS}), "
        f"qs AS (SELECT vec_id AS query_id, embedding AS qe "
        f"FROM embeddings WHERE vec_id < {IVF_NQ}), "
        # every vector's centroid (sim DESC, cid on ties — argmax rule)
        f"vc_dots AS (SELECT e.vec_id, c.cid, SUM({ev} * {ec}) AS dot, "
        f"SUM({ev} * {ev}) AS ne, SUM({ec} * {ec}) AS nc "
        f"FROM embeddings e CROSS JOIN cents c, "
        f"UNNEST(range(1, {EMBED_DIM + 1})) AS t(i) "
        f"GROUP BY e.vec_id, c.cid), "
        f"vc AS (SELECT vec_id, cid AS centroid FROM ("
        f"SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id "
        f"ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(ne AS DOUBLE) * "
        f"CAST(nc AS DOUBLE)) DESC, cid) AS rn FROM vc_dots) WHERE rn = 1), "
        # each query's probed lists
        f"qc AS (SELECT query_id, cid FROM ("
        f"SELECT q.query_id, c.cid, row_number() OVER ("
        f"PARTITION BY q.query_id ORDER BY CAST(SUM({eq} * {ec}) AS DOUBLE)"
        f" / sqrt(CAST(SUM({eq} * {eq}) AS DOUBLE) * "
        f"CAST(SUM({ec} * {ec}) AS DOUBLE)) DESC, c.cid) AS rn "
        f"FROM qs q CROSS JOIN cents c, "
        f"UNNEST(range(1, {EMBED_DIM + 1})) AS t(i) "
        f"GROUP BY q.query_id, c.cid) WHERE rn <= {IVF_PROBE}), "
        # candidates = vectors in a probed list, excluding the query
        f"cand AS (SELECT qc.query_id, vc.vec_id FROM qc "
        f"JOIN vc ON vc.centroid = qc.cid WHERE vc.vec_id != qc.query_id), "
        f"dots AS (SELECT cand.query_id, cand.vec_id, "
        f"SUM({ev2} * {eq}) AS dot, SUM({ev2} * {ev2}) AS na, "
        f"SUM({eq} * {eq}) AS nq "
        f"FROM cand JOIN embeddings e2 ON e2.vec_id = cand.vec_id "
        f"JOIN qs q ON q.query_id = cand.query_id, "
        f"UNNEST(range(1, {EMBED_DIM + 1})) AS t(i) "
        f"GROUP BY cand.query_id, cand.vec_id) "
        f"SELECT query_id, vec_id, sim FROM ("
        f"SELECT query_id, vec_id, CAST(dot AS DOUBLE) / "
        f"sqrt(CAST(na AS DOUBLE) * CAST(nq AS DOUBLE)) AS sim, "
        f"row_number() OVER (PARTITION BY query_id "
        f"ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * "
        f"CAST(nq AS DOUBLE)) DESC, vec_id) AS rn FROM dots) "
        f"WHERE rn <= {IVF_TOPK}"
    )


QUERIES["ivf_search"] = q_ivf_search
ORACLES["ivf_search"] = sql_ivf_search()


# --- distributed iterative k-means (Lloyd) ---------------------------------

KMEANS_K = 8
KMEANS_ITERS = 3


def kmeans_embeddings(sf_dir: str, k: int = KMEANS_K,
                      iters: int = KMEANS_ITERS):
    """Distributed Lloyd k-means over the quantized embeddings — the
    brief's 'iterative algorithm' class.  Per iteration: centroids are
    ``ray.put``-broadcast, each batch emits integer PARTIAL SUMS
    (k x dim int64 + counts — order-independent, so centroids are
    deterministic; float inertia partials are summed in SORTED order so
    the returned inertia is too), the driver merges O(k*dim) state and
    recomputes means.  Init = the first k vectors by vec_id
    (deterministic).  The input is materialized ONCE — decoded blocks
    sit in the (spillable) object store instead of re-scanning the
    parquet every iteration.
    Returns (centroids float64 [k,dim], per-iteration inertia list,
    the materialized dataset for reuse by the assignment pass).
    """
    import ray

    _, init = _load_small_side(sf_dir, k)
    centroids = init.astype(np.float64)

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()
    inertia = []
    for _ in range(iters):
        cref = ray.put(centroids)

        def partial(b: pa.Table, _cref=cref) -> pa.Table:
            c = ray.get(_cref)
            ids, mat = _embed_matrix(b)
            matf = mat.astype(np.float64)
            d2 = (
                (matf * matf).sum(axis=1)[:, None]
                - 2.0 * (matf @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            best = np.argmin(d2, axis=1)
            kk, dim = c.shape
            sums = np.zeros((kk, dim), dtype=np.int64)
            np.add.at(sums, best, mat)
            counts = np.bincount(best, minlength=kk).astype(np.int64)
            sse = d2[np.arange(len(ids)), best].sum()
            return pa.table({
                "cluster": pa.array(np.arange(kk, dtype=np.int64)),
                "sums": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.ravel(), pa.int64()), dim),
                "n": pa.array(counts),
                "sse": pa.array(np.full(kk, sse / kk, np.float64)),
            })

        parts = ds.map_batches(partial, batch_format="pyarrow")
        kk, dim = centroids.shape
        sums = np.zeros((kk, dim), dtype=np.int64)
        counts = np.zeros(kk, dtype=np.int64)
        sse_parts = []
        for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
            cl = b.column("cluster").to_numpy()
            s = np.asarray(b.column("sums").combine_chunks().flatten()
                           ).reshape(-1, dim)
            np.add.at(sums, cl, s)
            np.add.at(counts, cl, b.column("n").to_numpy())
            sse_parts.append(b.column("sse").to_numpy())
        # batches arrive in nondeterministic order; sorting the float
        # partials before summing makes the inertia value reproducible
        sse_all = (np.sort(np.concatenate(sse_parts))
                   if sse_parts else np.zeros(0))
        nonempty = counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
        inertia.append(float(sse_all.sum()))
    return centroids, inertia, ds


def q_kmeans(sf_dir: str):
    """Final assignment pass after kmeans_embeddings: (vec_id, cluster).
    Rows-only for the driver (iterative float means are not
    SQL-expressible); determinism + monotone-inertia invariants pinned
    by tests/test_kmeans.py."""
    import ray

    centroids, _, ds = kmeans_embeddings(sf_dir)
    cref = ray.put(centroids)

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(cref)
        ids, mat = _embed_matrix(b)
        matf = mat.astype(np.float64)
        d2 = (
            (matf * matf).sum(axis=1)[:, None]
            - 2.0 * (matf @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        best = np.argmin(d2, axis=1)
        return pa.table({
            "vec_id": pa.array(ids),
            "cluster": pa.array(best.astype(np.int64)),
        })

    # reuse the dataset kmeans_embeddings already materialized
    return ds.map_batches(assign, batch_format="pyarrow")


QUERIES["kmeans"] = q_kmeans
# rows-only: iterative algorithm (brief's named non-SQL-expressible
# class); tests/test_kmeans.py pins determinism + inertia descent


def q_kmeans_iter1(sf_dir: str):
    """The FIRST Lloyd iteration's assignment step, oracle-checked: with
    the deterministic init (first k vectors, integer-quantized), the
    squared euclidean distances are exact integers in float64, so
    nearest-centroid assignment AND the distance value are bit-exact in
    SQL.  This pins the assignment kernel the iterative loop reuses;
    iterations 2+ (float means) stay invariant-pinned by
    tests/test_kmeans.py."""
    import ray

    c_ids, c_mat = _load_small_side(sf_dir, KMEANS_K)
    cref = ray.put({"ids": c_ids, "mat": c_mat})

    def assign(b: pa.Table) -> pa.Table:
        d = ray.get(cref)
        c = d["mat"].astype(np.float64)
        ids, mat = _embed_matrix(b)
        matf = mat.astype(np.float64)
        d2 = (
            (matf * matf).sum(axis=1)[:, None]
            - 2.0 * (matf @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        best = np.argmin(d2, axis=1)  # ties -> lowest centroid id
        return pa.table({
            "vec_id": pa.array(ids),
            "cluster": pa.array(d["ids"][best].astype(np.int64)),
            "d2": pa.array(
                d2[np.arange(len(ids)), best].astype(np.int64)),
        })

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ds.map_batches(assign, batch_format="pyarrow")


def sql_kmeans_iter1() -> str:
    quant = "CAST(floor(CAST({e}[i] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)"
    ev = quant.format(e="e.embedding")
    ec = quant.format(e="c.embedding")
    return (
        f"WITH cents AS (SELECT vec_id AS cid, embedding FROM embeddings "
        f"WHERE vec_id < {KMEANS_K}), "
        f"d AS (SELECT e.vec_id, c.cid, "
        f"CAST(SUM(({ev} - {ec}) * ({ev} - {ec})) AS BIGINT) AS d2 "
        f"FROM embeddings e CROSS JOIN cents c, "
        f"UNNEST(range(1, {EMBED_DIM + 1})) AS t(i) "
        f"GROUP BY e.vec_id, c.cid) "
        f"SELECT vec_id, cid AS cluster, d2 FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY vec_id "
        f"ORDER BY d2, cid) AS rn FROM d) WHERE rn = 1"
    )


QUERIES["kmeans_iter1"] = q_kmeans_iter1
ORACLES["kmeans_iter1"] = sql_kmeans_iter1()


# --- SemDeDup: semantic deduplication inside coarse clusters -----------------

SEMDEDUP_TAU = 0.30


def q_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): drop documents
    whose embedding is semantically near-identical to an earlier one in
    the SAME coarse cluster.  Output one row per vector: (vec_id,
    centroid, max_sim_prev, keep) where max_sim_prev is the max cosine
    to any smaller-id vector of the cluster (-1.0 when none) and
    keep = max_sim_prev < tau (first occurrence wins, the same
    canonical-winner convention as ``dedup_exact``).

    Shape: the deterministic coarse quantizer assigns each vector to a
    centroid (broadcast matrix, one matmul per batch), then ONE
    bucketed exchange on centroid moves (vec_id, centroid, quantized
    embedding bytes) — per-cluster pairwise similarity is the paper's
    own within-cluster cost, bounded by cluster size (at scale k grows
    with N so clusters stay O(N/k); the corpus text never moves).
    Exactness: integer dot matrix / sqrt of float64 norm product is
    bit-identical to the SQL oracle (each a single exactly-rounded op).
    """
    import ray

    from ..stages.shuffle import bucketed_apply
    from ..stages.spatial import worker_cached

    c_ids, c_mat = _load_small_side(sf_dir, N_CENTROIDS)
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
                self.c_n2[:, None] * n2[None, :])
            best = np.argmax(sims, axis=0)
            # one contiguous buffer -> fixed-size-binary column (no
            # per-row Python tobytes loop)
            emb = pa.Array.from_buffers(
                pa.binary(EMBED_DIM * 8), len(ids),
                [None, pa.py_buffer(np.ascontiguousarray(mat).tobytes())])
            return pa.table(
                {
                    "vec_id": pa.array(ids),
                    "centroid": pa.array(self.c_ids[best]),
                    "emb": emb,
                }
            )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    assigned = ds.map_batches(
        worker_cached(("semdedup_assign", cref.hex()), Assign),
        batch_format="pyarrow")

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for cid, grp in g.groupby("centroid", sort=False):
            grp = grp.sort_values("vec_id")
            m = len(grp)
            mat = np.frombuffer(
                b"".join(grp["emb"]), dtype=np.int64
            ).reshape(m, EMBED_DIM).astype(np.float64)
            dot = mat @ mat.T                      # exact: |dot| < 2^53
            n2 = (mat * mat).sum(axis=1)
            sims = dot / np.sqrt(n2[:, None] * n2[None, :])
            prev = np.where(np.tri(m, k=-1, dtype=bool), sims, -np.inf)
            mx = prev.max(axis=1, initial=-np.inf)
            mx = np.where(np.isfinite(mx), mx, -1.0)
            outs.append(pd.DataFrame(
                {
                    "vec_id": grp["vec_id"].to_numpy(),
                    "centroid": np.full(m, cid, dtype=np.int64),
                    "max_sim_prev": mx,
                    "keep": (mx < SEMDEDUP_TAU).astype(np.int64),
                }
            ))
        if not outs:
            return pd.DataFrame(
                {"vec_id": pd.Series(dtype=np.int64),
                 "centroid": pd.Series(dtype=np.int64),
                 "max_sim_prev": pd.Series(dtype=np.float64),
                 "keep": pd.Series(dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    return bucketed_apply(assigned, ["centroid"], dedup)


def sql_semdedup() -> str:
    quant = "CAST(floor(CAST({e}[i] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)"
    ev = quant.format(e="e.embedding")
    ec = quant.format(e="c.embedding")
    qa = quant.format(e="a.embedding")
    qb = quant.format(e="b.embedding")
    return (
        f"WITH cents AS (SELECT vec_id AS cid, embedding FROM embeddings "
        f"WHERE vec_id < {N_CENTROIDS}), "
        f"adots AS (SELECT e.vec_id, c.cid, SUM({ev} * {ec}) AS dot, "
        f"SUM({ev} * {ev}) AS ne, SUM({ec} * {ec}) AS nc "
        f"FROM embeddings e CROSS JOIN cents c, "
        f"UNNEST(range(1, {EMBED_DIM + 1})) AS t(i) GROUP BY e.vec_id, c.cid), "
        f"asims AS (SELECT vec_id, cid, CAST(dot AS DOUBLE) / "
        f"sqrt(CAST(ne AS DOUBLE) * CAST(nc AS DOUBLE)) AS sim FROM adots), "
        f"asg AS (SELECT vec_id, cid AS centroid FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY vec_id "
        f"ORDER BY sim DESC, cid) AS rn FROM asims) WHERE rn = 1), "
        f"pd AS (SELECT b.vec_id AS bi, SUM({qa} * {qb}) AS dot, "
        f"SUM({qa} * {qa}) AS na, SUM({qb} * {qb}) AS nb "
        f"FROM embeddings a JOIN asg sa ON sa.vec_id = a.vec_id "
        f"JOIN asg sb ON sb.centroid = sa.centroid "
        f"AND a.vec_id < sb.vec_id "
        f"JOIN embeddings b ON b.vec_id = sb.vec_id, "
        f"UNNEST(range(1, {EMBED_DIM + 1})) AS t(i) "
        f"GROUP BY a.vec_id, b.vec_id), "
        f"mx AS (SELECT bi, MAX(CAST(dot AS DOUBLE) / "
        f"sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) AS ms "
        f"FROM pd GROUP BY bi) "
        f"SELECT asg.vec_id, CAST(asg.centroid AS BIGINT) AS centroid, "
        f"COALESCE(mx.ms, -1.0) AS max_sim_prev, "
        f"CAST(COALESCE(mx.ms, -1.0) < {SEMDEDUP_TAU} AS BIGINT) AS keep "
        f"FROM asg LEFT JOIN mx ON mx.bi = asg.vec_id"
    )


QUERIES["semdedup"] = q_semdedup
ORACLES["semdedup"] = sql_semdedup()


# --- Product quantization: PQ encode + ADC search ---------------------------
#
# Jegou et al. 2011 ("Product Quantization for Nearest Neighbor
# Search"): vectors split into PQ_M subspaces, each subvector encoded
# as its nearest codebook entry, and queries scored with Asymmetric
# Distance Computation — a per-subspace lookup table of exact query->
# codeword distances, so scoring a database vector is PQ_M table
# lookups + adds instead of an EMBED_DIM-wide arithmetic pass.  The
# memory story at 10^12 vectors is the point: PQ_M uint8 codes per
# vector instead of EMBED_DIM floats.
#
# The codebook here is DETERMINISTIC — the subvectors of the first
# PQ_K vectors (the embed_ivf first-N convention; a trained codebook
# would run the kmeans machinery per subspace).  All arithmetic is
# integer-quantized, so codes, distance tables and ADC sums are exact
# int64 and the DuckDB oracle replays the FULL chain (codebook, code
# assignment with smallest-code tie-break, ADC scoring, ranking)
# hash-exact.
#
# Distributed shape: the codebook + query distance tables broadcast
# once via ray.put (PQ_M x PQ_K ints per query — independent of corpus
# size); encode+score is one stateful map_batches pass emitting each
# batch's per-query top-k partials; one bucketed exchange finishes the
# global top-k per query.  No shuffle touches the corpus itself.

PQ_M = 4          # subspaces
PQ_SUBD = EMBED_DIM // PQ_M
PQ_K = 8          # codes per subspace
PQ_NQ = 3         # query vectors (vec_id < PQ_NQ)
PQ_TOPK = 4


def q_pq_search(sf_dir: str):
    """ADC top-k per query over PQ-encoded vectors:
    (query_id, vec_id, adist, rank)."""
    import ray

    cb_ids, cb_mat = _load_small_side(sf_dir, PQ_K)
    q_ids, q_mat = _load_small_side(sf_dir, PQ_NQ)
    cb = cb_mat.reshape(PQ_K, PQ_M, PQ_SUBD)
    qs = q_mat.reshape(len(q_ids), PQ_M, PQ_SUBD)
    # query distance tables qd[q, m, c] = ||q_m - cb[c]_m||^2 (int64)
    diff = qs[:, None, :, :] - cb[None, :, :, :]
    qd = (diff * diff).sum(axis=3).transpose(0, 2, 1)
    cref = ray.put({"cb": cb, "qd": qd, "q_ids": q_ids})

    class EncodeScore:
        def __init__(self):
            d = ray.get(cref)
            self.cb = d["cb"]
            self.qd = d["qd"]
            self.q_ids = d["q_ids"]

        def __call__(self, b: pa.Table) -> pa.Table:
            ids, mat = _embed_matrix(b)
            v = mat.reshape(len(ids), PQ_M, PQ_SUBD)
            d2 = ((v[:, None, :, :] - self.cb[None, :, :, :]) ** 2
                  ).sum(axis=3)                      # (N, K, M)
            # argmin picks the FIRST minimum -> smallest code id on
            # ties, matching the oracle's ORDER BY d, code
            codes = np.argmin(d2, axis=1)            # (N, M)
            picked = self.qd[:, np.arange(PQ_M)[None, :], codes]
            adist = picked.sum(axis=2)               # (Q, N)
            k = min(PQ_TOPK, adist.shape[1])
            # PQ codes collapse many vectors onto identical code tuples,
            # so exact adist TIES are the norm — the batch partial must
            # use the same (adist, vec_id) tie-break as the global
            # finish, or a tie split across batches drops the winner
            out_q, out_v, out_a = [], [], []
            for qi in range(len(self.q_ids)):
                row = adist[qi]
                ordk = np.lexsort((ids, row))[:k]
                out_q.append(np.full(k, self.q_ids[qi], np.int64))
                out_v.append(ids[ordk])
                out_a.append(row[ordk].astype(np.int64))
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "adist": pa.array(np.concatenate(out_a)),
            })

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    from ..stages.spatial import worker_cached

    cands = ds.map_batches(
        worker_cached(("pq_search", cref.hex()), EncodeScore),
        batch_format="pyarrow", batch_size=4096)

    from ..stages.shuffle import bucketed_apply

    def topk(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["adist", "vec_id"])
        out = b.groupby("query_id", as_index=False, sort=False) \
            .head(PQ_TOPK).copy()
        out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
        return out

    return bucketed_apply(cands, ["query_id"], topk, n_buckets=4)


def sql_pq_search() -> str:
    quant = ("CAST(floor(CAST({e}[CAST(i AS INTEGER)] AS DOUBLE) "
             "* 10000.0 + 0.5) AS BIGINT)")
    ev = quant.format(e="e.embedding")
    ec = quant.format(e="c.embedding")
    return (
        f"WITH cb AS (SELECT vec_id AS code, embedding FROM embeddings "
        f"WHERE vec_id < {PQ_K}), "
        f"ms AS (SELECT UNNEST(range(0, {PQ_M})) AS m), "
        f"dmc AS (SELECT e.vec_id, ms.m, c.code, "
        f"SUM(({ev} - {ec}) * ({ev} - {ec})) AS d "
        f"FROM embeddings e CROSS JOIN cb c CROSS JOIN ms, "
        f"UNNEST(range(ms.m * {PQ_SUBD} + 1, "
        f"ms.m * {PQ_SUBD} + {PQ_SUBD} + 1)) AS t(i) "
        f"GROUP BY e.vec_id, ms.m, c.code), "
        f"codes AS (SELECT vec_id, m, code FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY vec_id, m "
        f"ORDER BY d, code) AS rn FROM dmc) WHERE rn = 1), "
        f"qd AS (SELECT vec_id AS qid, m, code, d FROM dmc "
        f"WHERE vec_id < {PQ_NQ}), "
        f"ad AS (SELECT qd.qid AS query_id, cd.vec_id, "
        f"CAST(SUM(qd.d) AS BIGINT) AS adist "
        f"FROM codes cd JOIN qd ON qd.m = cd.m AND qd.code = cd.code "
        f"GROUP BY qd.qid, cd.vec_id) "
        f"SELECT query_id, vec_id, adist, CAST(rn AS BIGINT) AS rank "
        f"FROM (SELECT *, row_number() OVER (PARTITION BY query_id "
        f"ORDER BY adist, vec_id) AS rn FROM ad) WHERE rn <= {PQ_TOPK}"
    )


QUERIES["pq_search"] = q_pq_search
ORACLES["pq_search"] = sql_pq_search()
