"""PageRank over the synthetic link graph: checked against a plain
numpy dense power iteration on a GAPPY id space (non-existent dst
candidates removed, dangling pages redistributing mass) plus the
rank-conservation invariant.  The DuckDB hash-exact gate runs
separately via tools/check_oracles.py."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from osmquadtree_depreceated_ray.pipelines.queries_graph import (
    PR_DAMPING,
    PR_ITERS,
    PR_LINKS,
    PR_QUANT,
    _A,
    _B,
    _C,
    pagerank,
)


def _dense_reference(ids: np.ndarray, iters: int):
    """O(V^2) dense PageRank with the same edge synthesis."""
    ids = np.sort(ids)
    idx = {v: i for i, v in enumerate(ids)}
    mod = ids.max() + 1
    n = len(ids)
    edges = set()
    for s in ids:
        for j in range(PR_LINKS):
            d = (s * _A + j * _B + _C) % mod
            if d != s and d in idx:
                edges.add((s, d))
    outdeg = np.zeros(n, np.int64)
    for s, _ in edges:
        outdeg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, d in edges:
            contrib[idx[d]] += r[idx[s]] / outdeg[idx[s]]
        dang = r[outdeg == 0].sum()
        r = (1 - PR_DAMPING) / n + PR_DAMPING * (contrib + dang / n)
    return ids, outdeg, r


@pytest.mark.parametrize("gappy", [False, True])
def test_pagerank_matches_dense_reference(ray_session, gappy):
    import ray.data

    rng = np.random.default_rng(7)
    if gappy:
        # sparse id space: many candidate dsts don't exist -> low
        # out-degrees and genuine dangling pages
        ids = np.unique(rng.integers(0, 5000, size=220).astype(np.int64))
    else:
        ids = np.arange(300, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"doc_id": ids})).repartition(5)
    got = pagerank(ds).to_pandas().sort_values("doc_id")

    want_ids, want_deg, want_r = _dense_reference(ids, PR_ITERS)
    assert np.array_equal(got["doc_id"].to_numpy(), want_ids)
    assert np.array_equal(got["out_links"].to_numpy(), want_deg)
    want_q = np.floor(want_r * PR_QUANT + 0.5).astype(np.int64)
    # both sides sum float contributions (in different orders): allow
    # the last quantized digit to differ
    assert np.abs(got["pagerank_q12"].to_numpy() - want_q).max() <= 1
    if gappy:
        assert (want_deg == 0).any(), "fixture should have dangling pages"

    # conservation: ranks are a distribution (teleport + dangling
    # redistribution keep total mass exactly 1)
    total = got["pagerank_q12"].sum() / PR_QUANT
    assert abs(total - 1.0) < 1e-6


def test_pagerank_empty(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
    out = pagerank(ds)
    # (Dataset.to_pandas() drops columns on zero-row datasets — assert
    # on the Dataset schema, which is authoritative)
    assert out.schema().names == ["doc_id", "out_links", "pagerank_q12"]
    assert out.count() == 0


@pytest.mark.parametrize("gappy", [False, True])
def test_triangles_match_adjacency_cube(ray_session, gappy):
    """Per-node triangle counts equal diag(A^3)/2 of the undirected
    adjacency matrix built with the same edge synthesis."""
    import ray.data

    from osmquadtree_depreceated_ray.pipelines.queries_graph import (
        q_triangles,  # noqa: F401  (query needs a dir; use pagerank-style direct call)
    )
    from osmquadtree_depreceated_ray.pipelines import queries_graph as qg

    rng = np.random.default_rng(13)
    if gappy:
        ids = np.unique(rng.integers(0, 2000, size=180).astype(np.int64))
    else:
        ids = np.arange(250, dtype=np.int64)
    # dense reference
    mod = ids.max() + 1
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n), np.int64)
    for s in ids:
        for j in range(qg.PR_LINKS):
            d = (s * qg._A + j * qg._B + qg._C) % mod
            if d != s and d in idx:
                A[idx[s], idx[d]] = 1
                A[idx[d], idx[s]] = 1
    want = np.diag(A @ A @ A) // 2

    # drive the distributed path on a temp parquet dir
    import pyarrow.parquet as _pq
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        _pq.write_table(pa.table({"doc_id": ids,
                                  "text": [""] * n}),
                        os.path.join(td, "documents.parquet"))
        got = qg.q_triangles(td).to_pandas().sort_values("doc_id")
    assert np.array_equal(got["doc_id"].to_numpy(), np.sort(ids))
    assert np.array_equal(got["n_tri"].to_numpy(), want)


@pytest.mark.parametrize("gappy", [False, True])
def test_link_predict_matches_adjacency_square(ray_session, gappy):
    """CN candidates equal {(b,c): b<c, A[b,c]=0, (A^2)[b,c] >= 2}.
    The dense-id case includes reciprocal directed links (a->b and
    b->a both synthesised) — the duplicate-undirected-edge regression."""
    from osmquadtree_depreceated_ray.pipelines import queries_graph as qg

    rng = np.random.default_rng(17)
    if gappy:
        ids = np.unique(rng.integers(0, 2000, size=180).astype(np.int64))
    else:
        ids = np.arange(250, dtype=np.int64)
    mod = ids.max() + 1
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n), np.int64)
    for s in ids:
        for j in range(qg.PR_LINKS):
            d = (s * qg._A + j * qg._B + qg._C) % mod
            if d != s and d in idx:
                A[idx[s], idx[d]] = 1
                A[idx[d], idx[s]] = 1
    C = A @ A
    want = []
    for i in range(n):
        for k in range(i + 1, n):
            if A[i, k] == 0 and C[i, k] >= qg.LP_MIN_COMMON:
                want.append((ids[i], ids[k], C[i, k]))
    want = sorted(want)

    import pyarrow.parquet as _pq
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        _pq.write_table(pa.table({"doc_id": ids, "text": [""] * n}),
                        os.path.join(td, "documents.parquet"))
        got = qg.q_link_predict(td).to_pandas() \
            .sort_values(["src", "dst"]).reset_index(drop=True)
    assert list(map(tuple, got.to_numpy())) == want


def test_clustering_coef_matches_dense(ray_session):
    from osmquadtree_depreceated_ray.pipelines import queries_graph as qg

    ids = np.arange(250, dtype=np.int64)
    mod = ids.max() + 1
    n = len(ids)
    A = np.zeros((n, n), np.int64)
    for s in ids:
        for j in range(qg.PR_LINKS):
            d = (s * qg._A + j * qg._B + qg._C) % mod
            if d != s:
                A[s, d] = 1
                A[d, s] = 1
    tri = np.diag(A @ A @ A) // 2
    deg = A.sum(axis=1)
    coef = np.where(deg >= 2, 2.0 * tri / np.maximum(deg * (deg - 1), 1),
                    0.0)
    want_q = np.floor(coef * qg.PR_QUANT + 0.5).astype(np.int64)

    import pyarrow.parquet as _pq
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        _pq.write_table(pa.table({"doc_id": ids, "text": [""] * n}),
                        os.path.join(td, "documents.parquet"))
        got = qg.q_clustering(td).to_pandas().sort_values("doc_id")
    assert np.array_equal(got["degree"].to_numpy(), deg)
    assert np.array_equal(got["n_tri"].to_numpy(), tri)
    assert np.array_equal(got["coef_q12"].to_numpy(), want_q)


def test_trustrank_matches_dense_reference(ray_session):
    """Seed-teleport power iteration vs a dense numpy reference; trust
    must decay with distance (non-seed max < seed min is NOT generally
    true, but total mass is 1 and non-reachable pages get 0)."""
    from osmquadtree_depreceated_ray.pipelines import queries_graph as qg

    ids = np.arange(200, dtype=np.int64)
    mod = ids.max() + 1
    n = len(ids)
    A = np.zeros((n, n))
    outdeg = np.zeros(n, np.int64)
    for s in ids:
        for j in range(qg.PR_LINKS):
            d = (s * qg._A + j * qg._B + qg._C) % mod
            if d != s and A[s, d] == 0:
                A[s, d] = 1
                outdeg[s] += 1
    seed = (ids % qg.TRUST_SEED_MOD == 0).astype(float)
    sv = seed / seed.sum()
    r = sv.copy()
    for _ in range(qg.PR_ITERS):
        contrib = np.zeros(n)
        for s in ids:
            if outdeg[s]:
                contrib += A[s] * (r[s] / outdeg[s])
        dang = r[outdeg == 0].sum()
        r = (1 - qg.PR_DAMPING) * sv + qg.PR_DAMPING * (contrib + dang * sv)
    want_q = np.floor(r * qg.PR_QUANT + 0.5).astype(np.int64)

    import pyarrow.parquet as _pq
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        _pq.write_table(pa.table({"doc_id": ids, "text": [""] * n}),
                        os.path.join(td, "documents.parquet"))
        got = qg.q_trustrank(td).to_pandas().sort_values("doc_id")
    assert np.array_equal(got["is_seed"].to_numpy(),
                          seed.astype(np.int64))
    assert np.abs(got["trust_q12"].to_numpy() - want_q).max() <= 1
    # mass conservation
    assert abs(got["trust_q12"].sum() / qg.PR_QUANT - 1.0) < 1e-6


@pytest.mark.parametrize("gappy", [False, True])
def test_hits_matches_dense_reference(ray_session, gappy):
    """Unnormalized integer HITS vs a dense adjacency-matrix reference:
    a_t = A^T h_{t-1}, h_t = A a_t — exact int64 equality."""
    from osmquadtree_depreceated_ray.pipelines import queries_graph as qg

    rng = np.random.default_rng(11)
    if gappy:
        ids = np.unique(rng.integers(0, 4000, size=180).astype(np.int64))
    else:
        ids = np.arange(250, dtype=np.int64)
    ids = np.sort(ids)
    idx = {v: i for i, v in enumerate(ids)}
    mod = ids.max() + 1
    n = len(ids)
    A = np.zeros((n, n), np.int64)
    for s in ids:
        for j in range(qg.PR_LINKS):
            d = (s * qg._A + j * qg._B + qg._C) % mod
            if d != s and d in idx:
                A[idx[s], idx[d]] = 1
    h = np.ones(n, np.int64)
    a = np.zeros(n, np.int64)
    for _ in range(qg.HITS_ITERS):
        a = A.T @ h
        h = A @ a

    import pyarrow.parquet as _pq
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        _pq.write_table(pa.table({"doc_id": ids, "text": [""] * n}),
                        os.path.join(td, "documents.parquet"))
        got = qg.q_hits(td).to_pandas().sort_values("doc_id")
    assert np.array_equal(got["doc_id"].to_numpy(), ids)
    assert np.array_equal(got["hub_score"].to_numpy(), h)
    assert np.array_equal(got["auth_score"].to_numpy(), a)


def test_hits_empty(ray_session):
    from osmquadtree_depreceated_ray.pipelines import queries_graph as qg

    import pyarrow.parquet as _pq
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        _pq.write_table(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())}),
            os.path.join(td, "documents.parquet"))
        out = qg.q_hits(td)
        assert out.schema().names == ["doc_id", "hub_score", "auth_score"]
        assert out.count() == 0


def test_label_prop_matches_dense(ray_session):
    """LPA vs a literal per-node Python reimplementation of the same
    synchronous min-tie rounds on the sf0.001 synthesized graph."""
    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines.queries_graph import (
        LPA_ITERS,
        q_label_prop,
    )

    sf = "/root/testdata/sf0.001"
    ids = np.sort(pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id"])
        .column("doc_id").to_numpy().astype(np.int64))
    mod = ids.max() + 1
    idset = set(ids.tolist())
    und = set()
    for s in ids.tolist():
        for j in range(PR_LINKS):
            d = (s * _A + j * _B + _C) % mod
            if d != s and d in idset:
                und.add((min(s, d), max(s, d)))
    nbrs = {v: [] for v in ids.tolist()}
    for a, b in und:
        nbrs[a].append(b)
        nbrs[b].append(a)
    lab = {v: v for v in ids.tolist()}
    from collections import Counter

    for _ in range(LPA_ITERS):
        new = {}
        for v in ids.tolist():
            if not nbrs[v]:
                new[v] = lab[v]
                continue
            c = Counter(lab[u] for u in nbrs[v])
            top = max(c.values())
            new[v] = min(k for k, n in c.items() if n == top)
        lab = new
    got = (q_label_prop(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert (got["doc_id"].to_numpy() == ids).all()
    exp = np.array([lab[v] for v in ids.tolist()], np.int64)
    assert (got["community"].to_numpy() == exp).all()
    # communities actually merge: strictly fewer labels than nodes
    assert got["community"].nunique() < len(ids)


def test_bfs_dist_matches_dense(ray_session):
    """Multi-source BFS vs a literal Python frontier expansion on the
    sf0.001 synthesized graph."""
    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines.queries_graph import (
        BFS_ROUNDS,
        BFS_SEED_MOD,
        q_bfs_dist,
    )

    sf = "/root/testdata/sf0.001"
    ids = np.sort(pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id"])
        .column("doc_id").to_numpy().astype(np.int64))
    mod = ids.max() + 1
    idset = set(ids.tolist())
    nbrs = {v: set() for v in ids.tolist()}
    for s in ids.tolist():
        for j in range(PR_LINKS):
            d = (s * _A + j * _B + _C) % mod
            if d != s and d in idset:
                nbrs[s].add(d)
                nbrs[d].add(s)
    dist = {v: (0 if v % BFS_SEED_MOD == 0 else -1)
            for v in ids.tolist()}
    for t in range(1, BFS_ROUNDS + 1):
        frontier = [v for v, dd in dist.items() if dd == t - 1]
        for v in frontier:
            for u in nbrs[v]:
                if dist[u] == -1:
                    dist[u] = t
    got = (q_bfs_dist(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert (got["doc_id"].to_numpy() == ids).all()
    exp = np.array([dist[v] for v in ids.tolist()], np.int64)
    assert (got["dist"].to_numpy() == exp).all()
    # fixture is meaningful: some seeds, some multi-hop, some unreached
    assert (exp == 0).any() and (exp >= 2).any()


def test_graph_cc_matches_union_find(ray_session):
    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines.queries_graph import (
        q_graph_cc,
    )

    sf = "/root/testdata/sf0.001"
    ids = np.sort(pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id"])
        .column("doc_id").to_numpy().astype(np.int64))
    mod = ids.max() + 1
    idset = set(ids.tolist())
    parent = {v: v for v in ids.tolist()}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s in ids.tolist():
        for j in range(PR_LINKS):
            d = (s * _A + j * _B + _C) % mod
            if d != s and d in idset:
                ra, rb = find(s), find(d)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    exp = {v: find(v) for v in ids.tolist()}
    got = (q_graph_cc(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert (got["doc_id"].to_numpy() == ids).all()
    assert (got["component"].to_numpy()
            == np.array([exp[v] for v in ids.tolist()], np.int64)).all()
    assert ((got["component"] == got["doc_id"]).astype(int)
            == got["is_canonical"]).all()


def test_kcore_matches_dense(ray_session):
    """Distributed peel vs a literal per-node Python reimplementation
    of KCORE_ROUNDS synchronous rounds on the sf0.001 variable-degree
    synthesized graph."""
    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines.queries_graph import (
        KC_LINKS,
        KCORE_K,
        KCORE_ROUNDS,
        q_kcore,
    )

    sf = "/root/testdata/sf0.001"
    ids = np.sort(pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id"])
        .column("doc_id").to_numpy().astype(np.int64))
    mod = ids.max() + 1
    idset = set(ids.tolist())
    und = set()
    for s in ids.tolist():
        for j in range(1 + s % KC_LINKS):
            d = (s * _A + j * _B + _C) % mod
            if d != s and d in idset:
                und.add((min(s, d), max(s, d)))
    nbrs = {v: set() for v in ids.tolist()}
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    alive = set(ids.tolist())
    peeled_any = 0
    for _ in range(KCORE_ROUNDS):
        dead = {v for v in alive
                if sum(1 for u in nbrs[v] if u in alive) < KCORE_K}
        peeled_any += len(dead)
        alive -= dead
    exp = {v: sum(1 for u in nbrs[v] if u in alive)
           for v in sorted(alive)}
    got = (q_kcore(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == sorted(exp)
    assert got["core_deg"].tolist() == [exp[v] for v in sorted(exp)]
    # the cascade is non-trivial: some nodes peel, some survive
    assert peeled_any > 0 and len(exp) > 0
    # every survivor meets the core bound after the final full round
    # EXCEPT possibly nodes whose neighbours died in the last round;
    # at KCORE_ROUNDS=fixpoint for this fixture all meet it
    assert min(exp.values()) >= 0


def test_anchor_agg_matches_pandas(ray_session):
    """Anchor rollup vs a direct pandas recompute of the same derived
    edges on sf0.001 (pins modal min-tie + distinct-anchor counting)."""
    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines.queries_graph import (
        ANCHOR_VOCAB,
        q_anchor_agg,
    )

    sf = "/root/testdata/sf0.001"
    ids = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"]) \
        .column("doc_id").to_numpy().astype(np.int64)
    mod = ids.max() + 1
    idset = set(ids.tolist())
    rows = set()
    for s in ids.tolist():
        for j in range(PR_LINKS):
            d = (s * _A + j * _B + _C) % mod
            if d != s and d in idset:
                rows.add((s, d))
    df = pd.DataFrame(sorted(rows), columns=["src", "dst"])
    df["anchor"] = np.asarray(ANCHOR_VOCAB, object)[
        (df["src"] * 3 + df["dst"]) % len(ANCHOR_VOCAB)]
    g = df.groupby(["dst", "anchor"], as_index=False).size()
    tot = g.groupby("dst").agg(n_inlinks=("size", "sum"),
                               n_anchors=("anchor", "size"))
    top = (g.sort_values(["dst", "size", "anchor"],
                         ascending=[True, False, True], kind="stable")
           .drop_duplicates("dst").set_index("dst")["anchor"])
    got = (q_anchor_agg(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == tot.index.tolist()
    assert got["n_inlinks"].tolist() == tot["n_inlinks"].tolist()
    assert got["n_anchors"].tolist() == tot["n_anchors"].tolist()
    assert got["top_anchor"].tolist() == top.tolist()


def test_random_walks_matches_dense(ray_session):
    """Distributed min-hash walks vs a per-walk Python replay on the
    sf0.001 graph (pins the hash-choice + tie rule + dead-end stop)."""
    import hashlib

    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines.queries_graph import (
        WALK_SEED_MOD,
        WALK_STEPS,
        q_random_walks,
    )

    sf = "/root/testdata/sf0.001"
    ids = np.sort(pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id"])
        .column("doc_id").to_numpy().astype(np.int64))
    mod = ids.max() + 1
    idset = set(ids.tolist())
    nbrs = {v: set() for v in ids.tolist()}
    for s in ids.tolist():
        for j in range(PR_LINKS):
            d = (s * _A + j * _B + _C) % mod
            if d != s and d in idset:
                nbrs[s].add(d)
                nbrs[d].add(s)

    def h(cur, t, nxt):
        return int.from_bytes(
            hashlib.md5(f"{cur}:{t}:{nxt}".encode()).digest()[8:16],
            "little")

    exp = []
    for start in ids.tolist():
        if start % WALK_SEED_MOD:
            continue
        cur = start
        exp.append((start, 0, cur))
        for t in range(1, WALK_STEPS + 1):
            if not nbrs[cur]:
                break
            cur = min(nbrs[cur], key=lambda u: (h(cur, t, u), u))
            exp.append((start, t, cur))
    got = (q_random_walks(sf).to_pandas()
           .sort_values(["start", "step"]).reset_index(drop=True))
    assert list(map(tuple, got.to_numpy())) == sorted(exp)


def test_sssp_matches_dense(ray_session):
    """Weighted frontier-relaxed SSSP vs a literal Python synchronous
    Bellman-Ford on the sf0.001 synthesized graph."""
    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines.queries_graph import (
        SSSP_ROUNDS,
        SSSP_SEED_MOD,
        SSSP_WMOD,
        q_sssp,
    )

    sf = "/root/testdata/sf0.001"
    ids = np.sort(pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id"])
        .column("doc_id").to_numpy().astype(np.int64))
    mod = ids.max() + 1
    idset = set(ids.tolist())
    nbrs = {v: set() for v in ids.tolist()}
    for s in ids.tolist():
        for j in range(PR_LINKS):
            d = (s * _A + j * _B + _C) % mod
            if d != s and d in idset:
                nbrs[s].add(d)
                nbrs[d].add(s)

    def w(a, b):
        lo, hi = (a, b) if a < b else (b, a)
        return 1 + (lo * 31 + hi * 17) % SSSP_WMOD

    INF = float("inf")
    dist = {v: (0 if v % SSSP_SEED_MOD == 0 else INF)
            for v in ids.tolist()}
    for _ in range(SSSP_ROUNDS):
        prev = dict(dist)
        for v in ids.tolist():
            if prev[v] == INF:
                continue
            for u in nbrs[v]:
                cand = prev[v] + w(v, u)
                if cand < dist[u]:
                    dist[u] = cand
    got = (q_sssp(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert (got["doc_id"].to_numpy() == ids).all()
    exp = np.array([-1 if dist[v] == INF else dist[v]
                    for v in ids.tolist()], np.int64)
    assert (got["dist"].to_numpy() == exp).all()
    # fixture is meaningful: seeds at 0 and genuinely weighted
    # multi-hop costs (values exceed the round count, so these are
    # edge-cost sums, not hop counts)
    assert (exp == 0).any()
    assert (exp > SSSP_ROUNDS).any()
    assert len(np.unique(exp[exp > 0])) > 3


def test_assortativity_matches_dense(ray_session):
    import math

    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines.queries_graph import (
        PR_LINKS,
        _A,
        _B,
        _C,
        q_assortativity,
    )

    sf = "/root/testdata/sf0.001"
    ids = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"]
                        ).column("doc_id").to_numpy().astype(np.int64)
    mod = int(ids.max()) + 1
    src = np.repeat(ids, PR_LINKS)
    j = np.tile(np.arange(PR_LINKS, dtype=np.int64), len(ids))
    dst = (src * _A + j * _B + _C) % mod
    keep = (dst != src) & np.isin(dst, ids)
    e = (pd.DataFrame({"src": src[keep], "dst": dst[keep]})
         .drop_duplicates())
    x = e.groupby("src")["dst"].transform("size").to_numpy(np.int64)
    y = e.groupby("dst")["src"].transform("size").to_numpy(np.int64)
    n = len(e)
    num = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
    dx = n * int((x * x).sum()) - int(x.sum()) ** 2
    dy = n * int((y * y).sum()) - int(y.sum()) ** 2
    exp = float(num) / math.sqrt(float(dx * dy))
    got = q_assortativity(sf).to_pandas()
    assert int(got["n_edges"].iloc[0]) == n
    assert got["assort"].iloc[0] == exp  # bit-exact: fixed-order floats
    # fixture is meaningful: degrees genuinely vary on both axes
    assert len(np.unique(x)) > 1 and len(np.unique(y)) > 1
    assert abs(exp) > 1e-6


def test_assortativity_empty(ray_session):
    import os
    import tempfile

    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines.queries_graph import (
        q_assortativity,
    )

    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table({"doc_id": pa.array([], pa.int64())}),
            os.path.join(td, "documents.parquet"))
        got = q_assortativity(td).to_pandas()
        assert int(got["n_edges"].iloc[0]) == 0
        assert pd.isna(got["assort"].iloc[0])


def test_reciprocity_matches_dense(ray_session):
    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines.queries_graph import (
        PR_LINKS,
        PR_QUANT_INT,
        _A,
        _B,
        _C,
        q_reciprocity,
    )

    sf = "/root/testdata/sf0.001"
    ids = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"]
                        ).column("doc_id").to_numpy().astype(np.int64)
    mod = int(ids.max()) + 1
    src = np.repeat(ids, PR_LINKS)
    j = np.tile(np.arange(PR_LINKS, dtype=np.int64), len(ids))
    dst = (src * _A + j * _B + _C) % mod
    keep = (dst != src) & np.isin(dst, ids)
    e = (pd.DataFrame({"src": src[keep], "dst": dst[keep]})
         .drop_duplicates())
    es = set(zip(e["src"].tolist(), e["dst"].tolist()))
    nr = sum((d, s) in es for s, d in es)
    ne = len(es)
    got = q_reciprocity(sf).to_pandas()
    assert int(got["n_edges"].iloc[0]) == ne
    assert int(got["n_recip"].iloc[0]) == nr
    assert int(got["recip_q12"].iloc[0]) == \
        (2 * nr * PR_QUANT_INT + ne) // (2 * ne)
    assert ne > 0


def test_two_hop_matches_dense(ray_session):
    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines.queries_graph import (
        PR_LINKS,
        _A,
        _B,
        _C,
        q_two_hop,
    )

    sf = "/root/testdata/sf0.001"
    ids = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"]
                        ).column("doc_id").to_numpy().astype(np.int64)
    mod = int(ids.max()) + 1
    src = np.repeat(ids, PR_LINKS)
    j = np.tile(np.arange(PR_LINKS, dtype=np.int64), len(ids))
    dst = (src * _A + j * _B + _C) % mod
    keep = (dst != src) & np.isin(dst, ids)
    adj = {}
    for s, d in zip(src[keep].tolist(), dst[keep].tolist()):
        adj.setdefault(s, set()).add(d)
    got = (q_two_hop(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert (got["doc_id"].to_numpy() == ids).all()
    for v, exp_row in zip(ids.tolist(), got["n_2hop"].tolist()):
        reach = set(adj.get(v, ()))
        for u in list(reach):
            reach |= adj.get(u, set())
        reach.discard(v)
        assert exp_row == len(reach), v
    # the expansion is real: 2-hop counts exceed out-degree somewhere
    deg = np.array([len(adj.get(v, ())) for v in ids.tolist()])
    assert (got["n_2hop"].to_numpy() > deg).any()
