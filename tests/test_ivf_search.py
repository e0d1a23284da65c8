"""IVF probe-limited ANN search (queries_embed.q_ivf_search): results
must equal the brute-force top-k RESTRICTED to each query's probed
inverted lists, computed independently with numpy here.  The DuckDB
hash-exact gate runs separately via tools/check_oracles.py."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _quantized(sf):
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    flat = np.asarray(t.column("embedding").combine_chunks().flatten(),
                      np.float64)
    mat = np.floor(flat * 10000.0 + 0.5).reshape(len(ids), -1)
    order = np.argsort(ids)
    return ids[order], mat[order]


def test_ivf_search_matches_restricted_bruteforce(ray_session):
    from osmquadtree_depreceated_ray.pipelines.queries_embed import (
        IVF_NQ, IVF_PROBE, IVF_TOPK, N_CENTROIDS, q_ivf_search,
    )

    got = (q_ivf_search(SF).to_pandas()
           .sort_values(["query_id", "vec_id"]).reset_index(drop=True))

    ids, mat = _quantized(SF)
    n2 = (mat**2).sum(axis=1)

    def cos(a_idx, b_idx):
        return (mat[a_idx] @ mat[b_idx].T) / np.sqrt(
            n2[a_idx][:, None] * n2[b_idx][None, :])

    cents = np.flatnonzero(ids < N_CENTROIDS)
    qs = np.flatnonzero(ids < IVF_NQ)
    # assignment: sim DESC, centroid id ASC on ties (argmax rule)
    a = cos(cents, np.arange(len(ids)))
    assign = ids[cents][np.argmax(a, axis=0)]
    expect = []
    for qi in qs:
        sq = cos(np.array([qi]), cents)[0]
        probe = ids[cents][np.lexsort((ids[cents], -sq))[:IVF_PROBE]]
        cand = np.flatnonzero(np.isin(assign, probe) & (ids != ids[qi]))
        sims = cos(np.array([qi]), cand)[0]
        order = np.lexsort((ids[cand], -sims))[:IVF_TOPK]
        for j in order:
            expect.append((ids[qi], ids[cand][j], sims[j]))
    expect.sort()
    assert len(got) == len(expect)
    for row, (eq, ev, es) in zip(got.itertuples(index=False), expect):
        assert (row.query_id, row.vec_id) == (eq, ev)
        assert row.sim == es


def test_semdedup_matches_bruteforce(ray_session):
    from osmquadtree_depreceated_ray.pipelines.queries_embed import (
        N_CENTROIDS, SEMDEDUP_TAU, q_semdedup,
    )

    got = (q_semdedup(SF).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))

    ids, mat = _quantized(SF)
    n2 = (mat**2).sum(axis=1)
    cents = np.flatnonzero(ids < N_CENTROIDS)
    sims_c = (mat[cents] @ mat.T) / np.sqrt(
        n2[cents][:, None] * n2[None, :])
    assign = ids[cents][np.argmax(sims_c, axis=0)]

    exp_max = np.full(len(ids), -1.0)
    for c in np.unique(assign):
        idx = np.flatnonzero(assign == c)  # ids sorted ascending
        sims = (mat[idx] @ mat[idx].T) / np.sqrt(
            n2[idx][:, None] * n2[idx][None, :])
        for j in range(1, len(idx)):
            exp_max[idx[j]] = sims[j, :j].max()

    assert (got["vec_id"].to_numpy() == ids).all()
    assert (got["centroid"].to_numpy() == assign).all()
    np.testing.assert_array_equal(got["max_sim_prev"].to_numpy(), exp_max)
    np.testing.assert_array_equal(
        got["keep"].to_numpy(), (exp_max < SEMDEDUP_TAU).astype(np.int64))
    # a meaningful fraction is actually dropped at this tau
    assert 0 < (got["keep"] == 0).sum() < len(got)


def test_pq_search_matches_dense_adc(ray_session):
    """PQ encode + ADC vs a dense numpy reference: codes by per-
    subspace argmin, adist by exact table lookup, rank by (adist,
    vec_id)."""
    import numpy as np
    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines import queries_embed as qe

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    mat = qe._quant(np.asarray(
        t.column("embedding").combine_chunks().flatten())).reshape(
        len(ids), -1)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    cb = mat[: qe.PQ_K].reshape(qe.PQ_K, qe.PQ_M, qe.PQ_SUBD)
    v = mat.reshape(len(ids), qe.PQ_M, qe.PQ_SUBD)
    d2 = ((v[:, None, :, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
    codes = np.argmin(d2, axis=1)
    qs = v[: qe.PQ_NQ]
    qd = ((qs[:, None, :, :] - cb[None, :, :, :]) ** 2).sum(
        axis=3).transpose(0, 2, 1)
    adist = qd[:, np.arange(qe.PQ_M)[None, :], codes].sum(axis=2)

    got = qe.q_pq_search(SF).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    for qi in range(qe.PQ_NQ):
        row = adist[qi]
        want_order = np.lexsort((ids, row))[: qe.PQ_TOPK]
        g = got[got["query_id"] == ids[qi]]
        assert list(g["vec_id"]) == list(ids[want_order])
        assert list(g["adist"]) == [int(row[j]) for j in want_order]
        assert list(g["rank"]) == list(range(1, qe.PQ_TOPK + 1))
