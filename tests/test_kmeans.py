"""Distributed Lloyd k-means (queries_embed.kmeans_embeddings):
determinism, monotone inertia, and assignment correctness vs a direct
numpy reference on the same data."""

import os

import numpy as np
import pytest


SF = os.environ.get("GRAFT_SF_SMOKE", "/root/testdata/sf0.001")


@pytest.mark.skipif(not os.path.isdir(SF), reason="test data missing")
def test_kmeans_invariants(ray_session):
    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines.queries_embed import (
        _embed_matrix, kmeans_embeddings, q_kmeans,
    )

    cents, inertia, _ = kmeans_embeddings(SF, k=8, iters=3)
    assert cents.shape[0] == 8
    # Lloyd's algorithm never increases inertia
    assert all(b <= a + 1e-6 for a, b in zip(inertia, inertia[1:])), inertia
    # deterministic across runs (int64 partial sums are order-free;
    # inertia partials are sorted before summing)
    cents2, inertia2, _ = kmeans_embeddings(SF, k=8, iters=3)
    assert np.array_equal(cents, cents2)
    assert inertia == inertia2

    # the assignment query matches a direct numpy argmin on the same data
    out = q_kmeans(SF).to_pandas().sort_values("vec_id").reset_index(
        drop=True)
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids, mat = _embed_matrix(t)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    matf = mat.astype(np.float64)
    d2 = ((matf * matf).sum(axis=1)[:, None] - 2.0 * (matf @ cents.T)
          + (cents * cents).sum(axis=1)[None, :])
    expect = np.argmin(d2, axis=1)
    assert np.array_equal(out["cluster"].to_numpy(), expect)
    # every cluster id is in range and most clusters are populated
    assert out["cluster"].between(0, 7).all()
    assert out["cluster"].nunique() >= 4
