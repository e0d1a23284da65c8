"""HyperLogLog sketch (functions/sketch.py): accuracy, mergeability,
determinism, and the distributed query's error invariant."""

import numpy as np

from osmquadtree_depreceated_ray.functions.sketch import (
    HLL_M,
    hll_estimate,
    hll_merge,
    hll_partial,
)

rng = np.random.default_rng(9)


def test_hll_accuracy_and_merge():
    vals = np.unique(rng.integers(0, 10**12, 50_000))
    parts = [hll_partial(c) for c in np.array_split(vals, 7)]
    merged = hll_merge(parts)
    # merge of partials == partial of the whole set (associative max)
    assert (merged == hll_partial(vals)).all()
    est = hll_estimate(merged)
    assert abs(est - len(vals)) / len(vals) < 0.05
    # order-independent
    assert (hll_merge(parts[::-1]) == merged).all()


def test_hll_small_range_linear_counting():
    vals = np.arange(40)
    est = hll_estimate(hll_partial(vals))
    assert abs(est - 40) <= 2  # linear counting is near-exact here


def test_hll_determinism_golden():
    regs = hll_partial(np.arange(1000))
    # md5 basis -> byte-identical registers on every platform/run
    assert int(regs.sum()) == 1767
    assert int((regs > 0).sum()) == 873
    assert round(hll_estimate(regs), 3) == round(
        hll_estimate(hll_partial(np.arange(1000))), 3)


def test_hll_distinct_query(ray_session):
    import os

    import pytest

    from osmquadtree_depreceated_ray.pipelines.queries import QUERIES

    sf = os.environ.get("GRAFT_SF_SMOKE", "/root/testdata/sf0.001")
    if not os.path.isdir(sf):
        pytest.skip(f"test data not found at {sf}")
    out = QUERIES["hll_distinct"](sf).to_pandas()
    assert len(out) == 1
    est = int(out["distinct_est"].iloc[0])
    exact = int(out["exact_distinct"].iloc[0])
    assert exact > 0
    assert abs(est - exact) / exact < 0.05


def test_hll_group_query(ray_session):
    import os

    import pandas as pd
    import pyarrow.parquet as pq
    import pytest

    from osmquadtree_depreceated_ray.pipelines.queries import QUERIES

    sf = os.environ.get("GRAFT_SF_SMOKE", "/root/testdata/sf0.001")
    if not os.path.isdir(sf):
        pytest.skip(f"test data not found at {sf}")
    out = (QUERIES["hll_group"](sf).to_pandas()
           .sort_values("day").reset_index(drop=True))

    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["ts", "user_id"]).to_pandas()
    ev["day"] = (ev["ts"].to_numpy().astype("datetime64[D]")
                 .astype("datetime64[s]").astype(np.int64))
    # exact distinct per day recomputed independently
    exact = ev.groupby("day")["user_id"].nunique()
    assert (out["day"].to_numpy() == exact.index.to_numpy()).all()
    assert (out["exact_distinct"].to_numpy() == exact.to_numpy()).all()
    # per-day estimate equals a single-pass sketch of that day's users
    # (merge of batch partials must lose nothing)
    for _, row in out.iterrows():
        users = ev.loc[ev["day"] == row["day"], "user_id"].to_numpy()
        regs = hll_partial(users)
        assert row["distinct_est"] == int(np.floor(hll_estimate(regs) + 0.5))
        assert row["registers_used"] == int((regs > 0).sum())
        assert abs(row["distinct_est"] - row["exact_distinct"]) \
            <= max(0.1 * row["exact_distinct"], 10)


# ---------------------------------------------------------------- KLL

def test_kll_certificate_holds_bruteforce():
    from osmquadtree_depreceated_ray.functions.sketch import KLL

    rng = np.random.default_rng(17)
    vals = rng.lognormal(3.0, 1.5, 50_000)
    sk = KLL(128)
    for chunk in np.array_split(vals, 23):
        sk.add(chunk)
    fr = np.array([0.01, 0.25, 0.5, 0.9, 0.99])
    est, bound = sk.quantiles(fr)
    assert bound < 0.05 * len(vals)  # sanity: a useful bound
    sv = np.sort(vals)
    for f, e in zip(fr, est):
        lt = np.searchsorted(sv, e, side="left")
        le = np.searchsorted(sv, e, side="right")
        target = f * len(vals)
        assert lt - bound <= target <= le + bound


def test_kll_merge_matches_streaming_certificate():
    from osmquadtree_depreceated_ray.functions.sketch import KLL

    rng = np.random.default_rng(23)
    vals = rng.integers(0, 10_000, 30_000).astype(float)
    parts = np.array_split(vals, 8)
    sketches = [KLL(64).add(p) for p in parts]
    merged = sketches[0]
    for s in sketches[1:]:
        merged.merge(s)
    assert merged.n == len(vals)
    fr = np.array([0.1, 0.5, 0.9])
    est, bound = merged.quantiles(fr)
    sv = np.sort(vals)
    for f, e in zip(fr, est):
        lt = np.searchsorted(sv, e, side="left")
        le = np.searchsorted(sv, e, side="right")
        assert lt - bound <= f * len(vals) <= le + bound
    # determinism: rebuilding the same way gives identical estimates
    sketches2 = [KLL(64).add(p) for p in parts]
    merged2 = sketches2[0]
    for s in sketches2[1:]:
        merged2.merge(s)
    est2, bound2 = merged2.quantiles(fr)
    assert np.array_equal(est, est2) and bound == bound2


def test_kll_quantiles_query(ray_session):
    from osmquadtree_depreceated_ray.pipelines.queries_stats import (
        q_kll_quantiles,
    )

    got = q_kll_quantiles("/root/testdata/sf0.001").to_pandas()
    assert len(got) == 7
    # the in-query certificate already asserted; re-run determinism
    got2 = q_kll_quantiles("/root/testdata/sf0.001").to_pandas()
    import pandas as _pd

    _pd.testing.assert_frame_equal(got, got2)
