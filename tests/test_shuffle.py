"""Hash-bucket shuffle helpers (stages/shuffle.py): grouped_agg /
distinct / salted_agg equivalence, including the hot-key skew case the
salting exists for."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _skewed_table(n=60_000, hot_share=0.6, seed=3):
    """One key owns ``hot_share`` of all rows; the rest are uniform."""
    rng = np.random.default_rng(seed)
    n_hot = int(n * hot_share)
    keys = np.concatenate([
        np.zeros(n_hot, np.int64),
        rng.integers(1, 500, n - n_hot),
    ])
    rng.shuffle(keys)
    return pa.table({
        "k": pa.array(keys),
        "v": pa.array(rng.integers(-100, 100, n).astype(np.int64)),
    })


def test_salted_agg_matches_grouped_agg(ray_session):
    import ray

    from osmquadtree_depreceated_ray.stages.shuffle import (
        grouped_agg, salted_agg,
    )

    t = _skewed_table()
    spec = {"sv": ("v", "sum"), "mn": ("v", "min"), "mx": ("v", "max"),
            "n": ("v", "size")}
    plain = grouped_agg(
        ray.data.from_arrow(t), ["k"], spec).to_pandas()
    salted = salted_agg(
        ray.data.from_arrow(t), ["k"], spec, n_salts=16).to_pandas()
    p = plain.sort_values("k").reset_index(drop=True)
    s = salted.sort_values("k").reset_index(drop=True)[p.columns]
    pd.testing.assert_frame_equal(p, s, check_dtype=False)
    # the hot key really was aggregated (0 owns 60% of rows)
    assert int(p.loc[p["k"] == 0, "n"].iloc[0]) == 36_000


def test_salted_agg_rejects_non_associative(ray_session):
    import ray

    from osmquadtree_depreceated_ray.stages.shuffle import salted_agg

    t = _skewed_table(1000)
    with pytest.raises(ValueError):
        salted_agg(ray.data.from_arrow(t), ["k"], {"m": ("v", "mean")})


def test_distinct_and_grouped_agg(ray_session):
    import ray

    from osmquadtree_depreceated_ray.stages.shuffle import (
        distinct, grouped_agg,
    )

    t = pa.table({
        "a": pa.array([1, 1, 2, 2, 2, 3], pa.int64()),
        "b": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
    })
    d = distinct(ray.data.from_arrow(t), ["a", "b"]).to_pandas()
    assert len(d) == 4
    g = grouped_agg(
        ray.data.from_arrow(t), ["a"], {"n": ("b", "size"), "s": ("b", "sum")}
    ).to_pandas().sort_values("a").reset_index(drop=True)
    assert g["n"].tolist() == [2, 3, 1]
    assert g["s"].tolist() == [2, 5, 3]


def test_dsapi_fallback_matches_raw_exchange(ray_session, monkeypatch):
    """GRAFT_SHUFFLE_IMPL=dsapi (the Dataset-API sort-based A/B path)
    must produce the same results as the raw boundary-aware exchange,
    for grouped_agg (with map-side combine) and a bucketed_apply fn."""
    import ray

    from osmquadtree_depreceated_ray.stages.shuffle import (
        bucketed_apply, grouped_agg,
    )

    t = _skewed_table(20_000)

    def run_agg():
        ds = ray.data.from_arrow(t)
        return (grouped_agg(ds, ["k"], {"s": ("v", "sum"),
                                        "n": ("v", "size")})
                .to_pandas().sort_values("k").reset_index(drop=True))

    def run_apply():
        ds = ray.data.from_arrow(t)
        fn = lambda g: (g.groupby("k", as_index=False)["v"].max()
                        .rename(columns={"v": "mx"}))
        return (bucketed_apply(ds, ["k"], fn)
                .to_pandas().sort_values("k").reset_index(drop=True))

    raw_agg, raw_apply = run_agg(), run_apply()
    monkeypatch.setenv("GRAFT_SHUFFLE_IMPL", "dsapi")
    ds_agg, ds_apply = run_agg(), run_apply()
    pd.testing.assert_frame_equal(raw_agg, ds_agg)
    pd.testing.assert_frame_equal(raw_apply, ds_apply)
