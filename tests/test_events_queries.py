"""Hopping-window aggregate: independent pandas recompute on sf0.001.
The DuckDB hash-exact gate runs separately via tools/check_oracles.py."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_window_sliding_vs_pandas(ray_session):
    from osmquadtree_depreceated_ray.pipelines.queries_events import (
        SLIDE_S, SLIDE_W, _value_m, q_window_sliding,
    )

    got = (q_window_sliding(SF).to_pandas()
           .sort_values("win_start").reset_index(drop=True))

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "value"]).to_pandas()
    hour = (ev["ts"].to_numpy().astype("datetime64[h]")
            .astype("datetime64[s]").astype(np.int64))
    vm = _value_m(ev["value"].to_numpy())
    reps = SLIDE_W // SLIDE_S
    ws = np.concatenate([hour - k * SLIDE_S for k in range(reps)])
    vms = np.tile(vm, reps)
    want = (pd.DataFrame({"win_start": ws, "vm": vms})
            .groupby("win_start").agg(n=("vm", "size"), value_m=("vm", "sum"))
            .reset_index())
    assert (got["win_start"].to_numpy() == want["win_start"].to_numpy()).all()
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()
    assert (got["value_m"].to_numpy() == want["value_m"].to_numpy()).all()
    # every interior event is counted W/S times in total
    assert got["n"].sum() == reps * len(ev)


def test_trajectory_vs_pandas(ray_session):
    from osmquadtree_depreceated_ray.pipelines.queries_events import (
        q_trajectory,
    )
    from osmquadtree_depreceated_ray.sources import derive

    got = (q_trajectory(SF).to_pandas()
           .sort_values(["user_id", "seq"]).reset_index(drop=True))

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "ts", "user_id"]).to_pandas()
    lon, lat = derive.derive_lonlat(ev["event_id"].to_numpy())
    ev["ts_us"] = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    ev["lon"], ev["lat"] = lon.astype(np.float64), lat.astype(np.float64)
    ev = ev.sort_values(["user_id", "ts_us", "event_id"])
    rows = []
    for uid, g in ev.groupby("user_id"):
        t = g["ts_us"].to_numpy()
        lo, la = g["lon"].to_numpy(), g["lat"].to_numpy()
        for i in range(1, len(g)):
            dlo, dla = lo[i] - lo[i - 1], la[i] - la[i - 1]
            rows.append({"user_id": uid, "seq": i,
                         "dt_us": t[i] - t[i - 1],
                         "dist2": dlo * dlo + dla * dla})
    want = (pd.DataFrame(rows).sort_values(["user_id", "seq"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every user contributes (count - 1) steps
    per = ev.groupby("user_id").size() - 1
    assert len(got) == per.sum()
    assert (got["dt_us"] >= 0).all()


def test_funnel_vs_pandas(ray_session):
    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines.queries_events import (
        FUNNEL_STEPS, q_funnel,
    )

    got = q_funnel(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    counts = []
    prev: dict = None
    for step in FUNNEL_STEPS:
        cur = {}
        e = ev[ev["event_type"] == step]
        for uid, ts in zip(e["user_id"], e["ts"]):
            if prev is not None and (uid not in prev or ts <= prev[uid]):
                continue
            if uid not in cur or ts < cur[uid]:
                cur[uid] = ts
        counts.append(len(cur))
        prev = cur
    assert list(got["stage"]) == list(FUNNEL_STEPS)
    assert list(got["users"]) == counts
    # funnel counts are monotone non-increasing
    assert all(a >= b for a, b in zip(counts, counts[1:]))


def test_retention_vs_pandas(ray_session):
    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines.queries_events import (
        q_retention,
    )

    got = q_retention(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    day = (ev["ts"].dt.normalize() - pd.Timestamp(0)).dt.days
    df = pd.DataFrame({"user_id": ev["user_id"], "day": day})
    cohort = df.groupby("user_id")["day"].transform("min")
    want = (pd.DataFrame({"cohort": cohort,
                          "offset": df["day"] - cohort,
                          "user_id": df["user_id"]})
            .drop_duplicates()
            .groupby(["cohort", "offset"], as_index=False)
            .agg(users=("user_id", "size"))
            .sort_values(["cohort", "offset"])
            .reset_index(drop=True))
    assert got.reset_index(drop=True).equals(want.astype(
        {"cohort": "int64", "offset": "int64", "users": "int64"}))
    # offset 0 row of each cohort counts the full cohort: it is the max
    m0 = got[got["offset"] == 0].set_index("cohort")["users"]
    mx = got.groupby("cohort")["users"].max()
    assert (m0 == mx).all()


def test_transitions_vs_pandas(ray_session):
    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines.queries_events import (
        q_transitions,
    )

    sf = "/root/testdata/sf0.001"
    got = (q_transitions(sf).to_pandas()
           .sort_values(["src", "dst"]).reset_index(drop=True))
    ev = pq.read_table(f"{sf}/events.parquet").to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="stable")
    nxt = ev.groupby("user_id")["event_type"].shift(-1)
    m = nxt.notna()
    exp = (pd.DataFrame({"src": ev["event_type"][m], "dst": nxt[m]})
           .groupby(["src", "dst"]).size().reset_index(name="n")
           .sort_values(["src", "dst"]).reset_index(drop=True))
    tot = exp.groupby("src")["n"].transform("sum")
    exp["p"] = exp["n"] / tot
    assert len(got) == len(exp)
    assert (got["src"] == exp["src"]).all()
    assert (got["dst"] == exp["dst"]).all()
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
    assert np.allclose(got["p"], exp["p"], rtol=0, atol=0)
    # probabilities are a proper row-stochastic matrix
    s = got.groupby("src")["p"].sum()
    assert np.allclose(s, 1.0)


def test_max_concurrency_vs_brute_force(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines.queries_events import (
        CONC_DUR_US,
        q_max_concurrency,
    )

    sf = "/root/testdata/sf0.001"
    ts = pq.read_table(f"{sf}/events.parquet", columns=["ts"]) \
        .column("ts").cast("int64").to_numpy()
    # brute sweep with ends-before-starts tie rule
    deltas = sorted(
        [(int(t), 1) for t in ts]
        + [(int(t) + CONC_DUR_US, -1) for t in ts])
    cur = peak = 0
    for _t, d in deltas:
        cur += d
        peak = max(peak, cur)
    got = q_max_concurrency(sf).to_pandas()
    assert int(got["n_events"].iloc[0]) == len(ts)
    assert int(got["peak"].iloc[0]) == peak
    # intervals genuinely overlap but not everything at once
    assert 1 < peak < len(ts)


def test_lag_corr_vs_brute_force(ray_session):
    import math

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines.queries_events import (
        q_lag_corr,
    )

    sf = "/root/testdata/sf0.001"
    ts = pq.read_table(f"{sf}/events.parquet", columns=["ts"]) \
        .column("ts").cast("int64").to_numpy()
    days = pd.Series(ts // 86_400_000_000).value_counts().sort_index()
    d = days.index.to_numpy(np.int64)
    c = days.to_numpy(np.int64)
    adj = np.isin(d + 1, d)
    x = c[adj]
    nxt = {int(k): int(v) for k, v in zip(d, c)}
    y = np.array([nxt[int(k) + 1] for k in d[adj]], np.int64)
    n = len(x)
    num = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
    dx = n * int((x * x).sum()) - int(x.sum()) ** 2
    dy = n * int((y * y).sum()) - int(y.sum()) ** 2
    exp = float(num) / math.sqrt(float(dx * dy))
    got = q_lag_corr(sf).to_pandas()
    assert int(got["n_days"].iloc[0]) == len(d)
    assert int(got["n_pairs"].iloc[0]) == n
    assert got["lag_corr"].iloc[0] == exp
    assert n > 10  # a real multi-day series


def test_mann_kendall_vs_brute_force(ray_session):
    import math

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines.queries_events import (
        q_mann_kendall,
    )

    sf = "/root/testdata/sf0.001"
    ts = pq.read_table(f"{sf}/events.parquet", columns=["ts"]) \
        .column("ts").cast("int64").to_numpy()
    days = pd.Series(ts // 86_400_000_000).value_counts().sort_index()
    c = days.to_numpy(np.int64)
    n = len(c)
    s = sum(int(np.sign(c[j] - c[i]))
            for i in range(n) for j in range(i + 1, n))
    tie = sum(int(t) * (int(t) - 1) * (2 * int(t) + 5)
              for t in pd.Series(c).value_counts() if t > 1)
    var18 = n * (n - 1) * (2 * n + 5) - tie
    z = (s - (1 if s > 0 else -1)) / math.sqrt(var18 / 18.0) \
        if s != 0 else 0.0
    got = q_mann_kendall(sf).to_pandas()
    assert int(got["n_days"].iloc[0]) == n
    assert int(got["s_stat"].iloc[0]) == s
    assert int(got["var18"].iloc[0]) == var18
    assert got["z_stat"].iloc[0] == z
    assert n > 10 and var18 > 0


def test_runs_test_vs_brute_force(ray_session):
    import math

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines.queries_events import (
        q_runs_test,
    )

    sf = "/root/testdata/sf0.001"
    ts = pq.read_table(f"{sf}/events.parquet", columns=["ts"]) \
        .column("ts").cast("int64").to_numpy()
    days = pd.Series(ts // 86_400_000_000).value_counts().sort_index()
    c = days.to_numpy(np.int64)
    med = int(np.sort(c)[(len(c) - 1) // 2])
    side = (c[c != med] > med)
    n1, n2 = int(side.sum()), int((~side).sum())
    r = 1 + int((side[1:] != side[:-1]).sum())
    mu = float(2 * n1 * n2) / float(n1 + n2) + 1.0
    var = float(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)) \
        / float((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))
    z = (float(r) - mu) / math.sqrt(var)
    got = q_runs_test(sf).to_pandas()
    assert int(got["n_above"].iloc[0]) == n1
    assert int(got["n_below"].iloc[0]) == n2
    assert int(got["n_runs"].iloc[0]) == r
    assert got["z_stat"].iloc[0] == z
    assert n1 > 2 and n2 > 2 and r > 2
