"""As-of join (queries_events.q_asof_join): engine vs DuckDB ASOF JOIN
on a crafted events table with duplicate click timestamps — the
tie-break case the driver fixtures never hit."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _crafted_events(tmp):
    """Two users; duplicate (user, ts) clicks with different values;
    purchases exactly ON a click ts (>= semantics) and before any click
    (must drop)."""
    base = pd.Timestamp("2024-01-01")
    rows = [
        # user 1: clicks at t=10 (two rows, tie), t=20; purchases at 10, 15, 25, 5
        (1, 1, 10, "click", 1.0),
        (2, 1, 10, "click", 2.0),     # tie winner (max event_id)
        (3, 1, 20, "click", 3.0),
        (10, 1, 10, "purchase", 0.0),  # exact match -> t=10 click, value 2.0
        (11, 1, 15, "purchase", 0.0),  # -> t=10
        (12, 1, 25, "purchase", 0.0),  # -> t=20
        (13, 1, 5, "purchase", 0.0),   # before any click -> dropped
        # user 2: one click after its only purchase -> dropped
        (20, 2, 50, "click", 9.0),
        (21, 2, 40, "purchase", 0.0),
        # noise the pre-filter must ignore
        (30, 1, 12, "view", 7.0),
        (31, 2, 45, "error", 7.0),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "sec",
                                     "event_type", "value"])
    df["ts"] = base + pd.to_timedelta(df.pop("sec"), unit="s")
    df["props"] = "{}"
    path = os.path.join(tmp, "events.parquet")
    pq.write_table(pa.Table.from_pandas(
        df[["event_id", "ts", "user_id", "event_type", "value", "props"]],
        preserve_index=False), path)
    return tmp


def test_asof_join_ties_and_drops(ray_session, tmp_path):
    from osmquadtree_depreceated_ray.pipelines.queries_events import (
        q_asof_join, sql_asof_join,
    )

    sf_dir = _crafted_events(str(tmp_path))
    got = q_asof_join(sf_dir).to_pandas().sort_values(
        "event_id").reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')")
    want = con.execute(sql_asof_join()).df().sort_values(
        "event_id").reset_index(drop=True)

    assert got["event_id"].tolist() == [10, 11, 12]
    # the t=10 tie resolves to event_id 2's value (2.0 -> 2000)
    assert got.loc[got["event_id"] == 10, "click_value_m"].iloc[0] == 2000
    assert got.loc[got["event_id"] == 12, "gap_us"].iloc[0] == 5_000_000
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False)
    # dtypes are exact int64 on the engine side
    for c in got.columns:
        assert got[c].dtype == np.int64, c
