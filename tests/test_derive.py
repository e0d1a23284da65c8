"""The mid-cell derivation must make the float descent provably integral:
descent(qt) == integer Morton oracle, for numpy AND for DuckDB SQL."""

import duckdb
import numpy as np

from osmquadtree_depreceated_ray.functions.quadtree import calculate_point
from osmquadtree_depreceated_ray.sources import derive


def test_descent_equals_morton_numpy():
    key = np.arange(0, 200_000, dtype=np.int64)
    lon, lat = derive.derive_lonlat(key)
    got = calculate_point(lon, lat, 0.05, 18)
    want = derive.expected_qt(key)
    bad = np.flatnonzero(got != want)
    assert len(bad) == 0, f"{len(bad)} mismatches, first {bad[:5]}"


def test_sql_fragments_match_numpy():
    key = np.arange(0, 50_000, dtype=np.int64)
    con = duckdb.connect()
    con.execute("create table k as select * from unnest(?) as t(key)",
                [key.tolist()])
    qt_sql = derive.sql_qt_expr("key")
    lon_sql, lat_sql = derive.sql_lonlat_expr("key")
    res = con.execute(
        f"select {qt_sql} as qt, {lon_sql} as lon, {lat_sql} as lat from k order by key"
    ).fetchnumpy()
    np.testing.assert_array_equal(res["qt"], derive.expected_qt(key))
    lon, lat = derive.derive_lonlat(key)
    np.testing.assert_array_equal(res["lon"], lon)
    np.testing.assert_array_equal(res["lat"], lat)
