"""Self-check: run every queries() entry against its oracle_sql() on a
testdata dir with the same comparison the driver uses (row count, schema
column names, order-insensitive value equality).

Usage: python tools/check_oracles.py [sf_dir] [name ...]
       python tools/check_oracles.py --json OUT.json [sf_dir] [name ...]

``--json`` additionally writes one record per query (status, rows,
issues, timings) so each round's full-registry sweep persists as an
auditable artifact (e.g. CORRECTNESS_full_r05.json).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    issues = []
    if sorted(got.columns) != sorted(want.columns):
        issues.append(f"schema: {sorted(got.columns)} != {sorted(want.columns)}")
        return issues
    if len(got) != len(want):
        issues.append(f"rows: {len(got)} != {len(want)}")
    g, w = canon(got), canon(want)
    n = min(len(g), len(w))
    for c in g.columns:
        # The driver's value-hash is dtype-sensitive (int64 vs float64
        # hash differently even when values are equal) — flag it here.
        if g[c].dtype != w[c].dtype:
            issues.append(f"dtype[{c}]: engine {g[c].dtype} != oracle {w[c].dtype}")
    for c in g.columns:
        a, b = g[c].iloc[:n], w[c].iloc[:n]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            neq = ~((a == b) | (a.isna() & b.isna()))
        else:
            try:
                neq = a.to_numpy() != b.to_numpy()
            except Exception:
                neq = a.astype(str).to_numpy() != b.astype(str).to_numpy()
        bad = int(pd.Series(neq).sum())
        if bad:
            i = pd.Series(neq).idxmax()
            issues.append(f"col {c}: {bad} mismatches, first at {i}: {a.iloc[i]!r} != {b.iloc[i]!r}")
    return issues


def main():
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    os.environ.setdefault(
        "RAY_DATA_LOGGING_CONFIG",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "ray_data_logging.yaml"))
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    records = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            records[name] = {"status": "FAIL",
                             "err": f"query {type(e).__name__}: {e}"}
            failures += 1
            continue
        ray_t = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows={len(got)} ({ray_t:.1f}s) [no oracle: rows-only]")
            records[name] = {"status": "ROWS_ONLY", "rows": len(got),
                             "ray_s": round(ray_t, 2)}
            continue
        t0 = time.time()
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            records[name] = {"status": "FAIL",
                             "err": f"oracle {type(e).__name__}: {e}"}
            failures += 1
            continue
        sql_t = time.time() - t0
        issues = compare(name, got, want)
        if issues:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(issues))
            records[name] = {"status": "FAIL", "rows": len(got),
                             "oracle_rows": len(want), "issues": issues}
        else:
            print(f"PASS {name}: rows={len(got)} (ray {ray_t:.1f}s, sql {sql_t:.1f}s)")
            records[name] = {"status": "PASS", "rows": len(got),
                             "ray_s": round(ray_t, 2),
                             "sql_s": round(sql_t, 2)}
    if json_out:
        import json

        summary = {
            "sf_dir": sf_dir,
            "total": len(records),
            "pass": sum(1 for r in records.values() if r["status"] == "PASS"),
            "rows_only": sum(1 for r in records.values()
                             if r["status"] == "ROWS_ONLY"),
            "fail": failures,
        }
        with open(json_out, "w") as f:
            json.dump({"summary": summary, "queries": records}, f, indent=1)
        print(f"wrote {json_out}: {summary}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
