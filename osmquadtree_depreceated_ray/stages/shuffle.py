"""Explicit hash-partitioned grouped aggregation.

Ray Data's sort-based ``groupby(...).aggregate(...)`` carries a large
constant overhead per distinct key in this version; the engine instead
uses the classic explicit pattern (also what the reference's
AllocBlockStore shuffle is, /root/reference/blocksort/blocksort.go:63-98):

    1. map-side: add ``bucket = stable_hash(keys) % n_buckets``
    2. one cheap single-int-key shuffle co-locates each bucket
    3. per-bucket VECTORIZED pandas/polars groupby does the real work

This keeps the all-to-all exchange at n_buckets granularity (not
per-key), handles arbitrarily many distinct keys, and the per-bucket
aggregation runs at C speed.  Buckets are the unit of parallelism —
size ``n_buckets`` ≥ cluster cores for full width; skewed keys can be
salted by passing extra key columns.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa


def _stable_bucket(df: pd.DataFrame, keys: list[str], n_buckets: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(df[list(keys)], index=False).to_numpy()
    return (h % np.uint64(n_buckets)).astype(np.int64)


def bucketed_apply(
    ds,
    keys: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    n_buckets: int = 32,
):
    """Apply ``fn`` to each hash bucket (a pandas DataFrame containing
    every row of every key hashed there).  ``fn`` must group by ``keys``
    itself (vectorized) and must not depend on bucket boundaries beyond
    key co-location."""

    def add_bucket(b: pa.Table) -> pa.Table:
        df = b.select(keys).to_pandas()
        return b.append_column("bucket", pa.array(_stable_bucket(df, keys, n_buckets)))

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["bucket"])
        return fn(g)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(run, batch_format="pandas")
    )


def grouped_agg(
    ds,
    keys: list[str],
    agg_spec: dict[str, tuple[str, str]],
    n_buckets: int = 32,
):
    """Exact distributed grouped aggregation.

    agg_spec: out_col -> (in_col, how) with pandas named-agg semantics
    ('sum', 'min', 'max', 'size', 'first', ...).
    """

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(list(keys), as_index=False, sort=False).agg(
            **{k: v for k, v in agg_spec.items()}
        )
        return out

    return bucketed_apply(ds, keys, agg, n_buckets)


_SALT_MERGE = {"sum": "sum", "min": "min", "max": "max", "size": "sum",
               "count": "sum", "first": "first"}


def salted_agg(
    ds,
    keys: list[str],
    agg_spec: dict[str, tuple[str, str]],
    n_salts: int = 16,
    n_buckets: int = 32,
):
    """Skew-immune grouped aggregation for ASSOCIATIVE aggregates
    (sum/min/max/size/count/first).

    A key receiving a large share of all rows turns the plain
    hash-bucket shuffle into one straggler bucket.  Phase 1 groups by
    (keys + salt) — the hot key's rows spread across ``n_salts``
    partial groups that land in different buckets; phase 2 is a second
    (tiny) grouped_agg over the partials.  Exchange volume for phase 2
    is O(distinct keys x n_salts), independent of row skew."""
    unsupported = [h for _, (_, h) in agg_spec.items()
                   if h not in _SALT_MERGE]
    if unsupported:
        raise ValueError(f"non-associative aggs cannot be salted: "
                         f"{unsupported}")

    def add_salt(b: pa.Table) -> pa.Table:
        # deterministic, uniform within every batch
        salt = np.arange(b.num_rows, dtype=np.int64) % n_salts
        return b.append_column("__salt", pa.array(salt))

    phase1 = grouped_agg(
        ds.map_batches(add_salt, batch_format="pyarrow"),
        list(keys) + ["__salt"], agg_spec, n_buckets,
    )
    merge_spec = {
        out: (out, _SALT_MERGE[how]) for out, (_, how) in agg_spec.items()
    }
    return grouped_agg(phase1, list(keys), merge_spec, n_buckets)


def distinct(ds, keys: list[str], n_buckets: int = 32):
    """Exact distributed distinct over ``keys`` (map-side pre-dedup +
    per-bucket dedup)."""

    def pre(b: pa.Table) -> pa.Table:
        df = b.select(keys).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    return bucketed_apply(
        ds.map_batches(pre, batch_format="pyarrow"), keys, dd, n_buckets
    )
