"""Hypothesis property tests for the session-7 text kernels: the
vectorized winnowing selector and the span-rewrite run/paint logic are
checked against literal Python reimplementations on random corpora
(the fixed-corpus parity tests in test_pack.py pin the fixtures; these
pin the kernels over adversarial shapes: tiny docs, heavy repetition,
unicode, shared substrings)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

word = st.sampled_from(["aa", "bb", "cc", "dd", "éé", "x"])
doc = st.lists(word, min_size=1, max_size=30).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=12)


def _brute_winnow(doc_id, text, K, W):
    ws = text.split(" ")
    grams = [" ".join(ws[i:i + K]) for i in range(len(ws) - K + 1)]
    h = [int.from_bytes(hashlib.md5(g.encode()).digest()[8:16], "little")
         for g in grams]
    out = set()
    for i in range(max(len(h) - W + 1, 1) if h else 0):
        wnd = h[i:i + W]
        mh = min(wnd)
        j = max(p for p, v in enumerate(wnd) if v == mh)
        out.add((doc_id, i + j + 1, mh if mh < 2**63 else mh - 2**64))
    return out


@settings(max_examples=60, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(texts=corpus)
def test_winnow_batch_property(texts):
    from osmquadtree_depreceated_ray.pipelines.queries_pack import (
        WINNOW_K,
        WINNOW_W,
        winnow_batch,
    )

    b = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    t = winnow_batch(b)
    got = set(zip(t.column("doc_id").to_pylist(),
                  t.column("pos").to_pylist(),
                  t.column("gh").to_pylist()))
    exp = set()
    for i, txt in enumerate(texts):
        exp |= _brute_winnow(i, txt, WINNOW_K, WINNOW_W)
    assert got == exp


@settings(max_examples=40, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(texts=corpus)
def test_span_rewrite_kernel_property(ray_session, texts, tmp_path):
    """The whole span_rewrite pipeline on a synthetic corpus written to
    parquet — vs a literal Python reimplementation."""
    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines.queries_pack import (
        NGRAM_W,
        SPAN_MIN_RUN,
        q_span_rewrite,
    )

    d = tmp_path / "documents.parquet"
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)}), str(d))
    got = (q_span_rewrite(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # brute
    from collections import defaultdict

    owner = defaultdict(set)
    grams = {}
    for i, txt in enumerate(texts):
        ws = txt.split(" ")
        gs = [" ".join(ws[p:p + NGRAM_W])
              for p in range(len(ws) - NGRAM_W + 1)]
        grams[i] = (ws, gs)
        for g in gs:
            owner[g].add(i)
    dup = {g for g, s in owner.items() if len(s) >= 2}
    for i, txt in enumerate(texts):
        ws, gs = grams[i]
        isdup = [g in dup for g in gs]
        covered = [False] * len(ws)
        p = 0
        while p < len(gs):
            if isdup[p]:
                q = p
                while q < len(gs) and isdup[q]:
                    q += 1
                if q - p >= SPAN_MIN_RUN:
                    for x in range(p, q + NGRAM_W - 1):
                        covered[x] = True
                p = q
            else:
                p += 1
        kept = [w for w, c in zip(ws, covered) if not c]
        row = got.iloc[i]
        assert row["n_words"] == len(ws)
        assert row["n_removed"] == sum(covered)
        exp_text = " ".join(kept) if kept else None
        gt = row["clean_text"]
        gt = None if pd.isna(gt) else gt
        assert gt == exp_text


@settings(max_examples=30, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(seed=st.integers(0, 10**6), n=st.integers(1, 60))
def test_idw_kernel_property(seed, n):
    """The idw partial kernel's replicate-and-filter against an
    all-pairs brute force over random global point sets (with the abs
    prefilter that avoids the int64 square overflow)."""
    from osmquadtree_depreceated_ray.pipelines.queries_spatial import (
        IDW_G,
        IDW_R,
        IDW_S,
        IDW_WNUM,
    )

    rng = np.random.default_rng(seed)
    lon = rng.integers(-1_800_000_000, 1_800_000_000, n)
    lat = rng.integers(-900_000_000, 900_000_000, n)
    v = rng.integers(1, 1000, n)
    hx, hy = lon // IDW_G, lat // IDW_G
    # brute per occupied cell
    exp = {}
    for gx, gy in set(zip(hx.tolist(), hy.tolist())):
        cx, cy = gx * IDW_G + IDW_G // 2, gy * IDW_G + IDW_G // 2
        near = (np.abs(lon - cx) <= IDW_R) & (np.abs(lat - cy) <= IDW_R)
        d2 = (lon[near] - cx) ** 2 + (lat[near] - cy) ** 2
        m = d2 <= IDW_R * IDW_R
        w = IDW_WNUM // (d2[m] + IDW_S)
        exp[(gx, gy)] = (int(((hx == gx) & (hy == gy)).sum()),
                         int(w.sum()),
                         int((v[near][m] * w).sum()))
    # kernel path: replicate x9 + exact filter (mirrors q_idw_grid's
    # partials without Ray)
    idx = np.tile(np.arange(n), 9)
    off = np.array([-1, 0, 1], np.int64)
    dx = np.repeat(np.repeat(off, 3), n)
    dy = np.repeat(np.tile(off, 3), n)
    gx = hx[idx] + dx
    gy = hy[idx] + dy
    ddx = lon[idx] - (gx * IDW_G + IDW_G // 2)
    ddy = lat[idx] - (gy * IDW_G + IDW_G // 2)
    d2 = ddx * ddx + ddy * ddy
    m = d2 <= IDW_R * IDW_R
    w = IDW_WNUM // (d2[m] + IDW_S)
    got = {}
    for g_x, g_y, ww, vv in zip(gx[m], gy[m], w, v[idx[m]]):
        a, b, c = got.get((g_x, g_y), (0, 0, 0))
        got[(g_x, g_y)] = (a, b + int(ww), c + int(vv * ww))
    for (g_x, g_y), cnt in zip(zip(hx.tolist(), hy.tolist()),
                               np.ones(n, np.int64)):
        a, b, c = got.get((g_x, g_y), (0, 0, 0))
        got[(g_x, g_y)] = (a + int(cnt), b, c)
    got = {k: vv for k, vv in got.items() if vv[0] > 0}
    assert got == exp
