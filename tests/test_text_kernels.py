"""Goldens for the oracle-less text kernels (simhash, rolling fingerprint)
and sanity properties for the hash-based dedup primitives."""

import numpy as np

from osmquadtree_depreceated_ray.pipelines.queries_text import (
    rolling_fingerprint,
    simhash64,
)


def test_rolling_fingerprint_golden():
    # independently computed: h = fold(h*257 + byte) mod 2^61-1
    def slow(text):
        h = 0
        for byte in text.encode():
            h = (h * 257 + byte) % ((1 << 61) - 1)
        return h

    for t in ("", "a", "hello world", "the quick brown fox" * 10):
        assert rolling_fingerprint(t) == slow(t)
    # pinned regression values
    assert rolling_fingerprint("hello world") == slow("hello world")
    assert rolling_fingerprint("x") == ord("x")


def test_simhash_properties():
    a = simhash64("the quick brown fox jumps".split())
    b = simhash64("the quick brown fox jumps".split())
    assert a == b  # deterministic
    # near-identical documents have small hamming distance; disjoint ones big
    c = simhash64("the quick brown fox leaps".split())
    d = simhash64("completely different words entirely here".split())

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert ham(a, c) < ham(a, d)
    # int64 range
    for v in (a, c, d):
        assert -(1 << 63) <= v < (1 << 63)


def test_simhash_bit_math_against_reference_formula():
    words = ["alpha", "beta", "gamma"]
    import hashlib

    acc = [0] * 64
    for w in words:
        # hash basis == DuckDB md5_number_lower: little-endian low half
        # of the digest (matches sql_simhash, oracle-verified)
        h = int.from_bytes(hashlib.md5(w.encode()).digest()[8:16], "little")
        for i in range(64):
            acc[i] += 1 if (h >> i) & 1 else -1
    want = 0
    for i in range(64):
        if acc[i] > 0:
            want |= 1 << i
    if want >= 1 << 63:
        want -= 1 << 64
    got = simhash64(words)
    # simhash64 wraps to signed int64 by subtracting 2^63 when the top bit
    # is set — normalize both the same way
    assert got == (want if want < (1 << 63) else want - (1 << 64))


def test_levenshtein_matches_reference_and_duckdb():
    import duckdb
    import numpy as np

    from osmquadtree_depreceated_ray.pipelines.queries_text import (
        _levenshtein,
    )

    def ref(a, b):
        m, n = len(a), len(b)
        d = [[0] * (n + 1) for _ in range(m + 1)]
        for i in range(m + 1):
            d[i][0] = i
        for j in range(n + 1):
            d[0][j] = j
        for i in range(1, m + 1):
            for j in range(1, n + 1):
                d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                              d[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
        return d[m][n]

    rng = np.random.default_rng(23)
    con = duckdb.connect()
    cases = [("", ""), ("", "abc"), ("abc", ""), ("kitten", "sitting"),
             ("abc", "abc")]
    for _ in range(40):
        la, lb = rng.integers(0, 30, 2)
        a = "".join(rng.choice(list("abcde "), la))
        b = "".join(rng.choice(list("abcde "), lb))
        cases.append((a, b))
    for a, b in cases:
        want = ref(a, b)
        assert _levenshtein(a, b) == want, (a, b)
        got_db = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert got_db == want, (a, b)


def test_levenshtein_batch_matches_scalar():
    import numpy as np

    from osmquadtree_depreceated_ray.pipelines.queries_text import (
        _levenshtein,
        _levenshtein_batch,
    )

    rng = np.random.default_rng(41)
    ta, tb = [], []
    for _ in range(200):
        la, lb = rng.integers(0, 50, 2)
        ta.append("".join(rng.choice(list("abcde "), la)))
        tb.append("".join(rng.choice(list("abcde "), lb)))
    ta += ["", "", "abc"]
    tb += ["", "xy", ""]
    got = _levenshtein_batch(ta, tb)
    want = np.array([_levenshtein(a, b) for a, b in zip(ta, tb)])
    assert np.array_equal(got, want)


def test_ttr_vs_brute_force(ray_session):
    import pandas as pd
    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines.queries_text import q_ttr

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["lang", "text"]).to_pandas()
    got = (q_ttr(sf).to_pandas()
           .sort_values("lang").reset_index(drop=True))
    assert list(got["lang"]) == sorted(t["lang"].unique())
    for _, r in got.iterrows():
        words = [w for s in t[t["lang"] == r["lang"]]["text"]
                 for w in s.split(" ")]
        tok, typ = len(words), len(set(words))
        assert int(r["n_tokens"]) == tok
        assert int(r["n_types"]) == typ
        assert int(r["ttr_q12"]) == \
            (2 * typ * 10 ** 12 + tok) // (2 * tok)
        assert 0 < typ < tok
