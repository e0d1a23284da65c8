"""URL kernel + web-query tests (pipelines/queries_web.py).

The normalization rules are RFC 3986 §6 syntax normalization; each rule
gets a direct pin, plus garbage-URL null handling and an end-to-end
dedup sanity check on a small derived corpus.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from osmquadtree_depreceated_ray.pipelines.queries_web import (
    _derive_urls,
    normalize_urls,
)


def norm1(url: str) -> dict:
    out = normalize_urls(pd.Series([url]))
    return out.iloc[0].to_dict()


def test_lowercase_scheme_host():
    r = norm1("HTTPS://WWW.Example.COM/Path")
    assert r["url_norm"] == "https://www.example.com/Path"
    assert r["host"] == "www.example.com"
    assert r["domain"] == "example.com"
    assert r["tld"] == "com"


def test_default_port_stripped():
    assert norm1("http://a.com:80/x")["url_norm"] == "http://a.com/x"
    assert norm1("https://a.com:443/x")["url_norm"] == "https://a.com/x"
    # non-default ports survive; cross-scheme defaults are NOT default
    assert norm1("http://a.com:8080/x")["url_norm"] == "http://a.com:8080/x"
    assert norm1("http://a.com:443/x")["url_norm"] == "http://a.com:443/x"


def test_fragment_dropped_query_kept():
    assert norm1("https://a.com/x?q=1#frag")["url_norm"] == "https://a.com/x?q=1"
    assert norm1("https://a.com/x#frag")["url_norm"] == "https://a.com/x"


def test_trailing_slash():
    assert norm1("https://a.com/a/b/")["url_norm"] == "https://a.com/a/b"
    assert norm1("https://a.com/")["url_norm"] == "https://a.com/"
    assert norm1("https://a.com")["url_norm"] == "https://a.com/"


def test_path_depth():
    assert norm1("https://a.com/")["path_depth"] == 0
    assert norm1("https://a.com/a")["path_depth"] == 1
    assert norm1("https://a.com/a/b/c/")["path_depth"] == 3


def test_single_label_host_domain():
    r = norm1("https://localhost/x")
    assert r["domain"] == "localhost"
    assert r["tld"] == "localhost"


def test_garbage_rows_null_not_crash():
    out = normalize_urls(pd.Series(["not a url", "", "ftp//x", None,
                                    "https://ok.com/a"]))
    assert out["url_norm"].isna().tolist() == [True, True, True, True, False]
    assert out["url_norm"].iloc[4] == "https://ok.com/a"
    # int64 depth column survives the nulls
    assert out["path_depth"].iloc[4] == 1


def test_derived_urls_roundtrip_deterministic():
    k = np.arange(0, 2000, dtype=np.int64)
    u1, u2 = _derive_urls(k), _derive_urls(k)
    assert (u1 == u2).all()
    out = normalize_urls(u1)
    # every derived URL parses
    assert out["url_norm"].notna().all()
    # scheme/port rules held: DEFAULT ports stripped (http+:80,
    # https+:443), non-default ports (incl. cross-scheme :80 on
    # https) survive, :8080 always survives
    is_http = out["url_norm"].str.startswith("http://")
    assert not (is_http & out["url_norm"].str.contains(":80/")).any()
    assert not (~is_http & out["url_norm"].str.contains(":443")).any()
    assert out["url_norm"].str.contains(":8080").any()
    assert (~is_http & out["url_norm"].str.contains(":80/")).any()
    # hosts all lowercase
    assert (out["host"] == out["host"].str.lower()).all()
    # the WWW./www. variants collapse: strictly fewer distinct
    # normalized urls than raw urls
    assert out["url_norm"].nunique() < u1.nunique()


def test_url_dedup_query(ray_session, tmp_path):
    from osmquadtree_depreceated_ray.pipelines import queries_web as qw

    # small corpus whose doc_ids provably collide post-normalization:
    # 89*4=356-periodic host/tld, scheme period 3, sub period 5 ->
    # ids i and i+lcm(3,5,4,7,4,6,8,11)*89... instead just reuse the
    # derived corpus and check against pandas
    n = 1500
    doc = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                    "text": pa.array(["t"] * n),
                    "lang": pa.array(["en"] * n),
                    "source": pa.array(["s"] * n),
                    "n_chars": pa.array(np.ones(n, dtype=np.int64))})
    import pyarrow.parquet as pq

    pq.write_table(doc, tmp_path / "documents.parquet")
    got = qw.q_url_dedup(str(tmp_path)).to_pandas()
    urls = normalize_urls(_derive_urls(np.arange(n, dtype=np.int64)))
    want = (pd.DataFrame({"url_norm": urls["url_norm"],
                          "doc_id": np.arange(n, dtype=np.int64)})
            .groupby("url_norm")
            .agg(keep_id=("doc_id", "min"), n_dupes=("doc_id", "size"))
            .reset_index())
    got = got.sort_values("url_norm").reset_index(drop=True)
    want = want.sort_values("url_norm").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["url_norm", "keep_id", "n_dupes"]],
        want[["url_norm", "keep_id", "n_dupes"]],
        check_dtype=False)
    assert (got["n_dupes"] > 1).any()


def test_domain_stats_query(ray_session, tmp_path):
    from osmquadtree_depreceated_ray.pipelines import queries_web as qw

    n = 800
    rng = np.random.RandomState(7)
    nchars = rng.randint(1, 100, n).astype(np.int64)
    doc = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                    "text": pa.array(["t"] * n),
                    "lang": pa.array(["en"] * n),
                    "source": pa.array(["s"] * n),
                    "n_chars": pa.array(nchars)})
    import pyarrow.parquet as pq

    pq.write_table(doc, tmp_path / "documents.parquet")
    got = qw.q_domain_stats(str(tmp_path)).to_pandas()
    urls = normalize_urls(_derive_urls(np.arange(n, dtype=np.int64)))
    want = (pd.DataFrame({"domain": urls["domain"], "host": urls["host"],
                          "n_chars": nchars})
            .groupby("domain")
            .agg(n_pages=("host", "size"), n_hosts=("host", "nunique"),
                 sum_chars=("n_chars", "sum"))
            .reset_index())
    got = got.sort_values("domain").reset_index(drop=True)
    want = want.sort_values("domain").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["domain", "n_pages", "n_hosts", "sum_chars"]],
        want[["domain", "n_pages", "n_hosts", "sum_chars"]],
        check_dtype=False)
    # multi-host domains exist (www./cdn./api. variants)
    assert (got["n_hosts"] > 1).any()


def test_url_filter_precedence(ray_session, tmp_path):
    """Longest-prefix-wins: io's blanket '/' deny is overridden by the
    more specific '/a/b/c' allow; org//a and net are denied; unmatched
    com defaults to allow."""
    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.pipelines import queries_web as qw

    n = 400
    doc = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                    "text": pa.array(["t"] * n),
                    "lang": pa.array(["en"] * n),
                    "source": pa.array(["s"] * n),
                    "n_chars": pa.array(np.ones(n, np.int64))})
    pq.write_table(doc, tmp_path / "documents.parquet")
    got = qw.q_url_filter(str(tmp_path)).to_pandas()
    # reference recompute
    urls = qw.normalize_urls(qw._derive_urls(np.arange(n, dtype=np.int64)))
    path = urls["url_norm"].str.replace(r"^[a-z]+://[^/]+", "", regex=True)
    keep_ids = []
    for i in range(n):
        best = (-1, 1)
        for rtld, pref, allow in qw.CRAWL_RULES:
            if urls["tld"][i] == rtld and path[i].startswith(pref) \
                    and len(pref) > best[0]:
                best = (len(pref), allow)
        if best[1]:
            keep_ids.append(i)
    assert sorted(got["doc_id"]) == keep_ids
    # precedence exercised: io pages survive ONLY via the specific
    # '/a/b/c' allow overriding the blanket '/' deny
    kept_io = got[got["tld"] == "io"]
    assert len(kept_io) > 0
    assert (kept_io["matched"] == "/a/b/c").all()
    # org//a and net are denied outright
    assert (got["tld"] != "org").all()
    assert (got["tld"] != "net").all()
    # unmatched com passes with no matched rule
    kept_com = got[got["tld"] == "com"]
    assert len(kept_com) > 0
    assert (kept_com["matched"] == "").all()


# ------------------------------------------------ differential URL fuzz

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_scheme = st.sampled_from(["http", "HTTP", "https", "HtTpS", "ftp"])
_host = st.sampled_from(["a.com", "WWW.Ex.COM", "x.y.z.io", "localhost",
                         "API.Site7.NET"])
_port = st.sampled_from(["", ":80", ":443", ":8080", ":1"])
_path = st.sampled_from(["", "/", "/A/b", "/a/", "/a/b/c/", "/%20x"])
_query = st.sampled_from(["", "?", "?q=1", "?a=1&b=2"])
_frag = st.sampled_from(["", "#", "#Top", "#a/b?c"])


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(sc=_scheme, h=_host, p=_port, pa_=_path, q=_query, f=_frag)
def test_fuzz_url_normalize_vs_duckdb(sc, h, p, pa_, q, f):
    """The pandas-regex kernel and the independent DuckDB RE2 + CASE
    normalization must agree on arbitrary composed URLs."""
    import duckdb

    from osmquadtree_depreceated_ray.pipelines.queries_web import (
        normalize_urls,
        sql_url_norm_expr,
    )

    url = f"{sc}://{h}{p}{pa_}{q}{f}"
    got = normalize_urls(pd.Series([url]))["url_norm"].iloc[0]
    lit = "'" + url.replace("'", "''") + "'"
    want = duckdb.execute(
        f"SELECT {sql_url_norm_expr(lit)} AS n").fetchone()[0]
    assert got == want, (url, got, want)
