"""Web-corpus URL operators: canonical URL normalization, registrable-
domain aggregation, and canonical-URL deduplication.

A Common-Crawl-style pipeline keys almost everything on the page URL —
dedup, per-domain quotas, host reputation, crawl frontier pruning — so
the URL kernel (parse -> normalize -> registrable domain) is a
first-class vectorized stage, not an ad-hoc UDF.  The reference keys
pages by an opaque int id and has no URL surface (SURVEY §2 gap the
task brief's web tier adds); these operators follow the engine's
derive.py pattern instead: URLs are derived DETERMINISTICALLY from
``doc_id`` by closed-form integer arithmetic so the DuckDB oracle can
rebuild the identical strings and normalize them with an INDEPENDENT
implementation (DuckDB RE2 ``regexp_extract`` + CASE arithmetic vs our
pandas C-regex kernel) — the comparison then checks the normalization
semantics, not a shared code path.

Normalization rules (RFC 3986 §6 syntax-based normalization, the subset
crawl dedup actually uses):
  1. scheme and host lowercased,
  2. default port stripped (``:80`` for http, ``:443`` for https),
     non-default ports kept,
  3. fragment dropped,
  4. trailing slash stripped from non-root paths (``/a/b/`` -> ``/a/b``),
     root stays ``/``; an empty path becomes ``/``,
  5. query string kept verbatim.

Scale notes: the parse kernel is one compiled-regex ``str.extract``
pass per batch (C speed, no Python per row); ``domain_stats`` moves
O(distinct (domain, host)) through the exchange via a map-side
pre-aggregation keyed by the pair, then finishes per-domain in the
reduce (COUNT DISTINCT host is exact because a domain's rows co-locate
in one bucket); ``url_dedup`` is the exact-dedup shape keyed by the
normalized URL (map-side first-wins partials).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# URL grammar: scheme://host[:port][path][?query][#fragment]
_URL_RE = (
    r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/:?#]+)(?::(\d+))?"
    r"([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"
)

_TLDS = ("com", "org", "net", "io")
_SUBS = ("", "www.", "WWW.", "cdn.", "api.")
_PATHS = ("/", "/a", "/a/b", "/a/b/c/")


def _derive_urls(doc_id: np.ndarray) -> pd.Series:
    """Deterministic raw URL per doc_id (closed-form, oracle-rebuildable).

    Exercises every normalization rule: mixed-case hosts, default and
    non-default ports, trailing slashes, queries, fragments.
    """
    k = doc_id.astype(np.int64)
    scheme = np.where(k % 3 == 0, "http", "https")
    sub = np.asarray(_SUBS, dtype=object)[k % 5]
    hostn = (k * 48271) % 89
    tld = np.asarray(_TLDS, dtype=object)[k % 4]
    pm = k % 7
    port = np.select([pm == 0, pm == 1, pm == 2],
                     [":80", ":443", ":8080"], default="")
    path = np.asarray(_PATHS, dtype=object)[k % 4]
    query = np.where(k % 6 == 0,
                     "?x=" + pd.Series(k % 11).astype(str), "")
    frag = np.where(k % 8 == 0, "#top", "")
    s = (pd.Series(scheme, dtype=object) + "://" + pd.Series(sub)
         + "site" + pd.Series(hostn).astype(str) + "." + pd.Series(tld)
         + pd.Series(port, dtype=object) + pd.Series(path)
         + pd.Series(query, dtype=object) + pd.Series(frag, dtype=object))
    return s


def sql_derive_url(key: str) -> str:
    """The identical raw-URL derivation as a DuckDB expression."""
    return (
        f"(CASE WHEN {key} % 3 = 0 THEN 'http' ELSE 'https' END || '://' || "
        f"['', 'www.', 'WWW.', 'cdn.', 'api.'][({key} % 5) + 1] || "
        f"'site' || CAST(({key} * 48271) % 89 AS VARCHAR) || '.' || "
        f"['com', 'org', 'net', 'io'][({key} % 4) + 1] || "
        f"CASE {key} % 7 WHEN 0 THEN ':80' WHEN 1 THEN ':443' "
        f"WHEN 2 THEN ':8080' ELSE '' END || "
        f"['/', '/a', '/a/b', '/a/b/c/'][({key} % 4) + 1] || "
        f"CASE WHEN {key} % 6 = 0 THEN '?x=' || CAST({key} % 11 AS VARCHAR) "
        f"ELSE '' END || "
        f"CASE WHEN {key} % 8 = 0 THEN '#top' ELSE '' END)"
    )


def normalize_urls(url: pd.Series) -> pd.DataFrame:
    """Vectorized URL parse + RFC 3986 syntax normalization.

    One compiled-regex extract pass, then numpy/pandas column ops.
    Returns columns: url_norm, host, domain, tld, path_depth (int64).
    Rows that don't parse get nulls across the board (web corpora carry
    garbage URLs; at scale they route to a quarantine partition rather
    than killing the pipeline).
    """
    parts = url.str.extract(_URL_RE)
    parts.columns = ["scheme", "host", "port", "path", "query", "frag"]
    scheme = parts["scheme"].str.lower()
    host = parts["host"].str.lower()
    port = parts["port"]
    default = ((scheme.eq("http") & port.eq("80"))
               | (scheme.eq("https") & port.eq("443")))
    port_norm = np.where(port.notna() & ~default, ":" + port, "")
    path = parts["path"].fillna("")
    path = path.mask(path.eq(""), "/")
    trail = path.str.len().gt(1) & path.str.endswith("/")
    path = path.mask(trail, path.str.slice(0, -1))
    query = np.where(parts["query"].notna(), "?" + parts["query"], "")
    url_norm = (scheme + "://" + host
                + pd.Series(port_norm, index=url.index, dtype=object)
                + path
                + pd.Series(query, index=url.index, dtype=object))
    # registrable domain = last two labels (one C-regex pass; a host
    # with a single label keeps itself — localhost-style)
    domain = host.str.extract(r"([^.]+\.[^.]+)$")[0].fillna(host)
    tld = host.str.extract(r"([^.]+)$")[0]
    depth = path.str.count("/").astype("int64") - path.eq("/").astype(
        "int64")
    bad = parts["scheme"].isna()
    out = pd.DataFrame({
        "url_norm": url_norm.mask(bad),
        "host": host.mask(bad),
        "domain": domain.where(~bad),
        "tld": tld.mask(bad),
        "path_depth": depth.mask(bad).astype("Int64"),
    })
    return out


def sql_url_norm_expr(raw: str) -> str:
    """Independent DuckDB normalization of a raw-URL expression."""
    scheme = f"lower(regexp_extract({raw}, '{_URL_RE}', 1))"
    host = f"lower(regexp_extract({raw}, '{_URL_RE}', 2))"
    port = f"regexp_extract({raw}, '{_URL_RE}', 3)"
    path = f"regexp_extract({raw}, '{_URL_RE}', 4)"
    query = f"regexp_extract({raw}, '{_URL_RE}', 5)"
    # regexp_extract returns '' for a non-participating group
    port_norm = (
        f"(CASE WHEN {port} = '' THEN '' "
        f"WHEN {scheme} = 'http' AND {port} = '80' THEN '' "
        f"WHEN {scheme} = 'https' AND {port} = '443' THEN '' "
        f"ELSE ':' || {port} END)"
    )
    path_norm = (
        f"(CASE WHEN {path} = '' THEN '/' "
        f"WHEN length({path}) > 1 AND {path} LIKE '%/' "
        f"THEN substr({path}, 1, length({path}) - 1) "
        f"ELSE {path} END)"
    )
    # the query group participates iff a '?' occurs BEFORE any '#' —
    # a '?' inside the fragment is fragment text (fuzz-found: the bare
    # substring test appended a spurious '?' for 'http://a#x?y')
    query_norm = (
        f"(CASE WHEN regexp_matches({raw}, '^[^#]*\\?') "
        f"THEN '?' || {query} ELSE '' END)"
    )
    return (f"({scheme} || '://' || {host} || {port_norm} || {path_norm} "
            f"|| {query_norm})")


def _norm_ds(sf_dir: str, extra_cols=()):
    import ray

    cols = ["doc_id"] + list(extra_cols)

    def fn(b: pa.Table) -> pa.Table:
        k = b.column("doc_id").to_numpy()
        out = normalize_urls(_derive_urls(k))
        cols_out = {"doc_id": b.column("doc_id")}
        for c in extra_cols:
            cols_out[c] = b.column(c)
        for c in out.columns:
            cols_out[c] = pa.array(out[c])
        return pa.table(cols_out)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)
    return ds.map_batches(fn, batch_format="pyarrow")


def q_url_normalize(sf_dir: str):
    """Per-doc URL parse + normalization (rules 1-5 above)."""
    return _norm_ds(sf_dir)


def sql_url_normalize() -> str:
    raw = sql_derive_url("doc_id")
    host = f"lower(regexp_extract({raw}, '{_URL_RE}', 2))"
    path = f"regexp_extract({raw}, '{_URL_RE}', 4)"
    path_norm = (
        f"(CASE WHEN {path} = '' THEN '/' "
        f"WHEN length({path}) > 1 AND {path} LIKE '%/' "
        f"THEN substr({path}, 1, length({path}) - 1) "
        f"ELSE {path} END)"
    )
    return (
        f"SELECT doc_id, {sql_url_norm_expr(raw)} AS url_norm, "
        f"{host} AS host, "
        f"(CASE WHEN len(string_split({host}, '.')) >= 2 THEN "
        f"string_split({host}, '.')[-2] || '.' || "
        f"string_split({host}, '.')[-1] ELSE {host} END) AS domain, "
        f"string_split({host}, '.')[-1] AS tld, "
        f"CAST(length({path_norm}) - "
        f"length(replace({path_norm}, '/', '')) "
        f"- (CASE WHEN {path_norm} = '/' THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS path_depth "
        f"FROM documents"
    )


def q_domain_stats(sf_dir: str):
    """Per-registrable-domain rollup: pages, distinct hosts, chars.

    One exchange keyed by domain; the map side pre-aggregates per
    (domain, host) so the shuffle moves O(distinct pairs) and the
    reduce's COUNT DISTINCT host is exact within its bucket.
    """
    from ..stages.shuffle import bucketed_apply

    ds = _norm_ds(sf_dir, extra_cols=("n_chars",))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["domain", "host"], as_index=False,
                         sort=False, dropna=False).agg(
            n_pages=("doc_id", "size"), sum_chars=("n_chars", "sum"))

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("domain", as_index=False, sort=False,
                         dropna=False).agg(
            n_pages=("n_pages", "sum"),
            n_hosts=("host", "nunique"),
            sum_chars=("sum_chars", "sum"))

    out = bucketed_apply(ds, ["domain"], reduce_fn, combine=combine)
    return out.map_batches(
        lambda b: pa.table({
            "domain": b.column("domain"),
            "n_pages": pa.compute.cast(b.column("n_pages"), pa.int64()),
            "n_hosts": pa.compute.cast(b.column("n_hosts"), pa.int64()),
            "sum_chars": pa.compute.cast(b.column("sum_chars"),
                                         pa.int64()),
        }), batch_format="pyarrow")


def sql_domain_stats() -> str:
    raw = sql_derive_url("doc_id")
    host = f"lower(regexp_extract({raw}, '{_URL_RE}', 2))"
    return (
        f"WITH n AS (SELECT doc_id, n_chars, {host} AS host, "
        f"(string_split({host}, '.')[-2] || '.' || "
        f"string_split({host}, '.')[-1]) AS domain FROM documents) "
        f"SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_pages, "
        f"CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts, "
        f"CAST(SUM(n_chars) AS BIGINT) AS sum_chars "
        f"FROM n GROUP BY domain"
    )


def q_url_dedup(sf_dir: str):
    """Canonical-URL dedup: distinct pages can share a normalized URL
    (scheme/case/port/slash variants); keep the smallest doc_id per
    canonical URL and report the duplicate count.  Map-side combine
    keeps the exchange at O(distinct urls) per split task."""
    from ..stages.shuffle import grouped_agg

    ds = _norm_ds(sf_dir)
    out = grouped_agg(
        ds, ["url_norm"],
        {"keep_id": ("doc_id", "min"), "n_dupes": ("doc_id", "size")})
    return out.map_batches(
        lambda b: pa.table({
            "url_norm": b.column("url_norm"),
            "keep_id": pa.compute.cast(b.column("keep_id"), pa.int64()),
            "n_dupes": pa.compute.cast(b.column("n_dupes"), pa.int64()),
        }), batch_format="pyarrow")


def sql_url_dedup() -> str:
    raw = sql_derive_url("doc_id")
    return (
        f"SELECT {sql_url_norm_expr(raw)} AS url_norm, "
        f"CAST(MIN(doc_id) AS BIGINT) AS keep_id, "
        f"CAST(COUNT(*) AS BIGINT) AS n_dupes "
        f"FROM documents GROUP BY 1"
    )


QUERIES = {
    "url_normalize": q_url_normalize,
    "domain_stats": q_domain_stats,
    "url_dedup": q_url_dedup,
}

ORACLES = {
    "url_normalize": sql_url_normalize(),
    "domain_stats": sql_domain_stats(),
    "url_dedup": sql_url_dedup(),
}


# ------------------------------------------------ crawl-policy filter
#
# robots.txt-style longest-match filtering: a small rule table of
# (tld, path_prefix, allow) entries; for each page the longest
# matching prefix wins (the robots.txt precedence rule, RFC 9309 §2.2
# "most specific match"), unmatched pages default to allow.  The rule
# table is driver-literal here (a VALUES CTE in the oracle); at scale
# it broadcasts via ray.put exactly like the rect polygons.  The rules
# below exercise the precedence logic on combos the derived corpus
# actually produces (tld and path are both k%4-periodic, so each tld
# carries ONE path): io's blanket '/' deny is overridden by the more
# specific '/a/b/c' allow; org and net are denied outright; com is
# unmatched and passes by default.

CRAWL_RULES = [
    ("org", "/a", 0),
    ("net", "/", 0),
    ("io", "/", 0),
    ("io", "/a/b/c", 1),
]


def q_url_filter(sf_dir: str):
    """Pages surviving the crawl-policy rules, with the matched prefix
    ('' when no rule matched)."""
    import ray

    def fn(b: pa.Table) -> pa.Table:
        k = b.column("doc_id").to_numpy()
        parts = normalize_urls(_derive_urls(k))
        tld = parts["tld"]
        # normalized path = url_norm after stripping scheme://host[:p]
        path = parts["url_norm"].str.replace(
            r"^[a-z]+://[^/]+", "", regex=True)
        n = len(k)
        best_len = np.full(n, -1, np.int64)
        best_allow = np.ones(n, bool)
        best_pref = np.asarray([""] * n, dtype=object)
        for rtld, pref, allow in CRAWL_RULES:
            m = ((tld == rtld) & path.str.startswith(pref)).to_numpy()
            upd = m & (len(pref) > best_len)
            best_len[upd] = len(pref)
            best_allow[upd] = bool(allow)
            best_pref[upd] = pref
        keep = best_allow
        return pa.table({
            "doc_id": pa.array(k[keep]),
            "tld": pa.array(tld.to_numpy(dtype=object)[keep],
                            pa.string()),
            "path": pa.array(path.to_numpy(dtype=object)[keep],
                             pa.string()),
            "matched": pa.array(best_pref[keep], pa.string()),
        })

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return ds.map_batches(fn, batch_format="pyarrow")


def sql_url_filter() -> str:
    raw = sql_derive_url("doc_id")
    norm = sql_url_norm_expr(raw)
    host = f"lower(regexp_extract({raw}, '{_URL_RE}', 2))"
    rules = ", ".join(f"('{t}', '{p}', {a})" for t, p, a in CRAWL_RULES)
    return (
        f"WITH u AS (SELECT doc_id, "
        f"string_split({host}, '.')[-1] AS tld, "
        f"regexp_replace({norm}, '^[a-z]+://[^/]+', '') AS path "
        f"FROM documents), "
        f"r(rtld, pref, allow) AS (VALUES {rules}), "
        "m AS (SELECT u.doc_id, u.tld, u.path, r.pref, r.allow, "
        "row_number() OVER (PARTITION BY u.doc_id "
        "ORDER BY length(r.pref) DESC, r.pref) AS rk "
        "FROM u LEFT JOIN r ON u.tld = r.rtld "
        "AND u.path LIKE r.pref || '%') "
        "SELECT doc_id, tld, path, "
        "COALESCE(pref, '') AS matched FROM m "
        "WHERE rk = 1 AND COALESCE(allow, 1) = 1"
    )


QUERIES["url_filter"] = q_url_filter
ORACLES["url_filter"] = sql_url_filter()
