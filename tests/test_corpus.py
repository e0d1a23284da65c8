"""Corpus-index/sketch operator tests: count-min sketch, inverted
index postings, bigram collocations, priority sampling.

Each check recomputes the expected result independently
(collections.Counter, plain dict/sorted) on sf0.001 — the DuckDB
hash-exact gate runs separately via tools/check_oracles.py."""

import hashlib
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def _h64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


def test_cms_topk_vs_counter(ray_session, docs):
    from osmquadtree_depreceated_ray.pipelines.queries_corpus import (
        CMS_D, CMS_K, CMS_W, q_cms_topk,
    )

    got = q_cms_topk(SF).to_pandas()
    cnt = Counter(w for t in docs["text"] for w in t.split(" "))

    # independent sketch: d x w counter matrix
    mat = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for w, c in cnt.items():
        hv = _h64(w)
        for d in range(CMS_D):
            mat[d, (hv >> (10 * d)) & (CMS_W - 1)] += c

    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_K]
    assert list(got["word"]) == [w for w, _ in top]
    assert list(got["cnt"]) == [c for _, c in top]
    for _, r in got.iterrows():
        hv = _h64(r["word"])
        exp = min(mat[d, (hv >> (10 * d)) & (CMS_W - 1)]
                  for d in range(CMS_D))
        assert r["cms_est"] == exp
        assert r["overestimate"] == exp - r["cnt"] >= 0


def test_postings_vs_dict(ray_session, docs):
    from osmquadtree_depreceated_ray.pipelines.queries_corpus import (
        POST_MIN_DF, q_postings,
    )

    got = (q_postings(SF).to_pandas()
           .sort_values("word").reset_index(drop=True))
    posts = defaultdict(set)
    for did, t in zip(docs["doc_id"], docs["text"]):
        for w in set(t.split(" ")):
            posts[w].add(did)
    exp = {w: sorted(ds) for w, ds in posts.items()
           if len(ds) >= POST_MIN_DF}
    assert list(got["word"]) == sorted(exp)
    for _, r in got.iterrows():
        assert r["df"] == len(exp[r["word"]])
        assert r["postings"] == ",".join(map(str, exp[r["word"]]))


def test_collocations_vs_counter(ray_session, docs):
    from osmquadtree_depreceated_ray.pipelines.queries_corpus import (
        COLL_MIN, q_collocations,
    )

    got = q_collocations(SF).to_pandas()
    uni: Counter = Counter()
    big: Counter = Counter()
    n = 0
    for t in docs["text"]:
        ws = t.split(" ")
        uni.update(ws)
        n += len(ws)
        big.update(zip(ws, ws[1:]))
    exp = sorted((p, c) for p, c in big.items() if c >= COLL_MIN)
    assert [(r["w1"], r["w2"]) for _, r in got.iterrows()] == \
        [p for p, _ in exp]
    for _, r in got.iterrows():
        key = (r["w1"], r["w2"])
        assert r["cnt_xy"] == big[key]
        assert r["cnt_x"] == uni[r["w1"]]
        assert r["cnt_y"] == uni[r["w2"]]
        assert r["pmi_num"] == big[key] * n
        assert r["pmi_den"] == uni[r["w1"]] * uni[r["w2"]]


def test_priority_sample_vs_sorted(ray_session, docs):
    from osmquadtree_depreceated_ray.pipelines.queries_corpus import (
        PRI_N, q_priority_sample,
    )

    got = q_priority_sample(SF).to_pandas()
    pri = pd.DataFrame({
        "doc_id": docs["doc_id"],
        "weight": docs["n_chars"],
        "priority": [
            float(w) / (float(np.float64(_h64(str(d)))) + 1.0)
            for d, w in zip(docs["doc_id"], docs["n_chars"])],
    }).sort_values(["priority", "doc_id"], ascending=[False, True],
                   kind="stable").head(PRI_N).reset_index(drop=True)
    assert len(got) == min(PRI_N, len(docs))
    assert list(got["rk"]) == list(range(1, len(got) + 1))
    assert list(got["doc_id"]) == list(pri["doc_id"])
    assert np.array_equal(got["priority"].to_numpy(),
                          pri["priority"].to_numpy())
    # the sample is weight-biased: its mean weight beats the corpus mean
    assert got["weight"].mean() > docs["n_chars"].mean()


def test_bpe_merges_vs_reference(ray_session, docs):
    """Full-loop exactness of the distributed BPE learner against a
    pure-Python reference (same word-type frequencies, same greedy
    leftmost non-overlapping apply, same (cnt desc, l, r) tiebreak)."""
    from osmquadtree_depreceated_ray.pipelines.queries_corpus import (
        BPE_MERGES, q_bpe_merges,
    )

    got = q_bpe_merges(SF).to_pandas()

    word_freq = Counter(w for t in docs["text"] for w in t.split(" "))
    seqs = {w: list(w) for w in word_freq}
    merges = []
    prev = None
    for rank in range(1, BPE_MERGES + 1):
        cnt: Counter = Counter()
        for w, f in word_freq.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                cnt[(a, b)] += f
        if not cnt:
            break
        (left, right), c = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        assert prev is None or c <= prev
        prev = c
        merges.append((rank, left, right, c))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    want = pd.DataFrame(merges, columns=["rank", "left", "right", "cnt"])
    assert got.astype({"rank": "int64", "cnt": "int64"}).equals(
        want.astype({"rank": "int64", "cnt": "int64"}))


def test_bpe_pair_counts_empty_is_typed():
    """<2-symbol batches must emit a TYPED empty frame — an untyped one
    (all-float64) poisons the exchange's Arrow schema merge."""
    import pyarrow as pa

    from osmquadtree_depreceated_ray.pipelines.queries_corpus import (
        _bpe_pair_counts,
    )

    e = _bpe_pair_counts(np.asarray([], dtype=object),
                         np.asarray([], np.int64),
                         np.asarray([], np.int64))
    t = pa.Table.from_pandas(e, preserve_index=False)
    assert t.schema.field("l").type == pa.string() or \
        t.schema.field("l").type == pa.null() or \
        str(t.schema.field("cnt").type) == "int64"
    # concat with a real frame must not raise
    full = _bpe_pair_counts(np.asarray(["a", "b"], dtype=object),
                            np.asarray([0, 0], np.int64),
                            np.asarray([3], np.int64))
    pd.concat([e, full], ignore_index=True)
    assert full["cnt"].dtype == np.int64


def test_bpe_incremental_delta_matches_full_recount():
    """The shard's per-round delta (affected-word recount) must keep the
    driver's live pair table identical to a from-scratch full recount,
    for every round of a 30-merge run over random words — including
    overlap runs (left == right) and 1-char words."""
    from osmquadtree_depreceated_ray.pipelines.queries_corpus import (
        _bpe_apply,
        _bpe_apply_delta,
        _bpe_pair_counts,
    )

    rng = np.random.RandomState(0)
    words = ["".join(rng.choice(list("abcde"), rng.randint(1, 9)))
             for _ in range(300)]
    freq = rng.randint(1, 20, len(words)).astype(np.int64)
    chars = [list(w) for w in words]
    lens = np.asarray([len(c) for c in chars], np.int64)
    syms = np.asarray([s for cs in chars for s in cs], dtype=object)
    wid = np.repeat(np.arange(len(words)), lens)

    live = _bpe_pair_counts(syms, wid, freq).set_index(["l", "r"])["cnt"]
    s2, w2 = syms.copy(), wid.copy()
    for rnd in range(30):
        tot = live[live > 0].reset_index().sort_values(
            ["cnt", "l", "r"], ascending=[False, True, True],
            kind="stable")
        if tot.empty:
            break
        left, right = tot.iloc[0]["l"], tot.iloc[0]["r"]
        syms, wid, d = _bpe_apply_delta(syms, wid, freq, left, right)
        live = live.add(d.set_index(["l", "r"])["cnt"],
                        fill_value=0).astype(np.int64)
        s2, w2 = _bpe_apply(s2, w2, left, right)
        ref = _bpe_pair_counts(s2, w2, freq).set_index(["l", "r"])["cnt"]
        assert live[live != 0].sort_index().equals(ref.sort_index()), \
            (rnd, left, right)
        # the spliced symbol arrays agree with the reference as a
        # multiset of whole words
        a = pd.Series(syms).groupby(wid).agg("".join).sort_values().values
        b = pd.Series(s2).groupby(w2).agg("".join).sort_values().values
        assert (a == b).all()


def _ref_bpe_word(word: str, merges) -> list:
    """Independent reference: per-word greedy sequential merge loop."""
    syms = list(word)
    for left, right in merges:
        out, i = [], 0
        while i < len(syms):
            if (i + 1 < len(syms) and syms[i] == left
                    and syms[i + 1] == right):
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_encode_matches_scalar_reference(ray_session):
    import ray

    from osmquadtree_depreceated_ray.pipelines.queries_corpus import (
        BPE_ENCODE_MERGES,
        q_bpe_encode,
    )

    got = q_bpe_encode("/root/testdata/sf0.001").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for i in range(len(docs)):
        toks = [t for w in docs["text"][i].split(" ")
                for t in _ref_bpe_word(w, BPE_ENCODE_MERGES)]
        assert got["tokens"][i] == " ".join(toks)
        assert got["n_tokens"][i] == len(toks)


def test_bpe_encode_overlap_and_multichar(ray_session):
    """left==right overlap runs and multi-char merges, vs the scalar
    reference (the tricky greedy cases)."""
    import numpy as np

    from osmquadtree_depreceated_ray.pipelines.queries_corpus import (
        _bpe_encode_words,
    )

    merges = [("a", "a"), ("aa", "b"), ("aa", "aa")]
    import osmquadtree_depreceated_ray.pipelines.queries_corpus as qc
    old = qc.BPE_ENCODE_MERGES
    qc.BPE_ENCODE_MERGES = merges
    try:
        words = np.asarray(
            ["aaaa", "aaa", "aab", "aaab", "baaab", "b", ""],
            dtype=object)
        got = _bpe_encode_words(words)
    finally:
        qc.BPE_ENCODE_MERGES = old
    for w, g in zip(words, got):
        assert g == " ".join(_ref_bpe_word(w, merges)), (w, g)


def test_bm25_vs_bruteforce(ray_session, docs):
    from osmquadtree_depreceated_ray.pipelines.queries_corpus import (
        BM25_SCALE, BM25_TERMS, q_bm25,
    )

    got = (q_bm25(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    toks = {r.doc_id: r.text.split(" ") for r in docs.itertuples()}
    n_docs = len(docs)
    n_tok = sum(len(v) for v in toks.values())
    df = {t: sum(t in set(v) for v in toks.values()) for t in BM25_TERMS}

    exp = {}
    for d, ws in toks.items():
        dl = len(ws)
        s, nm = 0, 0
        for t in BM25_TERMS:
            tf = ws.count(t)
            if not tf:
                continue
            nm += 1
            num = BM25_SCALE * 22 * n_tok * tf * (2 * n_docs - 2 * df[t] + 1)
            den = ((10 * n_tok * tf + 3 * n_tok + 9 * dl * n_docs)
                   * (2 * df[t] + 1))
            s += num // den
        if nm:
            exp[d] = (nm, s)

    assert len(got) == len(exp)
    for r in got.itertuples():
        nm, s = exp[r.doc_id]
        assert (r.n_match, r.score_i) == (nm, s)
        assert r.score == s / BM25_SCALE
    # saturation sanity: scores are positive and bounded by
    # sum of idf ratios * (k1+1)
    assert (got["score_i"] > 0).all()
