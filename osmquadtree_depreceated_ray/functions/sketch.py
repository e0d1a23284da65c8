"""Mergeable cardinality sketch (HyperLogLog) — the 100 TB aggregation
pattern: map-side fixed-size register partials, associative max-merge,
O(2^p) driver state regardless of input rows.

Deterministic by construction: the element hash is the same
md5-low-64 basis the dedup family uses (queries_text._md5_lower64), so
the estimate is reproducible run-to-run and pinned by unit goldens.
Standard HLL estimator (Flajolet et al.) with the linear-counting
small-range correction.
"""

from __future__ import annotations

import hashlib

import numpy as np

HLL_P = 12  # 4096 registers, ~1.04/sqrt(m) ~= 1.6% standard error
HLL_M = 1 << HLL_P


def _md5_lower64_bytes(strings) -> np.ndarray:
    md5 = hashlib.md5
    return np.fromiter(
        (int.from_bytes(md5(s).digest()[8:16], "little") for s in strings),
        dtype=np.uint64, count=len(strings),
    )


def hll_partial(values: np.ndarray) -> np.ndarray:
    """Register partial (uint8[m]) for one batch of values (any dtype;
    hashed via md5 of the string form for determinism across engines)."""
    if len(values) == 0:
        return np.zeros(HLL_M, dtype=np.uint8)
    strs = [str(v).encode() for v in values]
    h = _md5_lower64_bytes(strs)
    j = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = h << np.uint64(HLL_P)  # low 64-p bits shifted to the top
    # rho = leading-zero count of `rest` + 1, capped at 64-p+1 for rest==0
    rho = np.full(len(h), 64 - HLL_P + 1, dtype=np.uint8)
    nz = rest != 0
    if nz.any():
        r = rest[nz]
        lz = np.zeros(r.shape, dtype=np.int64)
        v = r.copy()
        for s in (32, 16, 8, 4, 2, 1):
            top_clear = v < (np.uint64(1) << np.uint64(64 - s))
            lz[top_clear] += s
            v = np.where(top_clear, v << np.uint64(s), v)
        rho[nz] = (lz + 1).astype(np.uint8)
    regs = np.zeros(HLL_M, dtype=np.uint8)
    np.maximum.at(regs, j, rho)
    return regs


def hll_merge(partials) -> np.ndarray:
    """Associative merge: elementwise max over register partials."""
    out = np.zeros(HLL_M, dtype=np.uint8)
    for p in partials:
        np.maximum(out, p, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimate with linear-counting small-range
    correction."""
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


# ---------------------------------------------------------------- KLL

class KLL:
    """Deterministic Karnin-Lang-Liberty quantile sketch (KLL16,
    arXiv:1603.05346) — the mergeable streaming-quantile path for
    corpora where the exact distinct-value histogram (queries_stats
    quantiles) would exchange O(distinct) rows.

    Differences from the paper, chosen for reproducibility in a
    distributed setting:
    * fixed per-level capacity ``k`` (the paper shrinks capacities
      geometrically; fixed k only costs a log factor in space);
    * the compaction offset alternates by the level's compaction COUNT
      instead of a coin flip — fully deterministic, so identical input
      partitions and merge order reproduce identical sketches;
    * SELF-CERTIFYING: every compaction at level h discards items of
      weight 2^h and contributes at most 2^h worst-case rank error;
      the running total rides in ``err``, and merges add it — so a
      consumer can ASSERT any estimate against the sketch's own exact
      error certificate rather than trust an asymptotic bound.
    """

    def __init__(self, k: int = 256):
        self.k = int(k)
        self.levels = [np.zeros(0, np.float64)]
        self.ccount = [0]
        self.n = 0
        self.err = 0

    def add(self, vals) -> "KLL":
        v = np.asarray(vals, np.float64)
        v = v[~np.isnan(v)]
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()
        return self

    def _compress(self) -> None:
        h = 0
        while h < len(self.levels):
            if len(self.levels[h]) > self.k:
                buf = np.sort(self.levels[h], kind="stable")
                off = self.ccount[h] & 1
                keep = buf[off::2]
                self.ccount[h] += 1
                self.err += 1 << h
                self.levels[h] = np.zeros(0, np.float64)
                if h + 1 == len(self.levels):
                    self.levels.append(np.zeros(0, np.float64))
                    self.ccount.append(0)
                self.levels[h + 1] = np.concatenate(
                    [self.levels[h + 1], keep])
            h += 1

    def merge(self, other: "KLL") -> "KLL":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.zeros(0, np.float64))
            self.ccount.append(0)
        for h, lv in enumerate(other.levels):
            self.levels[h] = np.concatenate([self.levels[h], lv])
        for h, c in enumerate(other.ccount):
            self.ccount[h] += c
        self.n += other.n
        self.err += other.err
        self._compress()
        return self

    def _items(self):
        vals = np.concatenate(self.levels)
        ws = np.concatenate([
            np.full(len(lv), 1 << h, np.int64)
            for h, lv in enumerate(self.levels)])
        order = np.argsort(vals, kind="stable")
        return vals[order], ws[order]

    def quantiles(self, fracs):
        """Estimates for the given rank fractions, plus the certified
        bound: |true_rank(estimate) - frac * n| <= bound for every
        returned estimate (bound = accumulated compaction error + the
        largest single item weight, the discretization step)."""
        fr = np.asarray(fracs, np.float64)
        if self.n == 0:
            return np.full(len(fr), np.nan), 0
        vals, ws = self._items()
        cum = np.cumsum(ws)
        targets = fr * self.n
        idx = np.minimum(np.searchsorted(cum, targets, side="left"),
                         len(vals) - 1)
        return vals[idx], int(self.err + ws.max())
