"""Counting quadtree trie + the max-per-tile split rule + tile allocator.

Ports the *semantics* of /root/reference/calcqts/qttree.go:

* :class:`QtTree` — counting trie over quadtree IDs (qttree.go:20-190):
  each node holds (qt, count, total, parent, children[4]); ``count`` is
  weight landing exactly on the node's tile, ``total`` the subtree sum.
* :func:`find_qt_groups` — THE skew-aware split rule
  (``FindQtGroups`` + ``findGroupIntFlat``, qttree.go:370-439,508-627):
  walk the trie accepting nodes whose total falls in a widening
  ``[mn, mx]`` window around ``target``; accepted subtrees are removed
  (totals clipped up the ancestor chain) and the window widens by 50/round
  until the tree is consumed.  Hot cells therefore split deeper until
  each output tile holds ≤ ~max elements — the reference's answer to skew.
* :class:`QtAllocator` — ``MakeQtTree(...).Find(qt)`` (qttree.go:192-215,
  631-638): map any element qt to the deepest accepted group tile that is
  an ancestor-or-equal of it (fallback: root tile 0).  Vectorized as a
  per-level sorted-membership longest-prefix match, broadcastable via
  ``ray.put`` to every map task.

This is driver-side code: the trie input is the (usually small) result of
a distributed ``groupby('qt').count()``, never raw elements.

Divergence from the reference, documented: when leftover weight remains
in >1 dust leaves after the widening loop the reference dumps the tree
and panics (qttree.go:592-617); we fold ALL leftover weight into the
root tile 0 instead (same destination the reference uses for the
single-leaf case) and record the event — a panic is not an acceptable
failure mode for a resumable distributed job.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .quadtree import qt_round


@dataclass
class _Node:
    qt: int
    count: int = 0
    total: int = 0
    parent: int = 0
    children: list = field(default_factory=lambda: [0, 0, 0, 0])


class QtTree:
    """Counting trie over quadtree IDs (qttree.go:20-190)."""

    def __init__(self):
        self.nodes: list[_Node] = [_Node(qt=0)]

    # -- construction ------------------------------------------------------
    def add(self, qt: int, weight: int = 1) -> None:
        if qt < 0:
            return
        self._add_int(0, int(qt), int(weight))

    def add_many(self, qts, weights) -> None:
        for q, w in zip(qts, weights):
            self._add_int(0, int(q), int(w))

    def _add_int(self, i: int, qt: int, w: int) -> None:
        # qttree.go:172-190, iterative
        while True:
            t = self.nodes[i]
            t.total += w
            if qt == t.qt:
                t.count += w
                return
            d = t.qt & 31
            nv = (qt >> (61 - 2 * d)) & 3
            if t.children[nv] == 0:
                cq = _round_int(qt, d + 1)
                self.nodes.append(_Node(qt=cq, parent=i))
                t.children[nv] = len(self.nodes) - 1
            i = t.children[nv]

    # -- queries -----------------------------------------------------------
    def find(self, qt: int) -> int:
        """Deepest counted node on qt's root path (qttree.go:192-215)."""
        lastrs = 0
        idx = 0
        qt = int(qt)
        while True:
            t = self.nodes[idx]
            if qt == t.qt:
                return idx if t.count != 0 else lastrs
            if t.count != 0:
                lastrs = idx
            d = t.qt & 31
            nv = (qt >> (61 - 2 * d)) & 3
            if t.children[nv] == 0:
                return lastrs
            idx = t.children[nv]

    def remove(self, i: int) -> None:
        """Detach subtree i and clip totals up the chain (qttree.go:91-122)."""
        if i == 0:
            return
        t = self.nodes[i]
        v = t.total
        ci = (t.qt >> (63 - 2 * (t.qt & 31))) & 3
        if t.parent != i:
            j = t.parent
            p = self.nodes[j]
            p.children[ci] = 0
            p.total -= v
            while p.parent != j:
                j = p.parent
                p = self.nodes[j]
                p.total -= v

    def leaves(self):
        """Counted nodes in pre-order: (qt, count, total) (qttree.go:219-280)."""
        out = []
        stack = [0]
        while stack:
            i = stack.pop()
            t = self.nodes[i]
            if t.count != 0:
                out.append((t.qt, t.count, t.total))
            for c in reversed(t.children):
                if c != 0 and c != i:
                    stack.append(c)
        return out

    @property
    def root_total(self) -> int:
        return self.nodes[0].total

    @classmethod
    def from_counts(cls, qts, weights) -> "QtTree":
        t = cls()
        t.add_many(qts, weights)
        return t


def _round_int(qt: int, level: int) -> int:
    if (qt & 31) < level:
        return qt
    qt >>= 63 - 2 * level
    qt <<= 63 - 2 * level
    return qt + level


def _find_group_pass(tree: QtTree, absmin: int, mn: int, mx: int,
                     require_count: bool = True) -> list[int]:
    """One traversal pass = ``findGroupIntFlat`` (qttree.go:370-439)."""

    def next_item(j: int, fc: int) -> int:
        while True:
            t = tree.nodes[j]
            if fc < 4:
                for b in t.children[fc:]:
                    if b != 0:
                        return b
            if t.parent == j:
                return 0
            pc = (t.qt >> (63 - 2 * (t.qt & 31))) & 3
            j, fc = t.parent, pc + 1

    res = []
    i = 0
    while True:
        t = tree.nodes[i]
        if t.total >= mn:
            alls = True
            for c in t.children:
                if c != 0 and tree.nodes[c].total > absmin:
                    alls = False
            countable = t.count != 0 or not require_count
            if countable and (t.total == t.count or t.total <= mx or alls):
                res.append(i)
                j = i
                i = next_item(i, 4)
                tree.remove(j)
            else:
                i = next_item(i, 0)
        else:
            i = next_item(i, 4)
        if i == 0:
            return res


def find_qt_groups_slow(
    tree: QtTree, target: int = 8000, minimum: int = 500,
    require_count: bool = True,
) -> "QtTree":
    """The widening split loop: ``FindQtGroups`` (qttree.go:508-627).

    Consumes ``tree`` (removes accepted subtrees) and returns a new
    QtTree whose counted nodes are the output tiles, with conservation:
    sum of group totals == original total.
    """
    orig_total = tree.root_total
    mn = target - 50
    mx = target + 50
    found_zero = False
    out = QtTree()

    while tree.root_total > 1000 and not found_zero:
        cont = True
        while cont and not found_zero:
            r = _find_group_pass(tree, minimum, mn, mx, require_count)
            if 0 in r:
                found_zero = True
            cont = len(r) > 0
            for ri in r:
                t = tree.nodes[ri]
                out.add(t.qt, t.total)
        if found_zero:
            break
        # Window jump: the reference widens by exactly 50/round
        # (qttree.go:569-580), re-traversing the tree on windows that can
        # accept nothing.  Acceptance is monotone in the window, so we can
        # compute the smallest widening k under which ANY node becomes
        # acceptable and jump straight there — identical outcome, far
        # fewer passes.  (No removals happen during empty windows, so the
        # 'alls' clause cannot newly activate in between.)
        k_needed = None
        for t in tree.nodes:
            if (require_count and t.count == 0) or t.total <= 0:
                continue
            if t.total < mn:
                if t.total < minimum:
                    continue  # dust: never acceptable
                k = -(-(mn - t.total) // 50)  # ceil
            elif t.total > mx and t.total != t.count:
                k = -(-(t.total - mx) // 50)
            else:
                # acceptable at the current window but unreachable this
                # pass only via an ancestor gate; one more widening step
                # is the conservative (reference-faithful) move
                k = 1
            if k_needed is None or k < k_needed:
                k_needed = k
        if k_needed is None:
            break  # only dust remains — nothing will ever be accepted
        k_needed = max(1, k_needed)
        mn = max(mn - 50 * k_needed, minimum)
        mx += 50 * k_needed
        if mx > 1_000_000:
            break

    t0 = tree.nodes[0]
    if not found_zero and t0.total > 0:
        # documented divergence: leftovers (however many leaves) -> root tile
        out.add(0, t0.total)

    if out.root_total != orig_total:
        raise AssertionError(
            f"split-rule conservation violated: {out.root_total} != {orig_total}"
        )
    return out


class QtAllocator:
    """Vectorized ``MakeQtTree(groups).Find(qt)`` longest-ancestor match.

    Built from the group tiles of :func:`find_qt_groups`; cheap to
    serialize (one int64 array) → ``ray.put`` once, reuse in every task.
    For each query qt, returns the deepest group tile that is an
    ancestor-or-equal of it, else the root tile 0 (qttree.go:192-215
    ``lastrs`` fallback).
    """

    def __init__(self, group_qts):
        qts = np.unique(np.asarray(group_qts, dtype=np.int64))
        self.levels: list[tuple[int, np.ndarray]] = []
        lv = qts & 31
        for level in sorted(set(int(l) for l in lv), reverse=True):
            self.levels.append((level, np.sort(qts[lv == level])))

    def assign(self, qts) -> np.ndarray:
        qts = np.asarray(qts, dtype=np.int64)
        out = np.zeros(qts.shape, dtype=np.int64)  # fallback: root tile 0
        unassigned = np.ones(qts.shape, dtype=bool)
        for level, members in self.levels:
            if not unassigned.any():
                break
            cand = qt_round(qts, level)
            pos = np.searchsorted(members, cand)
            pos_c = np.clip(pos, 0, len(members) - 1)
            hit = unassigned & (members[pos_c] == cand) & (pos < len(members))
            out[hit] = cand[hit]
            unassigned &= ~hit
        return out

    @property
    def group_qts(self) -> np.ndarray:
        if not self.levels:
            return np.zeros(0, dtype=np.int64)
        return np.sort(np.concatenate([m for _, m in self.levels]))


# ---------------------------------------------------------------------------
# Vectorized split rule — semantically identical to find_qt_groups_slow
# ---------------------------------------------------------------------------

def _agg_sorted(keys: np.ndarray, vals: np.ndarray):
    """Aggregate vals by equal adjacent keys of an already-sorted key array."""
    if len(keys) <= 1:
        return keys, vals
    starts = np.concatenate([[0], np.flatnonzero(keys[1:] != keys[:-1]) + 1])
    return keys[starts], np.add.reduceat(vals, starts)


class _ArrayTrie:
    """Flat-array counting trie in pre-order (qt integer order ≡ DFS
    pre-order, SURVEY §1 ordering invariant).

    Built vectorized from (leaf_qt, weight) pairs: nodes are the ancestor
    closure of the leaves (the reference's ``addint`` materializes exactly
    these, qttree.go:172-190); totals come from contiguous subtree ranges
    over the sorted leaves.
    """

    def __init__(self, leaf_qts, weights, prune_below: int = 0):
        leaf_qts = np.asarray(leaf_qts, dtype=np.int64)
        weights = np.asarray(weights, dtype=np.int64)
        keep = leaf_qts >= 0  # reference Add skips qt<0 (qttree.go:80-85)
        leaf_qts, weights = leaf_qts[keep], weights[keep]
        order = np.argsort(leaf_qts, kind="stable")
        leaf_qts, weights = leaf_qts[order], weights[order]
        uq, w = _agg_sorted(leaf_qts, weights)

        # Bottom-up level rollup with exact pruning.
        #
        # Pruning rationale: a node with total < prune_below can never be
        # accepted (the window floor is mn >= minimum == prune_below) and,
        # because only accepted subtrees are ever removed, such nodes are
        # never removed either — so their only effect on retained nodes is
        # the 'alls' check, where (total < prune_below == absmin) can never
        # exceed absmin.  Materializing only nodes with total >= prune_below
        # is therefore semantics-preserving and shrinks the trie ~100x on
        # point corpora.  prune_below=0 materializes the full ancestor
        # closure (exactly the nodes the reference's addint creates).
        #
        # Rollup invariant: qt_round is monotone on the sorted qt order, so
        # the per-level rollup never needs a re-sort; at iteration l every
        # entry of depth l carries its complete subtree total.
        self.prune_below = int(prune_below)
        depth = uq & 31
        maxd = int(depth.max()) if len(depth) else 0
        cur_qt, cur_w = uq, w
        ret_parts = []
        for l in range(maxd, -1, -1):
            deeper = (cur_qt & 31) > l
            if deeper.any():
                cur_qt = np.where(deeper, qt_round(cur_qt, l), cur_qt)
                cur_qt, cur_w = _agg_sorted(cur_qt, cur_w)
            at_l = (cur_qt & 31) == l
            tot_l = cur_w[at_l]
            keep_l = tot_l >= prune_below if prune_below > 0 else np.ones(len(tot_l), bool)
            if keep_l.any():
                ret_parts.append((cur_qt[at_l][keep_l], tot_l[keep_l]))
        root_total = int(cur_w.sum())

        nodes = (np.concatenate([p[0] for p in ret_parts])
                 if ret_parts else np.zeros(0, np.int64))
        totals = (np.concatenate([p[1] for p in ret_parts])
                  if ret_parts else np.zeros(0, np.int64))
        if 0 not in nodes:
            nodes = np.concatenate([nodes, np.zeros(1, np.int64)])
            totals = np.concatenate([totals, np.asarray([root_total], np.int64)])
        order = np.argsort(nodes, kind="stable")
        nodes, totals = nodes[order], totals[order]

        self.qt = nodes
        self.level = (nodes & 31).astype(np.int64)
        self.total = totals
        # count = leaf weight sitting exactly on the node's tile
        pos = np.searchsorted(uq, nodes)
        pos_c = np.clip(pos, 0, max(len(uq) - 1, 0))
        exact = (pos < len(uq)) & (uq[pos_c] == nodes) if len(uq) else np.zeros(len(nodes), bool)
        self.count = np.where(exact, w[pos_c] if len(uq) else 0, 0).astype(np.int64)

        # subtree position range [i, sub_end) in pre-order (uint64: the
        # upper bound path + 2^(63-2l) reaches 2^63 for the root and for
        # last-quadrant tiles, overflowing int64)
        path = nodes - self.level
        nodes_u = nodes.astype(np.uint64)
        hi_u = path.astype(np.uint64) + (
            np.uint64(1) << (np.uint64(63) - np.uint64(2) * self.level.astype(np.uint64))
        )
        self.sub_end = np.searchsorted(nodes_u, hi_u).astype(np.int64)
        # parent index (parents of retained nodes are retained:
        # parent.total >= child.total >= prune_below)
        parent_qt = np.where(self.level > 0,
                             qt_round(nodes, np.maximum(self.level - 1, 0)), 0)
        self.parent = np.searchsorted(nodes, parent_qt).astype(np.int64)
        self.alive = np.ones(len(nodes), dtype=bool)

    def pass_accept(self, absmin: int, mn: int, mx: int,
                    require_count: bool = True):
        """One window pass: the accepted set of ``findGroupIntFlat``
        (qttree.go:370-439) computed from start-of-pass totals.

        Within a pass, pre-order guarantees every decision depends only on
        start-of-pass state (ancestors are visited before their subtrees
        are clipped), so acceptance = predicate & not-shadowed-by-accepted-
        ancestor; see find_qt_groups docstring.
        """
        n = len(self.qt)
        alive, total, count = self.alive, self.total, self.count
        # alls: no alive child with total > absmin
        child = alive.copy()
        child[0] = False  # root is its own parent
        big_child = child & (total > absmin)
        has_big = np.zeros(n, dtype=bool)
        has_big[self.parent[big_child]] = True
        alls = ~has_big
        countable = (count != 0) if require_count else np.ones(n, dtype=bool)
        pred = (
            alive
            & countable
            & (total >= mn)
            & ((total == count) | (total <= mx) | alls)
        )
        if not pred.any():
            return np.zeros(0, dtype=np.int64)
        # unshadow: drop nodes inside an earlier (pre-order) accepted subtree
        idx = np.flatnonzero(pred)
        ends = self.sub_end[idx]
        run_end = np.maximum.accumulate(
            np.concatenate([[0], ends[:-1]])
        )
        accepted = idx[idx >= run_end]
        # also must drop nodes shadowed by a non-adjacent earlier interval:
        # run_end handles it since intervals are nested-or-disjoint and
        # maximum.accumulate carries the furthest end seen so far.
        return accepted

    def remove_accepted(self, accepted: np.ndarray) -> None:
        """Detach accepted subtrees; clip ancestor totals (qttree.go:91-122)."""
        if len(accepted) == 0:
            return
        acc_tot = self.total[accepted]
        # mark dead: all nodes in accepted intervals
        delta = np.zeros(len(self.qt) + 1, dtype=np.int64)
        np.add.at(delta, accepted, 1)
        np.add.at(delta, self.sub_end[accepted], -1)
        inside = np.cumsum(delta[:-1]) > 0
        self.alive &= ~inside
        # clip: for every alive node j, subtract accepted totals falling in
        # its subtree position-range (accepted subtrees are disjoint)
        acc_cum = np.concatenate([[0], np.cumsum(acc_tot)])
        jpos = np.arange(len(self.qt))
        a = np.searchsorted(accepted, jpos)
        b = np.searchsorted(accepted, self.sub_end)
        removed_in_sub = acc_cum[b] - acc_cum[a]
        self.total = self.total - np.where(self.alive, removed_in_sub, 0)


def find_qt_groups(
    leaf_qts, weights, target: int = 8000, minimum: int = 500,
    require_count: bool = True,
):
    """Vectorized ``FindQtGroups`` (qttree.go:508-627).

    Input: per-tile counts (the result of a distributed
    ``groupby(qt_round(qt, max_level)).count()``).  Output:
    ``(group_qts, group_counts)`` int64 arrays — the output tile
    partition.  Conservation: ``group_counts.sum() == weights.sum()``.

    Semantics proof sketch for the vectorized pass: the reference
    traversal is pre-order; removal of an accepted subtree only mutates
    the totals of its *ancestors*, all of which were visited before it,
    and never revisited within the pass.  Hence the accepted set of a
    pass is exactly {nodes whose predicate holds on start-of-pass totals,
    minus nodes having a pre-order-earlier accepted proper ancestor} —
    which is what :meth:`_ArrayTrie.pass_accept` computes.  The widening
    loop additionally jumps over provably-empty windows (acceptance is
    monotone in the window; no removals happen in empty windows so the
    'alls' clause cannot newly activate).

    Documented divergence from the reference: leftover dust (weight that
    can never be accepted) is folded into root tile 0 instead of
    panicking (qttree.go:592-617).

    ``require_count``: the reference only accepts nodes whose tile holds
    weight *exactly at* the node (``t.count != 0``, qttree.go:347,417) —
    which works for OSM's mixed-depth qts but degenerates on point-only
    corpora where all weight sits at max_level leaves (every internal
    node has count==0 → everything is dust → one giant root tile).
    ``require_count=False`` drops that clause, making any subtree whose
    total fits the window groupable — the natural generalization of the
    max-per-tile split rule for web-page point data.  Parity tests run
    with ``True``; the tiling pipelines use ``False``.
    """
    trie = _ArrayTrie(leaf_qts, weights, prune_below=minimum)
    orig_total = int(trie.total[0]) if len(trie.qt) else 0
    mn = target - 50
    mx = target + 50
    found_zero = False
    out_qts: list[int] = []
    out_tot: list[int] = []

    while trie.total[0] > 1000 and not found_zero:
        while True:
            acc = trie.pass_accept(minimum, mn, mx, require_count)
            if len(acc) == 0:
                break
            if acc[0] == 0:
                found_zero = True
            out_qts.extend(trie.qt[acc].tolist())
            out_tot.extend(trie.total[acc].tolist())
            trie.remove_accepted(acc)
            if found_zero:
                break
        if found_zero:
            break
        # window jump (see find_qt_groups_slow for the rationale)
        alive = trie.alive & (trie.total > 0)
        if require_count:
            alive = alive & (trie.count != 0)
        t = trie.total[alive]
        k_cands = []
        lo = t[(t < mn) & (t >= minimum)]
        if len(lo):
            k_cands.append(int(np.ceil((mn - lo.max()) / 50)))
        hi_mask = alive & (trie.total > mx) & (trie.total != trie.count)
        hi = trie.total[hi_mask]
        if len(hi):
            k_cands.append(int(np.ceil((hi.min() - mx) / 50)))
        if not k_cands:
            break
        k = max(1, min(k_cands))
        mn = max(mn - 50 * k, minimum)
        mx += 50 * k
        if mx > 1_000_000:
            break

    leftover = int(trie.total[0])
    if not found_zero and leftover > 0:
        out_qts.append(0)
        out_tot.append(leftover)

    gq = np.asarray(out_qts, dtype=np.int64)
    gt = np.asarray(out_tot, dtype=np.int64)
    # merge duplicates (root tile may appear from both loop and leftover)
    uq, inv = np.unique(gq, return_inverse=True)
    tot = np.zeros(len(uq), dtype=np.int64)
    np.add.at(tot, inv, gt)
    if tot.sum() != orig_total:
        raise AssertionError(
            f"split-rule conservation violated: {tot.sum()} != {orig_total}"
        )
    return uq, tot
