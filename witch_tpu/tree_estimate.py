"""Backbone tree estimation (scenario C: backbone alignment given, tree
missing; reference runs FastTree2 there, witch_msa/gcmm/backbone.py:296-319).

TPU-native design: pairwise identity fractions come from one one-hot
matmul batch on device (the O(n^2 L) part); Jukes-Cantor correction and
neighbor-joining run on host. NJ topology is what the centroid
decomposition needs; branch lengths are JC distances.

This does not replicate FastTree's ML heuristics bit-for-bit (documented
divergence: scenario C outputs are decomposition-equivalent, not
bit-identical to the reference's FastTree-based run).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .core.alignment import PackedAlignment


def pairwise_distances(aln: PackedAlignment, use_device: bool = True
                       ) -> np.ndarray:
    """JC-corrected pairwise distances [n, n].

    Identity over mutually ungapped canonical positions; degenerate codes
    are treated as missing (excluded), as distance tools commonly do.
    """
    K = aln.alphabet.K
    codes = aln.codes.astype(np.int64)
    canon = codes < K
    n, L = codes.shape
    onehot = np.zeros((n, L, K), dtype=np.float32)
    rows, cols = np.nonzero(canon)
    onehot[rows, cols, codes[rows, cols]] = 1.0
    flat = onehot.reshape(n, L * K)
    maskf = canon.astype(np.float32)
    if use_device:
        try:
            import jax.numpy as jnp
            matches = np.asarray(jnp.asarray(flat) @ jnp.asarray(flat).T)
            denom = np.asarray(jnp.asarray(maskf) @ jnp.asarray(maskf).T)
        except Exception:
            use_device = False
    if not use_device:
        matches = flat @ flat.T
        denom = maskf @ maskf.T
    with np.errstate(divide="ignore", invalid="ignore"):
        p = 1.0 - matches / np.maximum(denom, 1.0)
    p = np.clip(p, 0.0, 0.95 * (K - 1) / K)
    # Jukes-Cantor: d = -(K-1)/K * ln(1 - K/(K-1) p)
    with np.errstate(divide="ignore"):
        d = -(K - 1) / K * np.log(1.0 - K / (K - 1) * p)
    np.fill_diagonal(d, 0.0)
    return d.astype(np.float64)


def neighbor_joining(dist: np.ndarray, names: List[str]) -> str:
    """Classic NJ; returns a newick string (trifurcating root)."""
    n = dist.shape[0]
    assert n == len(names)
    if n == 1:
        return "(%s);" % names[0]
    if n == 2:
        d = max(dist[0, 1], 0.0)
        return "(%s:%.5f,%s:%.5f);" % (names[0], d / 2, names[1], d / 2)
    D = dist.copy()
    active = list(range(n))
    newick = {i: names[i] for i in range(n)}
    INF = np.inf
    while len(active) > 3:
        m = len(active)
        idx = np.array(active)
        sub = D[np.ix_(idx, idx)]
        r = sub.sum(axis=1)
        q = (m - 2) * sub - r[:, None] - r[None, :]
        np.fill_diagonal(q, INF)
        a, b = np.unravel_index(np.argmin(q), q.shape)
        i, j = idx[a], idx[b]
        dij = sub[a, b]
        di = 0.5 * dij + (r[a] - r[b]) / (2 * (m - 2))
        dj = dij - di
        di, dj = max(di, 0.0), max(dj, 0.0)
        # new node
        newD = 0.5 * (D[i, idx] + D[j, idx] - dij)
        k = D.shape[0]
        D = np.pad(D, ((0, 1), (0, 1)))
        D[k, idx] = newD
        D[idx, k] = newD
        D[k, k] = 0.0
        newick[k] = "(%s:%.5f,%s:%.5f)" % (newick[i], di, newick[j], dj)
        active = [x for x in active if x not in (i, j)] + [k]
    i, j, k = active
    dij, dik, djk = D[i, j], D[i, k], D[j, k]
    bi = max(0.0, 0.5 * (dij + dik - djk))
    bj = max(0.0, 0.5 * (dij + djk - dik))
    bk = max(0.0, 0.5 * (dik + djk - dij))
    return "(%s:%.5f,%s:%.5f,%s:%.5f);" % (newick[i], bi, newick[j], bj,
                                           newick[k], bk)


class _Tree:
    """Light rooted view of an unrooted newick (root = trifurcation)."""

    def __init__(self):
        self.children: List[List[int]] = []
        self.parent: List[int] = []
        self.name: List[Optional[str]] = []
        self.blen: List[float] = []

    def add(self, parent: int, name=None, blen=0.0) -> int:
        i = len(self.children)
        self.children.append([])
        self.parent.append(parent)
        self.name.append(name)
        self.blen.append(blen)
        if parent >= 0:
            self.children[parent].append(i)
        return i

    @classmethod
    def parse(cls, newick: str) -> "_Tree":
        t = cls()
        s = newick.strip().rstrip(";")
        pos = 0
        root = t.add(-1)
        cur = root

        def read_label(p):
            j = p
            while j < len(s) and s[j] not in ",():;":
                j += 1
            return s[p:j], j

        while pos < len(s):
            ch = s[pos]
            if ch == "(":
                cur = t.add(cur)
                pos += 1
            elif ch == ",":
                cur = t.parent[cur]
                cur = t.add(cur)
                pos += 1
            elif ch == ")":
                cur = t.parent[cur]
                pos += 1
                if pos < len(s) and s[pos] not in ",():;":
                    lbl, pos = read_label(pos)  # internal label: ignore
            elif ch == ":":
                lbl, pos2 = read_label(pos + 1)
                t.blen[cur] = float(lbl)
                pos = pos2
            else:
                lbl, pos = read_label(pos)
                t.name[cur] = lbl
        # collapse the double root introduced by the leading "("
        if len(t.children[root]) == 1:
            only = t.children[root][0]
            for c in t.children[only]:
                t.parent[c] = root
            t.children[root] = t.children[only]
            t.children[only] = []
        return t

    def newick(self) -> str:
        def rec(i):
            if not self.children[i]:
                return "%s:%.5f" % (self.name[i], self.blen[i])
            inner = ",".join(rec(c) for c in self.children[i])
            if self.parent[i] < 0:
                return "(%s);" % inner
            return "(%s):%.5f" % (inner, self.blen[i])
        root = next(i for i in range(len(self.children))
                    if self.parent[i] < 0)
        return rec(root)


def nni_refine(newick: str, aln: PackedAlignment, max_sweeps: int = 30,
               log=None) -> str:
    """Fitch-parsimony NNI refinement of an NJ topology.

    The reference estimates this tree with FastTree2's ML heuristics
    (witch_msa/gcmm/backbone.py:296-319); plain NJ topologies are
    measurably worse for centroid decomposition. Each sweep computes
    Fitch state-set bitmasks up and down the tree (vectorized over
    alignment columns), then evaluates the two alternative pairings of
    the four subtrees around every internal edge with the local-quartet
    parsimony criterion and applies improving swaps."""
    K = aln.alphabet.K
    if K > 30:
        return newick
    t = _Tree.parse(newick)
    n_nodes = len(t.children)
    name_to_row = {nm: r for r, nm in enumerate(aln.names)}
    codes = aln.codes
    L = codes.shape[1]
    full = np.uint32((1 << K) - 1)

    leaf_mask = np.zeros((n_nodes, L), np.uint32)
    for i in range(n_nodes):
        if not t.children[i] and t.name[i] is not None:
            row = codes[name_to_row[t.name[i]]]
            m = np.where(row < K, np.uint32(1) << row.astype(np.uint32),
                         full)
            leaf_mask[i] = m

    def combine(a, b):
        inter = a & b
        empty = inter == 0
        out = np.where(empty, a | b, inter)
        return out, empty

    def fitch_score():
        order = []
        stack = [next(i for i in range(n_nodes) if t.parent[i] < 0)]
        seen = []
        while stack:
            x = stack.pop()
            seen.append(x)
            stack.extend(t.children[x])
        up_l = {}
        score = 0
        for x in seen[::-1]:
            if not t.children[x]:
                up_l[x] = leaf_mask[x]
            else:
                acc = up_l[t.children[x][0]]
                for c in t.children[x][1:]:
                    acc, e = combine(acc, up_l[c])
                    score += int(e.sum())
            if t.children[x]:
                up_l[x] = acc
        return score

    improved_total = 0
    best_score = fitch_score()
    best_state = ([list(c) for c in t.children], list(t.parent))
    for sweep in range(max_sweeps):
        order = []
        stack = [next(i for i in range(n_nodes) if t.parent[i] < 0)]
        seen = []
        while stack:
            x = stack.pop()
            seen.append(x)
            stack.extend(t.children[x])
        order = seen[::-1]                      # post-order
        up = np.zeros((n_nodes, L), np.uint32)
        for x in order:
            if not t.children[x]:
                up[x] = leaf_mask[x]
            else:
                acc = up[t.children[x][0]]
                for c in t.children[x][1:]:
                    acc, _ = combine(acc, up[c])
                up[x] = acc
        down = np.full((n_nodes, L), full, np.uint32)
        for x in seen:                          # pre-order
            p = t.parent[x]
            if p < 0:
                continue
            acc = None
            if t.parent[p] >= 0:
                acc = down[p]
            for sib in t.children[p]:
                if sib == x:
                    continue
                acc = up[sib] if acc is None else combine(acc, up[sib])[0]
            down[x] = acc if acc is not None else full

        def pair_cost(a, b):
            s, e = combine(a, b)
            return s, e.astype(np.int64)

        improved = 0
        dirty = set()
        for v in range(n_nodes):
            if t.parent[v] < 0 or not t.children[v]:
                continue
            u = t.parent[v]
            if len(t.children[v]) != 2:
                continue
            if v in dirty or u in dirty:
                continue
            A, B = t.children[v]
            sibs = [c for c in t.children[u] if c != v]
            if not sibs:
                continue
            C = sibs[0]
            # D = everything above u plus u's other children beyond C
            # the quartet {A, B, C, rest}: rest = down of u combined
            # with u's children other than v and C
            acc = None
            if t.parent[u] >= 0:
                acc = down[u]
            for c in t.children[u]:
                if c in (v, C):
                    continue
                acc = up[c] if acc is None else combine(acc, up[c])[0]
            if acc is None:
                continue
            SA, SB, SC, SR = up[A], up[B], up[C], acc
            sAB, cAB = pair_cost(SA, SB)
            sCR, cCR = pair_cost(SC, SR)
            _, c3 = pair_cost(sAB, sCR)
            cost_cur = int((cAB + cCR + c3).sum())
            sAC, cAC = pair_cost(SA, SC)
            sBR, cBR = pair_cost(SB, SR)
            _, c3a = pair_cost(sAC, sBR)
            cost_a = int((cAC + cBR + c3a).sum())
            sBC, cBC = pair_cost(SB, SC)
            sAR, cAR = pair_cost(SA, SR)
            _, c3b = pair_cost(sBC, sAR)
            cost_b = int((cBC + cAR + c3b).sum())
            best = min(cost_cur, cost_a, cost_b)
            if best == cost_cur:
                continue
            # apply swap: exchange C with B (alt a) or with A (alt b)
            swap_child = B if best == cost_a else A
            t.children[v].remove(swap_child)
            t.children[u].remove(C)
            t.children[v].append(C)
            t.children[u].append(swap_child)
            t.parent[C] = v
            t.parent[swap_child] = u
            improved += 1
            # up/down vectors are stale around the swap: lock the
            # neighborhood for the rest of this sweep
            dirty.update((u, v, t.parent[u]))
            dirty.update(t.children[u])
            dirty.update(t.children[v])
        score = fitch_score()
        if log:
            log("nni sweep %d: %d swaps, parsimony %d (best %d)"
                % (sweep, improved, score, best_score))
        if score < best_score:
            best_score = score
            best_state = ([list(c) for c in t.children], list(t.parent))
            improved_total += improved
        else:
            break
        if improved == 0:
            break
    t.children = [list(c) for c in best_state[0]]
    t.parent = list(best_state[1])
    if log and improved_total:
        log("nni refinement: %d swaps kept, parsimony %d" % (
            improved_total, best_score))
    return t.newick()


def estimate_tree(aln: PackedAlignment, out_path: Optional[str] = None,
                  nni: bool = True, log=None) -> str:
    d = pairwise_distances(aln)
    nwk = neighbor_joining(d, aln.names)
    if nni:
        try:
            nwk = nni_refine(nwk, aln, log=log)
        except Exception as e:
            if log:
                log("nni refinement skipped (%s)" % e)
    if out_path:
        with open(out_path, "w") as f:
            f.write(nwk + "\n")
    return nwk
