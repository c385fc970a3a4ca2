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


def ml_refine(newick: str, aln: PackedAlignment, max_sweeps: int = 8,
              log=None) -> str:
    """Jukes-Cantor maximum-likelihood NNI refinement.

    Approximates what the reference gets from FastTree2's ML stage
    (witch_msa/gcmm/backbone.py:296-319) without shelling out: per-node
    conditional likelihood vectors over compressed site patterns, one
    branch-length pass plus one NNI pass per sweep.

    The JC structure collapses every P(t)-matvec to
    ``e*v + (1-e)/K * sum(v)`` with ``e = exp(-K t/(K-1))``, so both
    passes are pure vector ops over [patterns, K] arrays.  NNI
    candidates around an internal edge share the four subtree CLVs, so
    per-site scaling factors cancel and the three pairings are compared
    by exact conditional likelihood with the central branch length
    re-optimized (golden-section over e) for each pairing.
    """
    K = aln.alphabet.K
    t = _Tree.parse(newick)
    n_nodes = len(t.children)
    root = next(i for i in range(n_nodes) if t.parent[i] < 0)
    name_to_row = {nm: r for r, nm in enumerate(aln.names)}
    # site-pattern compression: identical columns share one CLV slot
    pat, w = np.unique(aln.codes.T, axis=0, return_counts=True)
    P = pat.shape[0]
    w = w.astype(np.float64)
    E_MIN = float(np.exp(-K / (K - 1) * 10.0))    # t <= 10
    E_MAX = 1.0 - 1e-9                            # t >= ~0

    def make_leaf(i):
        row = pat[:, name_to_row[t.name[i]]]
        m = np.ones((P, K))
        ok = row < K
        m[ok] = 0.0
        m[ok, row[ok]] = 1.0
        return m

    def e_of(blen):
        b = min(max(float(blen), 1e-8), 10.0)
        return float(np.exp(-K / (K - 1) * b))

    def t_of(e):
        return -(K - 1) / K * float(np.log(min(max(e, E_MIN), E_MAX)))

    def pv(clv, e):
        return e * clv + (1.0 - e) / K * clv.sum(-1, keepdims=True)

    def opt_e(a, bk, e0):
        """maximize f(e) = w . log(e*a + (1-e)*bk); golden section."""
        lo, hi = E_MIN, E_MAX

        def f(e):
            return float(w @ np.log(np.maximum(e * a + (1 - e) * bk,
                                               1e-300)))
        gr = 0.6180339887498949
        c = hi - gr * (hi - lo)
        d_ = lo + gr * (hi - lo)
        fc, fd = f(c), f(d_)
        for _ in range(28):
            if fc >= fd:
                hi, d_, fd = d_, c, fc
                c = hi - gr * (hi - lo)
                fc = f(c)
            else:
                lo, c, fc = c, d_, fd
                d_ = lo + gr * (hi - lo)
                fd = f(d_)
        e = 0.5 * (lo + hi)
        fe = f(e)
        f0 = f(e0)
        # strict improvement only: on a flat objective the bracket
        # drifts toward an arbitrary end -- keep the current length
        return (e, fe) if fe > f0 + 1e-9 else (e0, f0)

    def orders():
        seen = []
        stack = [root]
        while stack:
            x = stack.pop()
            seen.append(x)
            stack.extend(t.children[x])
        return seen                                # pre-order

    def passes():
        pre = orders()
        up = np.empty((n_nodes, P, K))
        slog = np.zeros((n_nodes, P))
        for x in pre[::-1]:
            if not t.children[x]:
                up[x] = make_leaf(x)
                slog[x] = 0.0
                continue
            acc = None
            sl = np.zeros(P)
            for c in t.children[x]:
                pc = pv(up[c], e_of(t.blen[c]))
                acc = pc if acc is None else acc * pc
                sl += slog[c]
            m = np.maximum(acc.max(-1), 1e-300)
            up[x] = acc / m[:, None]
            slog[x] = sl + np.log(m)
        down = np.ones((n_nodes, P, K))
        dlog = np.zeros((n_nodes, P))
        for x in pre:
            p = t.parent[x]
            if p < 0:
                continue
            acc = None
            sl = np.zeros(P)
            if t.parent[p] >= 0:
                acc = pv(down[p], e_of(t.blen[p]))
                sl += dlog[p]
            for sib in t.children[p]:
                if sib == x:
                    continue
                ps = pv(up[sib], e_of(t.blen[sib]))
                acc = ps if acc is None else acc * ps
                sl += slog[sib]
            m = np.maximum(acc.max(-1), 1e-300)
            down[x] = acc / m[:, None]
            dlog[x] = sl + np.log(m)
        return up, slog, down, dlog

    def total_loglik(up, slog):
        like = up[root].sum(-1) / K
        return float(w @ (np.log(np.maximum(like, 1e-300)) + slog[root]))

    def save_state():
        return ([list(c) for c in t.children], list(t.parent),
                list(t.blen))

    def restore_state(st):
        t.children = [list(c) for c in st[0]]
        t.parent = list(st[1])
        t.blen = list(st[2])

    def bl_pass():
        """One Jacobi round of per-edge length optimization on frozen
        CLVs (edges interact, so the outer loop verifies globally)."""
        up, slog, down, dlog = passes()
        for x in orders():
            if t.parent[x] < 0:
                continue
            a = (up[x] * down[x]).sum(-1)
            bk = up[x].sum(-1) * down[x].sum(-1) / K
            e, _ = opt_e(a, bk, e_of(t.blen[x]))
            t.blen[x] = t_of(e)

    def nni_pass(max_swaps):
        up, slog, down, dlog = passes()
        swaps = 0
        dirty = set()
        for v in range(n_nodes):
            u = t.parent[v]
            if u < 0 or len(t.children[v]) != 2:
                continue
            if v in dirty or u in dirty:
                continue
            A, B = t.children[v]
            sibs = [c for c in t.children[u] if c != v]
            if not sibs:
                continue
            C = sibs[0]
            acc = None
            if t.parent[u] >= 0:
                acc = pv(down[u], e_of(t.blen[u]))
            for c in t.children[u]:
                if c in (v, C):
                    continue
                pc = pv(up[c], e_of(t.blen[c]))
                acc = pc if acc is None else acc * pc
            if acc is None:
                continue
            UA = pv(up[A], e_of(t.blen[A]))
            UB = pv(up[B], e_of(t.blen[B]))
            UC = pv(up[C], e_of(t.blen[C]))
            UR = acc
            e0 = e_of(t.blen[v])
            res = []
            for x_, y_ in ((UA * UB, UC * UR), (UA * UC, UB * UR),
                           (UB * UC, UA * UR)):
                a = (x_ * y_).sum(-1)
                bk = x_.sum(-1) * y_.sum(-1) / K
                res.append(opt_e(a, bk, e0))
            cur, alt_a = res[0], res[1]
            best = max(res, key=lambda r: r[1])
            if best[1] <= cur[1] + 1e-4:
                continue
            swap_child = B if best is alt_a else A
            t.children[v].remove(swap_child)
            t.children[u].remove(C)
            t.children[v].append(C)
            t.children[u].append(swap_child)
            t.parent[C] = v
            t.parent[swap_child] = u
            t.blen[v] = t_of(best[0])
            swaps += 1
            if swaps >= max_swaps:
                break
            # CLVs are stale after a swap everywhere on the path to the
            # root; lock the immediate neighborhood and let the outer
            # monotone guard catch cross-talk between distant swaps
            dirty.update((u, v, t.parent[u]))
            dirty.update(t.children[u])
            dirty.update(t.children[v])
        return swaps

    def current_ll():
        up, slog, _, _ = passes()
        return total_loglik(up, slog)

    # monotone outer loop: every phase is verified against the exact
    # recomputed likelihood and reverted if it regressed (Jacobi branch
    # updates and batched stale-CLV swaps are only locally optimal)
    ll_cur = current_ll()
    for sweep in range(max_sweeps):
        st = save_state()
        bl_pass()
        ll_new = current_ll()
        if ll_new > ll_cur + 1e-9:
            ll_cur = ll_new
        else:
            restore_state(st)
        st = save_state()
        swaps = nni_pass(n_nodes)
        progressed = False
        if swaps:
            ll_new = current_ll()
            if ll_new > ll_cur + 1e-9:
                ll_cur = ll_new
                progressed = True
            else:
                # batch conflicted; retry with the single best swap
                restore_state(st)
                if nni_pass(1):
                    ll_new = current_ll()
                    if ll_new > ll_cur + 1e-9:
                        ll_cur = ll_new
                        progressed = True
                        swaps = 1
                    else:
                        restore_state(st)
        if log:
            log("ml sweep %d: logL %.2f, %d swaps%s"
                % (sweep, ll_cur, swaps if progressed else 0,
                   "" if progressed or not swaps else " (reverted)"))
        if not progressed:
            break
    if log:
        log("ml refinement: final logL %.2f" % ll_cur)
    return t.newick()


def estimate_tree(aln: PackedAlignment, out_path: Optional[str] = None,
                  nni: bool = True, ml: bool = False, log=None) -> str:
    d = pairwise_distances(aln)
    nwk = neighbor_joining(d, aln.names)
    if nni:
        try:
            nwk = nni_refine(nwk, aln, log=log)
        except Exception as e:
            if log:
                log("nni refinement skipped (%s)" % e)
    if ml:
        try:
            nwk = ml_refine(nwk, aln, log=log)
        except Exception as e:
            if log:
                log("ml refinement skipped (%s)" % e)
    if out_path:
        with open(out_path, "w") as f:
            f.write(nwk + "\n")
    return nwk
