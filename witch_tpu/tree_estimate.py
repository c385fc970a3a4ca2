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


def estimate_tree(aln: PackedAlignment, out_path: Optional[str] = None
                  ) -> str:
    d = pairwise_distances(aln)
    nwk = neighbor_joining(d, aln.names)
    if out_path:
        with open(out_path, "w") as f:
            f.write(nwk + "\n")
    return nwk
