"""Consistency-based multiple alignment (the backbone quality engine).

The reference's scenario-A backbone quality comes from MAFFT L-INS-i
inside MAGUS (witch_msa/tools/magus/align/aligner.py:69-102 +
external_tools.py:48-66): all-pairs local alignments feeding a
consistency objective plus iterative refinement. Progressive-only
methods collapse on the twilight-zone data WITCH targets (measured on
examples/data: SP recall ~0.01 progressive vs 0.47-0.54 for
L-INS-i/MAGUS), so this module implements the probabilistic-consistency
architecture (ProbCons-style) on this codebase's array conventions:

  1. pair-HMM match posteriors for all sequence pairs
     (native/pairhmm_kernel.cpp; the same recurrence is the TPU Pallas
     target — [pairs, L, L] wavefront with per-row rescale);
  2. one or more consistency transforms P'_xz = mean_y P_xy P_yz
     (sparse float32 matmuls);
  3. expected-accuracy guide tree (UPGMA over 1 - pairwise EA);
  4. progressive profile merge maximizing summed posteriors
     (native ea_align NW, gap cost 0);
  5. randomized iterative refinement (bipartition, re-project,
     realign) keeping improvements of the EA objective.

This engine aligns the *subsets* (<= ~60 seqs); the full-backbone
driver (backbone_magus.align_backbone_magus) decomposes larger inputs
and merges subset alignments with the same machinery.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .core.alignment import PackedAlignment
from .core.alphabet import ALPHABETS, Alphabet


def _emission_odds(alphabet: Alphabet, match_p: float) -> np.ndarray:
    """[num_codes, num_codes] match emission odds for the pair HMM.

    Canonical joint: P(a,b) = p*pi_a*[a==b] + (1-p)*pi_a*pi_b with the
    molecule background pi; degenerate codes get expectation under
    their expansion; gap codes (never present in degapped input) are
    neutral 1.0.
    """
    from .hmm.priors import get_background
    K = alphabet.K
    bg = get_background(alphabet.name)
    joint = match_p * np.diag(bg) + (1.0 - match_p) * np.outer(bg, bg)
    odds4 = joint / np.outer(bg, bg)
    E = alphabet.expansion_matrix()            # [C, K], gap row zero
    em = E @ odds4 @ E.T
    zero = E.sum(axis=1) == 0
    em[zero, :] = 1.0
    em[:, zero] = 1.0
    return np.ascontiguousarray(em, np.float64)


def pairwise_posteriors(codes: List[np.ndarray], alphabet: Alphabet,
                        match_p: float = 0.35, delta: float = 0.04,
                        eps: float = 0.75, cutoff: float = 0.01,
                        workers: int = 8):
    """All-pairs sparse match posteriors + EA distance matrix.

    Returns (post, D): post[(s, t)] for s < t is a scipy CSR matrix
    [len_s, len_t] of match posteriors; D is the [n, n] 1-EA distance.
    """
    import scipy.sparse as sp
    from .native import _pairhmm

    em = _emission_odds(alphabet, match_p)
    n = len(codes)
    codes32 = [np.ascontiguousarray(c, np.int32) for c in codes]
    tasks = [(s, t) for s in range(n) for t in range(s + 1, n)]

    def one(st):
        s, t = st
        I, J, P, ea = _pairhmm.posterior(codes32[s], codes32[t], em,
                                         delta, eps, cutoff)
        m = sp.csr_matrix((P, (I, J)),
                          shape=(len(codes32[s]), len(codes32[t])),
                          dtype=np.float32)
        return s, t, m, ea

    D = np.zeros((n, n))
    post: Dict[Tuple[int, int], object] = {}
    with ThreadPoolExecutor(max_workers=workers) as ex:
        for s, t, m, ea in ex.map(one, tasks):
            post[(s, t)] = m
            D[s, t] = D[t, s] = 1.0 - ea
    return post, D


def _get(post, s, t):
    if s == t:
        return None
    if (s, t) in post:
        return post[(s, t)]
    return post[(t, s)].T.tocsr()


def consistency_transform(post, n: int, cutoff: float = 0.01,
                          workers: int = 8):
    """One round of P'_xz = (2 P_xz + sum_{y!=x,z} P_xy P_yz) / n."""
    import scipy.sparse as sp

    keys = list(post.keys())

    def one(key):
        x, z = key
        acc = 2.0 * post[key]
        for y in range(n):
            if y == x or y == z:
                continue
            a = _get(post, x, y)
            b = _get(post, y, z)
            acc = acc + a @ b
        acc = acc * (1.0 / n)
        acc.data[acc.data < cutoff] = 0.0
        acc.eliminate_zeros()
        return key, acc.tocsr()

    out = {}
    with ThreadPoolExecutor(max_workers=workers) as ex:
        for key, m in ex.map(one, keys):
            out[key] = m
    return out


def _residue_cols(codes_mat: np.ndarray, gap_code: int) -> List[np.ndarray]:
    """Per-row array mapping residue index -> column index."""
    out = []
    for row in codes_mat:
        out.append(np.flatnonzero(row != gap_code).astype(np.int64))
    return out


def _group_score(post, rowsA: Sequence[int], colsA: List[np.ndarray],
                 WA: int, rowsB: Sequence[int], colsB: List[np.ndarray],
                 WB: int) -> np.ndarray:
    """[WA, WB] summed posterior mass between two aligned groups."""
    S = np.zeros(WA * WB, np.float64)
    for ai, s in enumerate(rowsA):
        ca = colsA[ai]
        for bi, t in enumerate(rowsB):
            m = _get(post, s, t)
            if m.nnz == 0:
                continue
            coo = m.tocoo()
            idx = ca[coo.row] * WB + colsB[bi][coo.col]
            np.add.at(S, idx, coo.data.astype(np.float64))
    return S.reshape(WA, WB)


def _align_groups(post, A_rows, A_codes, B_rows, B_codes, gap_code):
    from .native import _oa  # noqa: F401  (ensures package import order)
    from .native import _pairhmm
    colsA = _residue_cols(A_codes, gap_code)
    colsB = _residue_cols(B_codes, gap_code)
    S = _group_score(post, A_rows, colsA, A_codes.shape[1],
                     B_rows, colsB, B_codes.shape[1])
    ops = np.asarray(_pairhmm.ea_align(np.ascontiguousarray(S)), np.int8)
    nA, nB = A_codes.shape[0], B_codes.shape[0]
    W = len(ops)
    out = np.full((nA + nB, W), gap_code, np.uint8)
    out[:nA, np.flatnonzero(ops != 2)] = A_codes
    out[nA:, np.flatnonzero(ops != 1)] = B_codes
    return out, list(A_rows) + list(B_rows), None


def _ea_objective(post, rows, codes_mat, gap_code) -> float:
    """Total pairwise posterior mass realized by the alignment."""
    cols = _residue_cols(codes_mat, gap_code)
    total = 0.0
    n = len(rows)
    for ai in range(n):
        for bi in range(ai + 1, n):
            m = _get(post, rows[ai], rows[bi])
            if m.nnz == 0:
                continue
            coo = m.tocoo()
            hit = cols[ai][coo.row] == cols[bi][coo.col]
            total += float(coo.data[hit].sum())
    return total


def consistency_align(names: List[str], seqs: List[str], molecule: str,
                      match_p: float = 0.35, delta: float = 0.04,
                      eps: float = 0.75, rounds: int = 2,
                      refine_rounds: int = 50, cutoff: float = 0.01,
                      seed: int = 0, workers: int = 8,
                      log=None) -> PackedAlignment:
    """ProbCons-style alignment of up to ~80 sequences."""
    from .backbone_progressive import upgma_merges

    alphabet = ALPHABETS[molecule]
    seqs = [s.upper() for s in seqs]
    n = len(seqs)
    codes = [alphabet.encode(s) for s in seqs]
    gap_code = alphabet.gap_code
    if n == 1:
        return PackedAlignment(list(names), codes[0][None, :], alphabet)

    post, D = pairwise_posteriors(codes, alphabet, match_p=match_p,
                                  delta=delta, eps=eps, cutoff=cutoff,
                                  workers=workers)
    if log:
        log("consistency: %d pair posteriors, mean EA dist %.3f"
            % (len(post), float(D[np.triu_indices(n, 1)].mean())))
    for r in range(rounds):
        post = consistency_transform(post, n, cutoff=cutoff,
                                     workers=workers)
        if log:
            log("consistency: transform round %d done" % (r + 1))

    merges = upgma_merges(D)
    node: Dict[int, Tuple[List[int], np.ndarray]] = {
        i: ([i], codes[i][None, :].astype(np.uint8)) for i in range(n)}
    for t, (a, b) in enumerate(merges):
        (ra, ca), (rb, cb) = node.pop(a), node.pop(b)
        merged, rows, _ = _align_groups(post, ra, ca, rb, cb, gap_code)
        node[n + t] = (rows, merged)
    rows, mat = node[n + len(merges) - 1]

    # iterative refinement: random bipartition, re-project, realign
    rng = np.random.default_rng(seed)
    cur_obj = _ea_objective(post, rows, mat, gap_code)
    for r in range(refine_rounds):
        if n < 3:
            break
        mask = rng.random(n) < 0.5
        if mask.all() or (~mask).any() is False or mask.sum() in (0, n):
            continue
        ia = np.flatnonzero(mask)
        ib = np.flatnonzero(~mask)
        A_codes = mat[ia]
        B_codes = mat[ib]
        A_codes = A_codes[:, ~(A_codes == gap_code).all(axis=0)]
        B_codes = B_codes[:, ~(B_codes == gap_code).all(axis=0)]
        ra = [rows[i] for i in ia]
        rb = [rows[i] for i in ib]
        merged, new_rows, _ = _align_groups(post, ra, A_codes, rb,
                                            B_codes, gap_code)
        new_obj = _ea_objective(post, new_rows, merged, gap_code)
        if new_obj > cur_obj:
            rows, mat, cur_obj = new_rows, merged, new_obj
    if log:
        log("consistency: %d seqs -> %d cols (EA obj %.1f)"
            % (n, mat.shape[1], cur_obj))

    aln = PackedAlignment([names[i] for i in rows], mat, alphabet)
    aln, _ = aln.delete_all_gap_columns()
    order = {nm: i for i, nm in enumerate(aln.names)}
    sel = [order[nm] for nm in names]
    return PackedAlignment(list(names), aln.codes[sel], alphabet)
