"""Consistency-aligner tests (the production scenario-A backbone path).

The reference's backbone quality comes from MAFFT L-INS-i inside MAGUS
(witch_msa/tools/magus/align/aligner.py:69-102); progressive-only
methods collapse on WITCH's twilight-zone inputs. These tests guard the
ProbCons-style replacement: pair-HMM posterior sanity, native-vs-scipy
consistency transform equivalence, and end-to-end quality on a
divergent synthetic family with tracked ground truth.
"""

import numpy as np
import pytest

from witch_tpu.core.alphabet import ALPHABETS

AB = "ACGT"


def _evolve(rng, pairs, p_sub, p_indel):
    out = []
    for ch, ap in pairs:
        r = rng.random()
        if r < p_indel / 2:
            continue
        sub = AB[rng.integers(4)] if rng.random() < p_sub else ch
        out.append((sub, ap))
        if r < p_indel:
            out.append((AB[rng.integers(4)], -1))
    return out


def _family(rng, n, anc_len=400, n_clades=5, p_sub=0.2, p_indel=0.05):
    anc = [(AB[rng.integers(4)], i) for i in range(anc_len)]
    inner = [_evolve(rng, anc, p_sub, p_indel) for _ in range(n_clades)]
    names, seqs, truth = [], [], []
    for i in range(n):
        t = _evolve(rng, inner[int(rng.integers(n_clades))],
                    p_sub, p_indel)
        names.append("t%d" % i)
        seqs.append("".join(ch for ch, _ in t))
        truth.append(np.array([ap for _, ap in t]))
    return names, seqs, truth


def _sp_recall(aln, names, seqs, truth, max_pairs=400):
    gap = aln.alphabet.gap_code
    name_to_i = {nm: i for i, nm in enumerate(aln.names)}
    res_col = []
    for i, nm in enumerate(names):
        row = aln.codes[name_to_i[nm]]
        nz = np.flatnonzero(row != gap)
        assert nz.size == len(seqs[i])
        res_col.append(nz)
    hit = denom = 0
    n = len(names)
    pairs = [(a, b) for a in range(n) for b in range(a + 1, n)]
    for a, b in pairs[:max_pairs]:
        ma = {ap: r for r, ap in enumerate(truth[a]) if ap >= 0}
        mb = {ap: r for r, ap in enumerate(truth[b]) if ap >= 0}
        for ap in set(ma) & set(mb):
            denom += 1
            hit += int(res_col[a][ma[ap]] == res_col[b][mb[ap]])
    return hit / max(denom, 1)


def test_pairhmm_posterior_properties():
    from witch_tpu.backbone_consistency import _emission_odds
    from witch_tpu.native import _pairhmm
    al = ALPHABETS["dna"]
    em = _emission_odds(al, 0.12)
    rng = np.random.default_rng(3)
    A = rng.integers(0, 4, 200).astype(np.int32)
    # identical sequences: diagonal posterior ~1
    I, J, P, ea = _pairhmm.posterior(A, A, em, 0.01, 0.75, 0.01)
    diag = P[I == J]
    assert diag.size == 200 and diag.min() > 0.95
    assert ea > 0.95
    # symmetry: posterior(A, B) == posterior(B, A) transposed
    B = np.concatenate([A[:90], rng.integers(0, 4, 40).astype(np.int32),
                        A[110:]])
    I1, J1, P1, ea1 = _pairhmm.posterior(A, B, em, 0.01, 0.75, 0.001)
    I2, J2, P2, ea2 = _pairhmm.posterior(B, A, em, 0.01, 0.75, 0.001)
    d1 = {(i, j): p for i, j, p in zip(I1, J1, P1)}
    d2 = {(j, i): p for i, j, p in zip(I2, J2, P2)}
    assert set(d1) == set(d2)
    common = [abs(d1[k] - d2[k]) for k in d1]
    assert max(common) < 1e-5
    assert abs(ea1 - ea2) < 1e-9
    # row mass is a probability
    import collections
    s = collections.defaultdict(float)
    for i, p in zip(I1, P1):
        s[i] += p
    assert max(s.values()) <= 1.0 + 1e-5


def test_pairhmm_simd_matches_f64_dense():
    """The AVX-512 f32 posterior path (codes entry) must reproduce the
    f64 scalar recurrence (posterior_dense with a precomputed emission
    matrix) to well under the 0.01 sparsity cutoff."""
    from witch_tpu.backbone_consistency import _emission_odds
    from witch_tpu.native import _pairhmm

    al = ALPHABETS["dna"]
    em = _emission_odds(al, 0.12)
    rng = np.random.default_rng(3)
    A = rng.integers(0, 4, 300).astype(np.int32)
    B = A.copy()
    m = rng.random(300) < 0.3
    B[m] = rng.integers(0, 4, m.sum())
    B = np.concatenate([B[:120], rng.integers(0, 4, 25).astype(np.int32),
                        B[140:]]).astype(np.int32)
    I1, J1, P1, ea1 = _pairhmm.posterior(A, B, em, 0.01, 0.75, 0.001)
    EM = np.ascontiguousarray(em[A][:, B])
    I2, J2, P2, ea2 = _pairhmm.posterior_dense(EM, 0.01, 0.75, 0.001)
    d1 = {(i, j): p for i, j, p in zip(I1, J1, P1)}
    d2 = {(i, j): p for i, j, p in zip(I2, J2, P2)}
    shared = set(d1) & set(d2)
    assert len(shared) > 0.99 * max(len(d1), len(d2))
    assert max(abs(d1[k] - d2[k]) for k in shared) < 1e-4
    for k in set(d1) ^ set(d2):   # cutoff-boundary flips only
        assert (d1.get(k) or d2.get(k)) < 0.0015
    assert abs(ea1 - ea2) < 1e-4


def test_consistency_transform_matches_scipy():
    import scipy.sparse as sp
    from witch_tpu.backbone_consistency import (_get,
                                                consistency_transform,
                                                pairwise_posteriors)
    al = ALPHABETS["dna"]
    rng = np.random.default_rng(5)
    names, seqs, _ = _family(rng, 8, anc_len=150)
    codes = [al.encode(s) for s in seqs]
    post, D = pairwise_posteriors(codes, al, workers=2)
    native = consistency_transform(post, 8, workers=2)
    for key in list(post)[:5]:
        x, z = key
        acc = 2.0 * post[key]
        for y in range(8):
            if y in key:
                continue
            acc = acc + _get(post, x, y) @ _get(post, y, z)
        acc = acc * (1.0 / 8)
        acc.data[acc.data < 0.01] = 0.0
        acc.eliminate_zeros()
        diff = native[key] - acc.tocsr()
        assert (abs(diff).max() if diff.nnz else 0.0) < 1e-5


def test_consistency_align_quality():
    from witch_tpu.backbone_consistency import consistency_align
    rng = np.random.default_rng(11)
    names, seqs, truth = _family(rng, 24, anc_len=300)
    aln = consistency_align(names, seqs, "dna", refine_rounds=20,
                            workers=4)
    assert aln.n_seqs == 24
    med = float(np.median([len(s) for s in seqs]))
    assert aln.n_cols <= 3.0 * med
    rec = _sp_recall(aln, names, seqs, truth)
    assert rec >= 0.70, "consistency SP-recall %.3f below floor" % rec


def test_consistency_align_amino():
    from witch_tpu.backbone_consistency import consistency_align
    rng = np.random.default_rng(17)
    AAs = "ACDEFGHIKLMNPQRSTVWY"
    anc = [(AAs[rng.integers(20)], i) for i in range(200)]

    def evolve(pairs, p_sub, p_indel):
        out = []
        for ch, ap in pairs:
            if rng.random() < p_indel / 2:
                continue
            sub = AAs[rng.integers(20)] if rng.random() < p_sub else ch
            out.append((sub, ap))
            if rng.random() < p_indel:
                out.append((AAs[rng.integers(20)], -1))
        return out

    names, seqs, truth = [], [], []
    for i in range(14):
        t = evolve(anc, 0.25, 0.04)
        names.append("p%d" % i)
        seqs.append("".join(ch for ch, _ in t))
        truth.append(np.array([ap for _, ap in t]))
    aln = consistency_align(names, seqs, "amino", refine_rounds=10,
                            workers=4)
    assert aln.n_seqs == 14
    rec = _sp_recall(aln, names, seqs, truth, max_pairs=91)
    assert rec >= 0.75, "amino SP-recall %.3f below floor" % rec


def test_align_backbone_consistency_subsets():
    from witch_tpu.backbone_consistency import align_backbone_consistency
    rng = np.random.default_rng(13)
    names, seqs, truth = _family(rng, 42, anc_len=250)
    aln = align_backbone_consistency(names, seqs, "dna", subset_size=16,
                                     refine_rounds=10, workers=4)
    assert aln.n_seqs == 42
    assert list(aln.names) == names
    med = float(np.median([len(s) for s in seqs]))
    assert aln.n_cols <= 3.5 * med
    rec = _sp_recall(aln, names, seqs, truth)
    assert rec >= 0.60, "subset-merge SP-recall %.3f below floor" % rec


def test_align_backbone_consistency_pasta_iteration():
    """iters=2 (the --backbone-method pasta path): second pass re-derives
    clusters/merge order from the first-pass alignment and must keep all
    sequences, bounded width, and at least the single-pass quality floor."""
    from witch_tpu.backbone_consistency import align_backbone_consistency
    rng = np.random.default_rng(29)
    names, seqs, truth = _family(rng, 42, anc_len=250)
    aln = align_backbone_consistency(names, seqs, "dna", subset_size=16,
                                     refine_rounds=10, iters=2, workers=4)
    assert aln.n_seqs == 42
    assert list(aln.names) == names
    med = float(np.median([len(s) for s in seqs]))
    assert aln.n_cols <= 3.5 * med
    rec = _sp_recall(aln, names, seqs, truth)
    assert rec >= 0.60, "pasta-iteration SP-recall %.3f below floor" % rec
