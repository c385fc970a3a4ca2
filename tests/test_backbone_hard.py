"""Hard-data backbone regression: divergent, indel-rich synthetic family
(1000M1-class difficulty) with tracked ground truth.

Guards the round-2 fix for the progressive-merge width blowup: the
refinement pass (backbone.refine_from_seed) re-profiles the merged
alignment and realigns every sequence, so private insert columns cannot
accumulate. Asserts bounded width and real homology recovery (SP-recall
vs the simulated true alignment). Reference being approximated: the
vendored MAGUS merge (witch_msa/tools/magus/align/merge/graph_build/
graph_builder.py:26-231)."""

import numpy as np
import pytest

from witch_tpu.backbone_magus import align_backbone_magus

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


def _family(rng, n, anc_len=500, n_clades=6, p_sub=0.18, p_indel=0.05):
    anc = [(AB[rng.integers(4)], i) for i in range(anc_len)]
    inner = [_evolve(rng, anc, p_sub, p_indel) for _ in range(n_clades)]
    names, seqs, truth, clade = [], [], [], []
    for i in range(n):
        ci = int(rng.integers(n_clades))
        t = _evolve(rng, inner[ci], p_sub, p_indel)
        names.append("t%d" % i)
        seqs.append("".join(ch for ch, _ in t))
        truth.append(np.array([ap for _, ap in t]))
        clade.append(ci)
    return names, seqs, truth, clade


def test_backbone_hard_width_and_recall():
    rng = np.random.default_rng(7)
    names, seqs, truth, clade = _family(rng, 80)
    med = float(np.median([len(s) for s in seqs]))
    aln = align_backbone_magus(names, seqs, "dna", cluster_size=20)
    assert aln.n_seqs == len(seqs)
    # width must stay bounded (the round-1 failure mode was ~200x)
    assert aln.n_cols <= 5.0 * med, \
        "backbone width blowup: %d cols for median length %d" % (
            aln.n_cols, med)
    # residues preserved
    gap = aln.alphabet.encode("-")[0]
    name_to_i = {nm: i for i, nm in enumerate(aln.names)}
    res_col = []
    for i, nm in enumerate(names):
        row = aln.codes[name_to_i[nm]]
        nz = np.flatnonzero(row != gap)
        assert nz.size == len(seqs[i])
        res_col.append(nz)
    # SP-recall on same-clade pairs (true homologous residue pairs that
    # end up in the same output column)
    hit = denom = 0
    pairs = [(a, b) for a in range(len(names)) for b in range(a + 1,
             len(names)) if clade[a] == clade[b]][:300]
    for a, b in pairs:
        ma = {ap: r for r, ap in enumerate(truth[a]) if ap >= 0}
        mb = {ap: r for r, ap in enumerate(truth[b]) if ap >= 0}
        for ap in set(ma) & set(mb):
            denom += 1
            hit += int(res_col[a][ma[ap]] == res_col[b][mb[ap]])
    recall = hit / max(denom, 1)
    assert recall >= 0.55, \
        "same-clade SP-recall %.2f below floor over %d pairs" % (
            recall, denom)
