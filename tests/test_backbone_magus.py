"""MAGUS-lite backbone units: clustering determinism + merge splicing."""

import numpy as np

from witch_tpu.core.alignment import PackedAlignment
from witch_tpu.core.alphabet import DNA
from witch_tpu.backbone import _kmer_profiles
from witch_tpu.backbone_magus import (align_backbone_magus, kmer_kmeans,
                                      merge_alignments, _match_profile)
from witch_tpu.hmm.priors import get_background


def test_kmeans_deterministic():
    rng = np.random.default_rng(0)
    codes = [rng.integers(0, 4, 80) for _ in range(30)]
    prof = _kmer_profiles(codes, 4)
    a = kmer_kmeans(prof, 4, seed=3)
    b = kmer_kmeans(prof, 4, seed=3)
    assert [list(x) for x in a] == [list(x) for x in b]
    assert sorted(i for c in a for i in c) == list(range(30))


def test_merge_preserves_residues_and_pairs_identical_columns():
    # two alignments of near-identical sequences must merge near-flush
    rows_a = [("a%d" % i, "ACGTACGTAC") for i in range(4)]
    rows_b = [("b%d" % i, "ACGTACGTAC") for i in range(4)]
    A = PackedAlignment.from_records(rows_a, alphabet=DNA)
    B = PackedAlignment.from_records(rows_b, alphabet=DNA)
    ca, ea = _match_profile(A, "dna")
    cb, eb = _match_profile(B, "dna")
    merged = merge_alignments(A, ca, ea, B, cb, eb, get_background("dna"))
    assert merged.n_seqs == 8
    assert merged.n_cols == 10          # identical columns pair up
    for nm, s in rows_a + rows_b:
        row = merged.codes[merged.names.index(nm)]
        got = "".join("ACGT"[c] for c in row if c < 4)
        assert got == s


def test_magus_end_to_end_residue_preservation():
    rng = np.random.default_rng(5)
    letters = np.array(list("ACGT"))
    base = letters[rng.integers(0, 4, 90)]
    names, seqs = [], []
    for i in range(24):
        s = base.copy()
        mut = rng.random(90) < 0.1
        s[mut] = letters[rng.integers(0, 4, mut.sum())]
        names.append("t%d" % i)
        seqs.append("".join(s))
    aln = align_backbone_magus(names, seqs, "dna", cluster_size=8,
                               use_device=False)
    assert aln.names == names
    for nm, s in zip(names, seqs):
        row = aln.codes[aln.names.index(nm)]
        got = "".join("ACGT"[c] for c in row if c < 4)
        assert got == s
    # a sane alignment of 10%-mutated copies stays compact
    assert aln.n_cols < 3 * 90
