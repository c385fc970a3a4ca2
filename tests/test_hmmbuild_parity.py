"""hmmbuild numerical-parity tests vs the bundled HMMER 3.1b2 binary.

The reference pipeline shells out to hmmbuild (witch_msa/gcmm/algorithm.py:
461-470); our build kernel must reproduce its model parameters to the .hmm
text precision (|d ln p| < ~5e-6) so downstream scores/alignments agree.
"""

import subprocess

import numpy as np
import pytest

from witch_tpu.core.alignment import PackedAlignment
from witch_tpu.hmm.build import build_hmm
from witch_tpu.io.hmmer_text import read_hmm


def _reference_build(hmmbuild_bin, fasta, out):
    subprocess.run(
        [hmmbuild_bin, "--cpu", "1", "--dna", "--ere", "0.59",
         "--symfrac", "0.0", "--informat", "afa", "-o", "/dev/null",
         str(out), str(fasta)],
        check=True, capture_output=True)


def _assert_parity(fasta, hmmbuild_bin, tmp_path):
    out = tmp_path / "ref.hmm"
    _reference_build(hmmbuild_bin, fasta, out)
    ref = read_hmm(str(out))
    aln = PackedAlignment.from_fasta(str(fasta), molecule="dna")
    mine = build_hmm(aln.codes, aln.alphabet, "dna")
    assert abs(ref.effn - mine.effn) < 5e-7 * max(1.0, ref.effn)
    np.testing.assert_allclose(mine.match_emissions[1:],
                               ref.match_emissions[1:], atol=1e-5)
    np.testing.assert_allclose(mine.trans, ref.trans, atol=1e-5)


def _write(path, rows):
    with open(path, "w") as f:
        for i, r in enumerate(rows):
            f.write(">s%d\n%s\n" % (i, r))


def test_tiny_with_deletes(hmmbuild_bin, tmp_path):
    fasta = tmp_path / "tiny.fasta"
    _write(fasta, ["ACGTACGT", "ACG--CGT", "AC-TACGT", "ACGTACGT"])
    _assert_parity(fasta, hmmbuild_bin, tmp_path)


def test_random_with_degenerates(hmmbuild_bin, tmp_path):
    rng = np.random.default_rng(0)
    letters = np.array(list("ACGT"))
    rows = []
    L = 120
    for _ in range(30):
        s = letters[rng.integers(0, 4, L)]
        gap = rng.random(L) < 0.2
        s = np.where(gap, "-", s)
        deg = rng.random(L) < 0.02
        s = np.where(deg & ~gap, rng.choice(list("NRYWS"), L), s)
        rows.append("".join(s))
    keep = [j for j in range(L) if any(r[j] != "-" for r in rows)]
    rows = ["".join(r[j] for j in keep) for r in rows]
    fasta = tmp_path / "rand.fasta"
    _write(fasta, rows)
    _assert_parity(fasta, hmmbuild_bin, tmp_path)


def test_fragments(hmmbuild_bin, tmp_path):
    rng = np.random.default_rng(1)
    letters = np.array(list("ACGT"))
    rows = []
    L = 60
    for i in range(8):
        s = letters[rng.integers(0, 4, L)]
        if i % 2 == 0:
            k = rng.integers(0, L - 12)
            s[:k] = "-"
            s[k + 12:] = "-"
        rows.append("".join(s))
    fasta = tmp_path / "frag.fasta"
    _write(fasta, rows)
    _assert_parity(fasta, hmmbuild_bin, tmp_path)


def test_entropy_weighting_binds(hmmbuild_bin, tmp_path):
    rng = np.random.default_rng(7)
    letters = np.array(list("ACGT"))
    base = letters[rng.integers(0, 4, 200)]
    rows = []
    for _ in range(150):
        s = base.copy()
        mut = rng.random(200) < 0.08
        s[mut] = letters[rng.integers(0, 4, mut.sum())]
        gap = rng.random(200) < 0.05
        s = np.where(gap, "-", s)
        rows.append("".join(s))
    fasta = tmp_path / "cons.fasta"
    _write(fasta, rows)
    out = tmp_path / "ref.hmm"
    _reference_build(hmmbuild_bin, fasta, out)
    ref = read_hmm(str(out))
    aln = PackedAlignment.from_fasta(str(fasta), molecule="dna")
    mine = build_hmm(aln.codes, aln.alphabet, "dna")
    assert ref.effn < aln.n_seqs  # the interesting case
    assert abs(ref.effn - mine.effn) < 1e-5
    np.testing.assert_allclose(mine.match_emissions[1:],
                               ref.match_emissions[1:], atol=1e-5)


def test_real_backbone_subset(hmmbuild_bin, example_data, tmp_path):
    bb = PackedAlignment.from_fasta(
        str(example_data / "backbone.aln.fasta.gz"), molecule="dna")
    sub = bb.sub_alignment(bb.names[:40])
    sub2, _ = sub.delete_all_gap_columns()
    fasta = tmp_path / "sub.fasta"
    sub2.write(str(fasta))
    _assert_parity(fasta, hmmbuild_bin, tmp_path)


def _assert_parity_mol(fasta, hmmbuild_bin, tmp_path, mol, flag, atol):
    out = tmp_path / "ref_mol.hmm"
    subprocess.run(
        [hmmbuild_bin, "--cpu", "1", flag, "--ere", "0.59",
         "--symfrac", "0.0", "--informat", "afa", "-o", "/dev/null",
         str(out), str(fasta)], check=True, capture_output=True)
    ref = read_hmm(str(out))
    aln = PackedAlignment.from_fasta(str(fasta), molecule=mol)
    mine = build_hmm(aln.codes, aln.alphabet, mol)
    assert abs(ref.effn - mine.effn) < 1e-4
    np.testing.assert_allclose(mine.match_emissions[1:],
                               ref.match_emissions[1:], atol=atol)
    np.testing.assert_allclose(mine.trans, ref.trans, atol=1e-5)
    np.testing.assert_allclose(mine.insert_emissions, ref.insert_emissions,
                               atol=1e-5)


def test_amino_parity(hmmbuild_bin, tmp_path):
    rng = np.random.default_rng(3)
    AA = np.array(list("ACDEFGHIKLMNPQRSTVWY"))
    base = AA[rng.integers(0, 20, 120)]
    rows = []
    for _ in range(30):
        s = base.copy()
        mut = rng.random(120) < 0.25
        s[mut] = AA[rng.integers(0, 20, mut.sum())]
        gap = rng.random(120) < 0.08
        s = np.where(gap, "-", s)
        rows.append("".join(s))
    fasta = tmp_path / "aa.fasta"
    _write(fasta, rows)
    # exact Blocks9 prior (read from the bundled hmmbuild .rodata)
    _assert_parity_mol(fasta, hmmbuild_bin, tmp_path, "amino", "--amino",
                       1e-5)


def test_rna_parity(hmmbuild_bin, tmp_path):
    rng = np.random.default_rng(4)
    RNA = np.array(list("ACGU"))
    base = RNA[rng.integers(0, 4, 150)]
    rows = []
    for _ in range(25):
        s = base.copy()
        mut = rng.random(150) < 0.2
        s[mut] = RNA[rng.integers(0, 4, mut.sum())]
        gap = rng.random(150) < 0.1
        s = np.where(gap, "-", s)
        rows.append("".join(s))
    fasta = tmp_path / "rna.fasta"
    _write(fasta, rows)
    _assert_parity_mol(fasta, hmmbuild_bin, tmp_path, "rna", "--rna", 1e-5)
