"""STATS-line (E-value calibration) parity vs the hmmbuild binary.

hmmbuild prints `STATS LOCAL FORWARD tau lambda` in each .hmm
(p7_Lambda / p7_Tau); the reporting gate in our pipeline
(witch_tpu/pipeline.py compute_scores valid=pre>=tau) depends on both.
lambda is deterministic and must match to text precision; tau is a
quantile of the binary's own RNG stream, so we assert a statistical
band. Covers dna AND amino — amino exercises the non-uniform
p7_AminoFrequencies background in both formulas.
"""

import subprocess

import numpy as np

from witch_tpu.core.alignment import PackedAlignment
from witch_tpu.hmm.build import build_hmm
from witch_tpu.hmm.calibrate import (forward_lambda,
                                     random_calibration_seqs,
                                     tau_from_scores)
from witch_tpu.hmm.bank import build_banks
from witch_tpu.hmm.priors import get_background
from witch_tpu.hmm.forward import score_bank


def _stats_forward(hmm_path):
    with open(hmm_path) as f:
        for line in f:
            if line.startswith("STATS LOCAL FORWARD"):
                parts = line.split()
                return float(parts[3]), float(parts[4])
    raise AssertionError("no STATS LOCAL FORWARD line")


def _write(path, rows):
    with open(path, "w") as f:
        for i, r in enumerate(rows):
            f.write(">s%d\n%s\n" % (i, r))


def _make_alignment(mol, rng):
    if mol == "dna":
        letters = np.array(list("ACGT"))
    else:
        letters = np.array(list("ACDEFGHIKLMNPQRSTVWY"))
    K = len(letters)
    L = 90
    base = letters[rng.integers(0, K, L)]
    rows = []
    for _ in range(25):
        s = base.copy()
        mut = rng.random(L) < 0.25
        s[mut] = letters[rng.integers(0, K, mut.sum())]
        gap = rng.random(L) < 0.06
        s = np.where(gap, "-", s)
        rows.append("".join(s))
    return rows


def _check(mol, flag, hmmbuild_bin, tmp_path, seed):
    rows = _make_alignment(mol, np.random.default_rng(seed))
    fasta = tmp_path / ("cal_%s.fasta" % mol)
    _write(fasta, rows)
    out = tmp_path / ("cal_%s.hmm" % mol)
    subprocess.run(
        [hmmbuild_bin, "--cpu", "1", flag, "--ere", "0.59",
         "--symfrac", "0.0", "--informat", "afa", "-o", "/dev/null",
         str(out), str(fasta)], check=True, capture_output=True)
    tau_ref, lam_ref = _stats_forward(out)

    aln = PackedAlignment.from_fasta(str(fasta), molecule=mol)
    core = build_hmm(aln.codes, aln.alphabet, mol)
    lam = forward_lambda(core)
    # lambda: deterministic given the model; emissions match the binary
    # to ~1e-5 (amino prior fit), so lambda agrees to ~1e-4
    assert abs(lam - lam_ref) < 2e-4, (lam, lam_ref)

    # tau: exact emulation of the binary's calibration — same LCG
    # stream (easel.py), same Gumbel ML fit. Residual = our Forward's
    # ~0.01-bit f32 noise through the fit (<=0.017 over 141 example
    # models); the band allows a little slack for other alignments.
    bank = build_banks([core], uniform=True)[0]
    cal = random_calibration_seqs(core.K, bg=get_background(mol))
    lens = np.full(cal.shape[0], cal.shape[1], np.int32)
    sim = score_bank(bank, cal.astype(np.int32), lens, backend="xla")
    tau = tau_from_scores(sim[:, 0], lam)
    assert abs(tau - tau_ref) < 0.05, (tau, tau_ref)


def test_dna_stats_parity(hmmbuild_bin, tmp_path):
    _check("dna", "--dna", hmmbuild_bin, tmp_path, seed=11)


def test_amino_stats_parity(hmmbuild_bin, tmp_path):
    _check("amino", "--amino", hmmbuild_bin, tmp_path, seed=12)
