"""Fused device posterior+OA kernel (ops/pallas_oa.py) vs the f64
host reference (hmm/align_ref.py), interpret mode on CPU.

The kernel replaces the per-pair hmmalign stage (reference
witch_msa/gcmm/aligner.py:88-142); the host chain is validated
bit-identical against the hmmalign binary (test_hmmalign_parity), so
matching it transitively matches the binary.
"""

import numpy as np
import pytest

from witch_tpu.core.alphabet import ALPHABETS
from witch_tpu.hmm.align_ref import aligned_columns
from witch_tpu.hmm.bank import build_banks
from witch_tpu.hmm.build import build_hmm
from witch_tpu.hmm.profile import configure
from witch_tpu.ops.pallas_oa import (bank_strictly_positive,
                                     oa_columns_device)


def _random_cores(rng, alpha, n_models=3):
    cores = []
    for h in range(n_models):
        n, L = 8, 40 + h * 17
        codes = rng.integers(0, 4, (n, L))
        gaps = rng.random((n, L)) < 0.15
        codes = np.where(gaps, alpha.gap_code, codes)
        cores.append(build_hmm(codes.astype(np.uint8), alpha, "dna",
                               name="t%d" % h))
    return cores


@pytest.mark.parametrize("seed", [7, 23])
def test_oa_device_matches_host(seed):
    rng = np.random.default_rng(seed)
    alpha = ALPHABETS["dna"]
    cores = _random_cores(rng, alpha)
    banks = build_banks(cores, indices=[0, 1, 2], multihit=False,
                        uniform=True)
    assert bank_strictly_positive(banks[0])
    bank_row = {int(idx): (bi, r)
                for bi, b in enumerate(banks)
                for r, idx in enumerate(b.hmm_indices)}
    pairs = []
    for _ in range(8):
        idx = int(rng.integers(0, 3))
        Lq = int(rng.integers(20, 90))
        pairs.append((idx, rng.integers(0, 4, Lq).astype(np.int32)))
    cols, margins, oks = oa_columns_device(
        banks, bank_row, pairs, QT=4, B=8, interpret=True)
    n_match = 0
    for p, (idx, c) in enumerate(pairs):
        prof = configure(cores[idx], multihit=False)
        ref = aligned_columns(prof, c)
        assert oks[p], "trace failed for pair %d" % p
        if np.array_equal(np.asarray(ref), np.asarray(cols[p])):
            n_match += 1
        else:
            # a mismatch is only acceptable below the production guard
            assert margins[p] < 2e-3, (
                "pair %d mismatched ABOVE the margin guard "
                "(margin %.3g)" % (p, margins[p]))
    assert n_match >= len(pairs) - 1


def test_oa_device_multihit_banks_identical_tables():
    """The aligner reuses the (multihit-configured) scoring banks: the
    bank tables must not depend on the multihit flag."""
    rng = np.random.default_rng(5)
    alpha = ALPHABETS["dna"]
    cores = _random_cores(rng, alpha, n_models=2)
    b_uni = build_banks(cores, indices=[0, 1], multihit=False,
                        uniform=True)[0]
    b_multi = build_banks(cores, indices=[0, 1], multihit=True,
                          uniform=True)[0]
    for a in ("em_odds", "t_mm", "t_mi", "t_md", "t_im", "t_ii",
              "t_dm", "t_dd", "bm"):
        assert np.array_equal(getattr(b_uni, a), getattr(b_multi, a)), a
