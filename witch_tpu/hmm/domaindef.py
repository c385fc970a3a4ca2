"""Domain definition + null2 biased-composition correction.

Reconstructs the part of hmmsearch's pipeline that WITCH's parsed scores
inherit beyond plain Forward: the reported full-sequence score is
  (fwd - null1 - seqbias) / ln2,
seqbias = log(1 + omega * exp(sum_i n2sc[i])), omega = 1/256, where n2sc
holds per-residue log null2 odds inside domain envelopes.

Envelopes come from posterior heuristics on the multihit decoding
(regions where P(homology) stays above rt2=0.10 with a peak above
rt1=0.25); each single-domain envelope is rescored in isolation (unihit,
zero-length flank model) and null2 is the posterior-expected emission
odds over that envelope (p7_Null2_ByExpectation semantics). Calibrated
against the oracle outputs' bias/exp/N columns.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .profile import Profile, null1_score
from .forward_ref import forward_matrices, backward_matrices

RT1 = 0.25
RT2 = 0.10
RT3 = 0.20
OMEGA = 1.0 / 256.0


def _posteriors_multihit(prof: Profile, codes: np.ndarray):
    fwd, F = forward_matrices(prof, codes)
    bck, B = backward_matrices(prof, codes)
    L = len(codes)
    loop, _ = prof.length_model(L)
    with np.errstate(invalid="ignore", over="ignore"):
        ppN = np.zeros(L + 1)
        ppJ = np.zeros(L + 1)
        ppC = np.zeros(L + 1)
        ppN[1:] = np.exp(F["N"][:-1] + loop + B["N"][1:] - fwd)
        ppJ[1:] = np.exp(F["J"][:-1] + loop + B["J"][1:] - fwd)
        ppC[1:] = np.exp(F["C"][:-1] + loop + B["C"][1:] - fwd)
        ppB = np.exp(F["B"] + B["B"] - fwd)       # B state at row i
        ppE = np.exp(F["E"] + B["E"] - fwd)       # E state at row i
    mocc = 1.0 - np.nan_to_num(ppN + ppJ + ppC)
    mocc[0] = 0.0
    return fwd, np.nan_to_num(ppB), np.nan_to_num(ppE), mocc


def find_regions(mocc: np.ndarray, ppB: np.ndarray, ppE: np.ndarray
                 ) -> List[Tuple[int, int]]:
    """Posterior-heuristic region detection (p7_domaindef semantics).

    btot[i]/etot[i] are cumulative B/E posterior; a region opens at the
    first i where mocc[i] - (new B mass at i) >= rt2, triggers when
    mocc >= rt1, closes before the first i where mocc[i] - (new E mass)
    < rt2.
    """
    L = len(mocc) - 1
    # B mass "new at i": B occurred at row i-1 (B precedes the M at row i)
    dB = np.zeros(L + 1)
    dB[1:] = ppB[:-1]
    dE = np.zeros(L + 1)
    dE[1:] = ppE[1:]
    regions = []
    i2 = -1
    triggered = False
    for i in range(1, L + 1):
        if not triggered:
            # region start = LAST position where the in-domain mass net of
            # newly-started B mass is still below rt2 (the binary's env
            # starts one position before the first high-mocc position;
            # verified on microcosm + example data)
            if mocc[i] - dB[i] < RT2:
                i2 = i
            elif i2 == -1:
                i2 = i
            if mocc[i] >= RT1:
                triggered = True
        else:
            if mocc[i] - dE[i] < RT2:
                regions.append((max(i2, 1), i))
                i2 = -1
                triggered = False
    if triggered:
        regions.append((max(i2, 1), L))
    return regions


def _null2_for_envelope(prof: Profile, codes: np.ndarray, i: int, j: int
                        ) -> np.ndarray:
    """Per-residue log null2 odds over envelope [i..j] (1-based),
    from an isolated unihit zero-flank rescoring."""
    sub = codes[i - 1:j]
    Ld = len(sub)
    iso = _IsolatedProfile(prof)
    fwd, F = forward_matrices(iso, sub)
    bck, B = backward_matrices(iso, sub)
    with np.errstate(invalid="ignore", over="ignore"):
        ppM = np.nan_to_num(np.exp(F["M"] + B["M"] - fwd))
        ppI = np.nan_to_num(np.exp(F["I"] + B["I"] - fwd))
    # expected state usage over the envelope
    useM = ppM[1:].sum(axis=0)          # [M+1]
    useI = ppI[1:].sum(axis=0)
    total = useM.sum() + useI.sum()
    xocc = max(Ld - total, 0.0)
    # null2 odds per canonical residue
    em_odds = np.exp(prof.msc[:, :prof.msc.shape[1]])
    K = em_odds.shape[1]
    # canonical columns only (the rest are degenerate codes)
    # prof.msc columns: [canonical K, gap, degenerates...]
    # use the profile's own degenerate scores for degenerate residues
    null2 = np.zeros(prof.msc.shape[1])
    with np.errstate(over="ignore", invalid="ignore"):
        m_odds = np.exp(prof.msc)       # [M+1, codes]
    m_odds = np.nan_to_num(m_odds, posinf=0.0)
    null2 = (useM[1:, None] * m_odds[1:, :]).sum(axis=0)
    null2 += useI.sum() * 1.0
    null2 += xocc * 1.0
    null2 /= Ld
    with np.errstate(divide="ignore"):
        n2sc = np.log(null2)
    return n2sc


class _IsolatedProfile:
    """View of a Profile reconfigured for unihit, zero-length flanks."""

    def __init__(self, prof: Profile):
        self._p = prof
        self.M = prof.M
        self.msc = prof.msc
        self.isc = prof.isc
        self.t_mm = prof.t_mm
        self.t_mi = prof.t_mi
        self.t_md = prof.t_md
        self.t_im = prof.t_im
        self.t_ii = prof.t_ii
        self.t_dm = prof.t_dm
        self.t_dd = prof.t_dd
        self.bm = prof.bm
        self.multihit = False

    def length_model(self, L: int):
        # L=0 length model: pmove = 1, ploop = 0
        return -np.inf, 0.0

    @property
    def xsc_e_loop(self):
        return -np.inf

    @property
    def xsc_e_move(self):
        return 0.0


def seq_bias_nats(prof: Profile, codes: np.ndarray) -> Tuple[float, int,
                                                             float]:
    """Returns (seqbias nats, n_envelopes, expected_ndom) for a query vs a
    multihit search profile."""
    fwd, ppB, ppE, mocc = _posteriors_multihit(prof, codes)
    regions = find_regions(mocc, ppB, ppE)
    n2sum = 0.0
    for (i, j) in regions:
        n2sc = _null2_for_envelope(prof, codes, i, j)
        n2sum += n2sc[codes[i - 1:j]].sum()
    seqbias = np.logaddexp(0.0, np.log(OMEGA) + n2sum)
    exp_ndom = float(ppE[1:].sum())
    return float(seqbias), len(regions), exp_ndom


def _envelope_scores(prof: Profile, codes: np.ndarray, i: int, j: int
                     ) -> Tuple[float, float]:
    """(envsc nats, domcorrection nats) for envelope [i..j] (1-based):
    isolated unihit / L=0 Forward on the envelope subsequence
    (p7_domaindef.c rescore_isolated_domain) plus its null2 sum."""
    sub = codes[i - 1:j]
    iso = _IsolatedProfile(prof)
    envsc, _ = forward_matrices(iso, sub)
    n2sc = _null2_for_envelope(prof, codes, i, j)
    return float(envsc), float(n2sc[sub].sum())


def reconstruction_scores(prof: Profile, codes: np.ndarray
                          ) -> Tuple[float, float, int, int]:
    """hmmsearch's per-domain "reconstruction" score (p7_pipeline.c
    p7_Pipeline, sum_score block).

    Each region from the posterior heuristics is treated as one envelope
    (stochastic-traceback clustering of multi-domain regions is not
    reproduced). Returns (pre2_bits, sum_bits, Ld, ndom):
      pre2 = (sum envsc + (L-Ld)ln(L/(L+3)) - null1) / ln2
      sum  = pre2 - logsumexp(0, ln omega + sum domcorrection)/ln2
    The pipeline overrides (pre_score, seq_score) with (pre2, sum) when
    Ld > 0 and sum > seq_score.
    """
    fwd, ppB, ppE, mocc = _posteriors_multihit(prof, codes)
    regions = find_regions(mocc, ppB, ppE)
    L = len(codes)
    sum_nats = 0.0
    bias_nats = 0.0
    Ld = 0
    ndom = 0
    for (i, j) in regions:
        envsc, domcorr = _envelope_scores(prof, codes, i, j)
        if envsc - domcorr > 0.0:
            sum_nats += envsc
            Ld += j - i + 1
            bias_nats += domcorr
            ndom += 1
    sum_nats += (L - Ld) * np.log(L / (L + 3.0))
    seqbias = np.logaddexp(0.0, np.log(OMEGA) + bias_nats)
    null1 = null1_score(L)
    ln2 = np.log(2.0)
    pre2 = (sum_nats - null1) / ln2
    sumsc = (sum_nats - null1 - seqbias) / ln2
    return float(pre2), float(sumsc), Ld, ndom
