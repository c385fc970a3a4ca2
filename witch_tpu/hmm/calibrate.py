"""E-value statistics calibration (STATS lines / reporting threshold).

hmmsearch drops a (query, HMM) pair from its report when the forward
P-value exceeds 1.0, i.e. when the pre-null2 bit score falls below the
model's forward tau (established empirically against the oracle outputs:
all 141x500 reported scores satisfy score >= tau). tau itself comes from
hmmbuild's stochastic calibration (p7_Tau): score EfN=200 random iid
sequences of length EfL=100 drawn from an exactly-emulated
esl_randomness_CreateFast(42) stream (see easel.py), ML-fit a complete
Gumbel (esl_gumbel_FitComplete), then
tau = gumbel_invcdf(1-tailp; fit) + ln(tailp)/lambda with tailp=0.04 and
lambda = ln 2 + 1.44 / (M * mean-match-relative-entropy)   (verified to
5e-6 against the binary's STATS lines).

With the exact stream + ML fit, tau matches the binary's STATS value to
<= 0.017 bits across all 141 example-decomposition models (the residual
is our Forward kernel's ~0.01-bit f32 noise propagated through the fit).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..core.alphabet import ALPHABETS
from .build import CoreHMM, mean_match_relative_entropy

CAL_L = 100       # EfL
CAL_N = 200       # EfN
CAL_TAILP = 0.04  # Eft
CAL_SEED = 42
# p7_Calibrate consumes MSVMu (EmN=200 x EmL=200) + ViterbiMu
# (EvN=200 x EvL=200) draws from the same reseeded stream before p7_Tau
CAL_SKIP = 200 * 200 * 2


def forward_lambda(core: CoreHMM) -> float:
    """p7_Lambda: lambda = ln2 + 1.44/(M*H), H = mean match relative
    entropy vs the REAL scoring background (p7_bg; uniform for nucleic,
    p7_AminoFrequencies for amino — HMMER uses the same bg here that it
    uses for emission odds)."""
    from .priors import get_background
    bg = get_background(core.molecule)
    H = mean_match_relative_entropy(core.match_emissions, bg)
    return float(np.log(2.0) + 1.44 / (core.M * H))


def random_calibration_seqs(K: int, seed: int = CAL_SEED,
                            n: int = CAL_N, L: int = CAL_L,
                            bg=None) -> np.ndarray:
    """The EXACT p7_Tau random sequences: emulated
    esl_randomness_CreateFast stream, FChoose draws from the scoring
    background (uniform when bg is None), offset past the MSV/Viterbi
    calibration consumption."""
    from .easel import iid_seqs
    if bg is None:
        bg = np.full(K, 1.0 / K, np.float32)
    return iid_seqs(np.asarray(bg, np.float32), n, L, seed=seed,
                    skip=CAL_SKIP)


def tau_from_scores(sim_bits: np.ndarray, lam: float,
                    tailp: float = CAL_TAILP) -> float:
    """sim_bits: [N] null1-corrected forward bits of the exact p7_Tau
    random seqs; ML Gumbel fit + tail-origin shift (p7_Tau)."""
    from .easel import forward_tau
    return forward_tau(np.asarray(sim_bits, np.float64), lam, tailp)
