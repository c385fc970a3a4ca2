"""E-value statistics calibration (STATS lines / reporting threshold).

hmmsearch drops a (query, HMM) pair from its report when the forward
P-value exceeds 1.0, i.e. when the pre-null2 bit score falls below the
model's forward tau (established empirically against the oracle outputs:
all 141x500 reported scores satisfy score >= tau). tau itself comes from
hmmbuild's stochastic calibration: score N=200 random iid sequences of
length L=100, take the (1-tailp) quantile (tailp=0.04) as the tail base mu,
then tau = mu + ln(tailp)/lambda, with
lambda = ln 2 + 1.44 / (M * mean-match-relative-entropy)   (verified to
5e-6 against the binary's STATS lines).

We reproduce the procedure with our own RNG; tau therefore matches the
binary's statistically (+-0.3 bits) rather than bit-exactly. Pairs whose
score lands within that band of tau may differ in reportedness vs the
reference — quantified in the end-to-end tests.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..core.alphabet import ALPHABETS
from .build import CoreHMM, mean_match_relative_entropy

CAL_L = 100
CAL_N = 1000   # larger than HMMER's 200: minimizes expected |tau - reference tau|
CAL_TAILP = 0.04
CAL_SEED = 42


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
    rng = np.random.default_rng(seed)
    if bg is None:
        return rng.integers(0, K, size=(n, L)).astype(np.int32)
    return rng.choice(K, size=(n, L), p=np.asarray(bg)).astype(np.int32)


def tau_from_scores(sim_bits: np.ndarray, lam: float,
                    tailp: float = CAL_TAILP) -> float:
    """sim_bits: [N] null1-corrected forward bits of the random seqs."""
    N = len(sim_bits)
    srt = np.sort(sim_bits)
    ntail = int(N * tailp)
    mu = srt[N - ntail]
    return float(mu + np.log(tailp) / lam)
