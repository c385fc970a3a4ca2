"""Dirichlet priors for profile-HMM parameter estimation.

Constants were established empirically by probing the reference's bundled
HMMER 3.1b2 hmmbuild with controlled alignments (see docs/CALIBRATION.md);
estimation matches the binary's text output to < 5e-6 in ln-probability.
"""

from __future__ import annotations

import dataclasses
import numpy as np
from scipy.special import gammaln


@dataclasses.dataclass(frozen=True)
class MixtureDirichlet:
    q: np.ndarray       # [K] mixture coefficients
    alpha: np.ndarray   # [K, D] component pseudocounts

    def posterior_mean(self, counts: np.ndarray) -> np.ndarray:
        """Mixture posterior-predictive mean estimate.

        counts: [..., D] observed (weighted) counts.
        Returns [..., D] probability estimates.
        """
        c = np.asarray(counts, dtype=np.float64)
        a = self.alpha                               # [K, D]
        asum = a.sum(axis=1)                         # [K]
        n = c.sum(axis=-1)                           # [...]
        # log marginal likelihood of each component
        lw = (np.log(self.q)
              + gammaln(asum)
              - gammaln(n[..., None] + asum)
              + (gammaln(c[..., None, :] + a)
                 - gammaln(a)).sum(axis=-1))         # [..., K]
        lw = lw - lw.max(axis=-1, keepdims=True)
        w = np.exp(lw)
        w /= w.sum(axis=-1, keepdims=True)
        comp_mean = (c[..., None, :] + a) / (n[..., None, None] + asum[:, None])
        return (w[..., None] * comp_mean).sum(axis=-2)


@dataclasses.dataclass(frozen=True)
class TransitionPrior:
    tm: np.ndarray  # alphas for (MM, MI, MD)
    ti: np.ndarray  # alphas for (IM, II)
    td: np.ndarray  # alphas for (DM, DD)


# Nucleic (DNA/RNA) priors — HMMER 3.1b2 equivalents, empirically verified.
NUCLEIC_TRANSITION_PRIOR = TransitionPrior(
    tm=np.array([2.0, 0.1, 0.1]),
    ti=np.array([0.06, 0.2]),
    td=np.array([0.1, 0.2]),
)

NUCLEIC_EMISSION_PRIOR = MixtureDirichlet(
    q=np.array([0.24, 0.26, 0.08, 0.42]),
    alpha=np.array([
        [0.16, 0.45, 0.12, 0.39],
        [0.09, 0.03, 0.09, 0.04],
        [1.29, 0.40, 6.58, 0.51],
        [1.74, 1.49, 1.57, 1.95],
    ]),
)

# Amino acid: transition prior (fit from AA probe builds; see tests).
AMINO_TRANSITION_PRIOR = TransitionPrior(
    tm=np.array([0.7939, 0.0278, 0.0135]),
    ti=np.array([0.1551, 0.1331]),
    td=np.array([0.9002, 0.5630]),
)


def uniform_background(K: int) -> np.ndarray:
    return np.full(K, 1.0 / K)


def get_emission_prior(molecule: str) -> MixtureDirichlet:
    if molecule in ("dna", "rna"):
        return NUCLEIC_EMISSION_PRIOR
    raise NotImplementedError(
        "amino emission prior (Blocks9 mixture) not yet calibrated")


def get_transition_prior(molecule: str) -> TransitionPrior:
    if molecule in ("dna", "rna"):
        return NUCLEIC_TRANSITION_PRIOR
    return AMINO_TRANSITION_PRIOR
