"""Bit-exact emulation of easel's calibration randomness + Gumbel ML fit.

hmmbuild's E-value calibration (p7_Calibrate, called per model with a
reseeded RNG) draws random sequences from `esl_randomness_CreateFast(42)`
and fits tail statistics; witch_msa inherits the resulting STATS tau via
the hmmsearch reporting gate (reference contract:
witch_msa/gcmm/algorithm.py:524-537 runs `hmmsearch --max`, whose
P-value<=1 cut is score >= tau).  To reproduce the binary's tau exactly
we emulate, verified instruction-by-instruction against the bundled
HMMER 3.1b2 hmmbuild ELF:

* esl_randomness_CreateFast / Init: LCG state
  ``x0 = jenkins_mix3(seed, 87654321, 12345678)`` (Bob Jenkins 96-bit
  mix; the binary inlines it -- the +0xfa0a1f01 / ^0x5e3 constants).
* esl_random (fast type): ``x = (69069 x + 1) mod 2^32``, returns
  ``x * 2^-32`` as a double.
* esl_rnd_FChoose(float p[], K): ONE esl_random draw; cumulative sum and
  total norm accumulated in double from the float p; returns the first i
  with ``cum_i / norm > roll`` (strict).
* p7_Calibrate order: p7_Lambda -> p7_MSVMu (EmN=200 seqs x EmL=200) ->
  p7_ViterbiMu (EvN=200 x EvL=200) -> p7_Tau (EfN=200 x EfL=100,
  tailp=0.04), all on the same stream, reseeded at entry.  Hence the
  Tau sequences start exactly 80,000 draws in.
* p7_Tau: xv[i] = (forward_bits of each random seq); then
  esl_gumbel_FitComplete (full ML fit of mu AND lambda, Lawless 4.1.5/
  4.1.6 Newton iteration) and
  ``tau = gumbel_invcdf(1 - tailp; mu_fit, lambda_fit)
          + log(tailp) / lambda_model``.

For nucleic models the background is exactly 0.25 per residue in float,
so FChoose never hits rounding edges and the emitted sequences are
bit-reproducible; amino backgrounds are reproduced with the same
double-accumulation order as the binary.
"""

from __future__ import annotations

import numpy as np

_M32 = 0xFFFFFFFF


def jenkins_mix3(a: int, b: int, c: int) -> int:
    """Bob Jenkins' 96->32 bit mix, as inlined in esl_randomness_Init."""
    a &= _M32
    b &= _M32
    c &= _M32
    a = (a - b - c) & _M32
    a ^= c >> 13
    b = (b - c - a) & _M32
    b ^= (a << 8) & _M32
    c = (c - a - b) & _M32
    c ^= b >> 13
    a = (a - b - c) & _M32
    a ^= c >> 12
    b = (b - c - a) & _M32
    b ^= (a << 16) & _M32
    c = (c - a - b) & _M32
    c ^= b >> 5
    a = (a - b - c) & _M32
    a ^= c >> 3
    b = (b - c - a) & _M32
    b ^= (a << 10) & _M32
    c = (c - a - b) & _M32
    c ^= b >> 15
    return c


def fast_rng_stream(seed: int, n: int, skip: int = 0) -> np.ndarray:
    """n doubles from esl_random on a CreateFast(seed) stream, after
    discarding `skip` draws.  Vectorized: the LCG x->69069x+1 is iterated
    per-step over a numpy u64 scalar loop (cheap at calibration sizes)."""
    x = np.uint64(jenkins_mix3(seed, 87654321, 12345678))
    a = np.uint64(69069)
    one = np.uint64(1)
    m = np.uint64(_M32)
    out = np.empty(n, np.float64)
    # burn the skipped prefix with the same recurrence
    for _ in range(skip):
        x = (a * x + one) & m
    for i in range(n):
        x = (a * x + one) & m
        out[i] = float(x)
    return out * 2.0 ** -32


def fchoose_cumnorm(p_f32: np.ndarray) -> np.ndarray:
    """The normalized double cumulative the binary's FChoose compares
    against: cum_i = sum_{j<=i} (double)p[j], each divided by the norm.

    The norm itself is summed with SSE pairwise association for K >= 8
    (two 2-lane accumulators over 8-element blocks, horizontal add, then
    an in-order scalar tail) and plain in-order for K < 8."""
    p = np.asarray(p_f32, np.float32).astype(np.float64)
    K = len(p)
    if K >= 8:
        nb = K & ~7
        acc2 = np.zeros(2)
        acc1 = np.zeros(2)
        for s in range(0, nb, 8):
            acc2 += p[s:s + 2]
            acc1 += p[s + 2:s + 4]
            acc2 += p[s + 4:s + 6]
            acc1 += p[s + 6:s + 8]
        lane = acc2 + acc1
        norm = lane[0] + lane[1]
        for j in range(nb, K):
            norm += p[j]
    else:
        norm = 0.0
        for j in range(K):
            norm += p[j]
    return np.cumsum(p) / norm


def iid_seqs(bg_f32: np.ndarray, n: int, L: int, seed: int = 42,
             skip: int = 0) -> np.ndarray:
    """[n, L] int32 residues via the exact FChoose stream."""
    cum = fchoose_cumnorm(bg_f32)
    rolls = fast_rng_stream(seed, n * L, skip=skip)
    # first index with cum[i] > roll  (strict) == searchsorted right
    res = np.searchsorted(cum, rolls, side="right")
    # the binary esl_fatal()s if roll lands past the last cum (cannot
    # happen when cum[-1] == 1.0 exactly, e.g. uniform nucleic bg)
    res = np.minimum(res, len(cum) - 1)
    return res.reshape(n, L).astype(np.int32)


def gumbel_fit_complete(x: np.ndarray):
    """esl_gumbel_FitComplete: ML Gumbel (mu, lambda) via Newton on
    Lawless eq 4.1.6, initial guess pi/sqrt(6 var), tol 1e-5; mu from
    eq 4.1.5."""
    x = np.asarray(x, np.float64)
    n = len(x)
    mean = x.mean()
    variance = x.var(ddof=1)
    lam = np.pi / np.sqrt(6.0 * variance)

    def lawless416(lmb):
        ex = np.exp(-lmb * x)
        esum = ex.sum()
        xesum = (x * ex).sum()
        xxesum = (x * x * ex).sum()
        f = 1.0 / lmb - mean + xesum / esum
        df = (xesum / esum) ** 2 - xxesum / esum - 1.0 / (lmb * lmb)
        return f, df

    for _ in range(100):
        f, df = lawless416(lam)
        if abs(f) < 1e-5:
            break
        lam = lam - f / df
        if lam <= 0.0:
            lam = 0.001
    else:
        # bisection fallback (binary's rare path)
        left, right = 0.001, np.pi / np.sqrt(6.0 * variance)
        while lawless416(right)[0] > 0.0:
            right *= 2.0
            if right > 100.0:
                raise FloatingPointError("gumbel fit failed to bracket")
        for _ in range(100):
            lam = (left + right) / 2.0
            f, _ = lawless416(lam)
            if abs(f) < 1e-5:
                break
            if f > 0.0:
                left = lam
            else:
                right = lam
    esum = np.exp(-lam * x).sum()
    mu = -np.log(esum / n) / lam
    return float(mu), float(lam)


def gumbel_invcdf(p: float, mu: float, lam: float) -> float:
    return mu - np.log(-np.log(p)) / lam


def forward_tau(sim_bits: np.ndarray, model_lambda: float,
                tailp: float = 0.04) -> float:
    """p7_Tau's final step from the N simulated forward bit scores."""
    gmu, glam = gumbel_fit_complete(sim_bits)
    return float(gumbel_invcdf(1.0 - tailp, gmu, glam)
                 + np.log(tailp) / model_lambda)
